"""Packed-state kernel layout: hardware validation + same-claim A/B.

packed_state=True stores lp/acc in two padding lanes of the (W, Dp)
position buffer (Mosaic lane-pads (W, 1) VMEM buffers to (W, 128), so
the four separate lp/acc buffers cost 4 x W*512 B — the VMEM wall that
made W >= 32768 fail compilation).  This script, in ONE claim:

  1. correctness on hardware: 200-step chain from the same state/seed,
     packed vs unpacked, must agree to f32 exactness (same arithmetic,
     same PRNG stream -> bit-identical outputs expected);
  2. same-claim per-step A/B at W in {4096, 16384};
  3. the previously-impossible W=32768 (and optimistically 65536):
     compile + sustained-rate measurement, packed only.

Run: setsid nohup python -u scripts/tpu_packed_state_bench.py \
       > /tmp/packed.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

rng = np.random.default_rng(0)


def init_state(W, spread=0.02):
    x = jnp.asarray((theta0[None] * (1 + spread * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    return x, core(x), jnp.zeros(W, jnp.float32)


# ---- phase 1: hardware bit-agreement ---------------------------------------
W = 512
x0, lp0, acc0 = init_state(W)
outs = {}
for packed in (False, True):
    step = make_step_kernel(sess, n_inner=100, n_walkers=W, thin=25,
                            packed_state=packed)
    x, lp, acc = x0, lp0, acc0
    chains = []
    for i in range(2):
        x, lp, acc, ch, chlp = step(x, lp, acc, 7 + i)
        chains.append(np.asarray(ch))
    outs[packed] = (np.asarray(x), np.asarray(lp), np.asarray(acc),
                    np.concatenate(chains), np.asarray(chlp))
names = ("x", "lp", "acc", "chain", "chain_lp")
ok = True
for n, a, b in zip(names, outs[False], outs[True]):
    same = np.array_equal(a, b)
    ok &= same
    log(f"agreement[{n}]: bit-exact={same}"
        + ("" if same else f"  max|d|={np.abs(a-b).max():.3g}"))
print("PHASE1", "PASS" if ok else "FAIL", flush=True)

# ---- phase 2: same-claim per-step A/B --------------------------------------


def timed_steps(W, n_inner, reps, **kw):
    x, lp, acc = init_state(W)
    step = make_step_kernel(sess, n_inner=n_inner, n_walkers=W, **kw)
    tc = time.time()
    x, lp, acc = step(x, lp, acc, 1)            # compile + warm
    jax.block_until_ready(x)
    log(f"  compile+warm W={W} {kw}: {time.time()-tc:.1f}s")
    t = time.time()
    for i in range(reps):
        x, lp, acc = step(x, lp, acc, 2 + i)
    jax.block_until_ready(x)
    return (time.time() - t) / (n_inner * reps)


print("\nW       packed(us)  unpacked(us)  evals/s(packed)  "
      "evals/s(unpacked)", flush=True)
for W in (4096, 16384):
    tp = timed_steps(W, 100, 10, packed_state=True)
    tu = timed_steps(W, 100, 10, packed_state=False)
    print(f"{W:6d} {tp*1e6:10.1f} {tu*1e6:12.1f} {W/tp:15.3g} "
          f"{W/tu:17.3g}", flush=True)

# ---- phase 3: beyond the old VMEM wall -------------------------------------
for W, kws in ((32768, [{}]),
               (65536, [{}, {"vmem_limit_mb": 120}])):
    for kw in kws:
        try:
            tp = timed_steps(W, 100, 10, packed_state=True, **kw)
            print(f"W={W} {kw}: {tp*1e6:.1f} us/step -> {W/tp:.3g} "
                  "evals/s", flush=True)
            break
        except Exception as e:
            print(f"W={W} {kw}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
print("DONE", flush=True)
