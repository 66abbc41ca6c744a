"""Same-claim validation of the r5 tempered-kernel port (VERDICT r4 #2):
packed-state + half_tile + roll partner lift the K*W=32768-row Mosaic
VMEM wall (K=4 x W=8192 failed compile at 163 MB in
results/tpu_temper_bigw.json).

One claim, in order:
  1. hardware bit-check: packed vs unpacked tempered kernel at the
     flagless default (K=4, W=1024) — identical PRNG stream, identical
     arithmetic, so outputs must be ARRAY-EQUAL on hardware;
  2. the r4 default-decision protocol (10% cloud, 4000-step ladder
     equilibration, 20000 measured steps, thin 25, 64-walker tau slice)
     at W=1024 (grid anchor, seed 3 = the r4 seed) and the NEW
     K=4 x W=8192 row — the one the wall blocked;
  3. a W=8192 partner A/B datum (auto->roll vs onehot) if compile
     budget allows.

Writes results/tpu_temper_half_tile.json.

Run: setsid nohup python -u scripts/tpu_temper_half_tile_ab.py \
    > /tmp/tht.log 2>&1 &
"""

import json
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
from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                        make_tempered_step_kernel)
from joxsz_tpu.sampling.tempered import default_betas
from joxsz_tpu.postproc.summary import chain_tau_steps

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

K, THIN, N_Q, N_CHUNKS = 4, 25, 2000, 10
betas = default_betas(K)
sl = jax.jit(lambda c: c[:, :64, :D])
out = {"protocol": "r4 default-decision protocol (tpu_temper_default_ab)"
                   ": 10% cloud, 4000-step ladder equilibration, 20000 "
                   "measured, thin 25, 64-walker tau slice; one claim",
       "runs": []}


def _init(W, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
        (W, D)))).astype(np.float32))


# ---- 1. packed vs unpacked hardware bit-check at the default config ----
W0 = 1024
x0 = _init(W0, 3)
xk = jnp.broadcast_to(x0[None], (K, W0, D))
lpk = jnp.stack([core(xk[k]) for k in range(K)])
acck = jnp.zeros((K, W0), jnp.float32)
bit = {}
for packed in (True, False):
    t1 = time.time()
    step = make_tempered_step_kernel(sess, betas, n_inner=100,
                                     n_walkers=W0, thin=50,
                                     packed_state=packed)
    outs = step(xk, lpk, acck, 12345)
    jax.block_until_ready(outs[0])
    bit[packed] = [np.asarray(o) for o in outs]
    log(f"bit-check packed={packed}: first call "
        f"{time.time()-t1:.1f}s (incl compile)")
exact = all(np.array_equal(a, b)
            for a, b in zip(bit[True], bit[False]))
out["packed_bit_exact_hw"] = bool(exact)
log(f"packed vs unpacked hardware bit-exact: {exact}")
if not exact:
    diffs = [float(np.abs(a.astype(np.float64)
                          - b.astype(np.float64)).max())
             for a, b in zip(bit[True], bit[False])]
    out["packed_bit_diffs"] = diffs
    log(f"  max diffs per output: {diffs}")
del bit


def measure_tempered(W, seed, partner="auto", tag=""):
    x0 = _init(W, seed)
    t1 = time.time()
    step_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q,
                                       n_walkers=W, thin=THIN,
                                       partner=partner)
    if step_t is None:
        log(f"tempered W={W}: kernel declined")
        return None
    xk = jnp.broadcast_to(x0[None], (K, W, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W), jnp.float32)
    try:
        for i in range(2):
            xk, lpk, acck = step_t(xk, lpk, acck,
                                   40 + 100 * seed + i)[:3]
        jax.block_until_ready(xk)
    except Exception as e:
        log(f"tempered W={W} partner={partner}: COMPILE/RUN FAIL: "
            f"{type(e).__name__}: {str(e)[:300]}")
        out["runs"].append({"sampler": "tempered", "K": K, "W": W,
                            "partner": partner, "fail": str(e)[:300]})
        return None
    log(f"tempered W={W} partner={partner}: equilibrated "
        f"(first-call+equil {time.time()-t1:.1f}s)")
    acck = jnp.zeros((K, W), jnp.float32)
    subs, sacc = [], np.zeros(K - 1)
    t1 = time.time()
    for i in range(N_CHUNKS):
        xk, lpk, acck, sa, ch, _ = step_t(xk, lpk, acck,
                                          900 + 100 * seed + i)
        sacc += np.asarray(sa)
        subs.append(sl(ch))
    jax.block_until_ready(xk)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau = chain_tau_steps(sub, THIN)
    tau_t = float(tau.max())
    r = {"sampler": "tempered", "K": K, "W": W, "seed": seed,
         "partner": partner, "tag": tag, "rows": K * W,
         "tau_max": round(tau_t, 1),
         "tau_mean": round(float(tau.mean()), 1),
         "steps_per_s": round(N_Q * N_CHUNKS / wall, 1),
         "rows_per_s": round(N_Q * N_CHUNKS * K * W / wall / 1e6, 2),
         "wall_s": round(wall, 2),
         "swap_rates": [round(float(s), 3)
                        for s in sacc / (N_Q * N_CHUNKS * W)],
         "neff_per_s": round(N_Q * N_CHUNKS * W / tau_t / wall, 1)}
    out["runs"].append(r)
    log(f"tempered W={W} partner={partner}: tau_max {tau_t:.0f} "
        f"{r['steps_per_s']:,} steps/s ({r['rows_per_s']}M rows/s) -> "
        f"{r['neff_per_s']:,} N_eff/s; swaps {r['swap_rates']}")
    return r


# ---- 2. grid anchor + the new row -------------------------------------
measure_tempered(1024, seed=3, tag="anchor (r4 grid seed)")
r8 = measure_tempered(8192, seed=3, tag="NEW ROW (r4 wall: Mosaic "
                                        "163MB fail)")
# ---- 3. partner A/B at the new row (auto resolves to roll at 8192) ----
if r8 is not None:
    measure_tempered(8192, seed=3, partner="onehot",
                     tag="partner A/B: per-rung one-hot gather")

p = pathlib.Path("/root/repo/results/tpu_temper_half_tile.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
