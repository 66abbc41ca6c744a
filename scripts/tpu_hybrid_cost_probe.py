"""Attribute the hybrid coupled sampler's per-step cost (r4 follow-up).

tpu_hybrid_mixing_bench.py measured 16,919 us/step for
run_hybrid_coupled_ensemble at sync_every=100 — WORSE than the
pure-coupled 7,647 us/step it was built to amortize, and ~800x the
window's compute.  Candidates: (a) the timed call rebuilds the window
kernel (make_sharded_kernel_step has no driver cache, unlike
_get_coupled_driver) so the wall included build+trace+compile; (b) the
per-window coupled-step glue; (c) per-call consts re-upload.

This probe separates them on one claim:
  1. window steady-state: 5 chained calls, timed individually
  2. window REBUILD: second make_sharded_kernel_step at identical
     shapes + first call (what every run_hybrid invocation pays)
  3. coupled step + glue steady-state (the exact per-window epilogue)
  4. run_hybrid_coupled_ensemble(n_windows=10, sync_every=100) twice
     (fresh call A vs fresh call B; both rebuild, so A≈B expected)

Writes results/tpu_hybrid_cost.json.
Run: setsid nohup python -u scripts/tpu_hybrid_cost_probe.py \
    > /tmp/thybcost.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core
from joxsz_tpu.parallel import make_mesh
from joxsz_tpu.parallel.kernel_sharded import (_get_coupled_driver,
                                               make_sharded_kernel_step,
                                               run_hybrid_coupled_ensemble)

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess)
mesh1 = make_mesh(1, axis_names=("walker",))
log(f"backend {jax.default_backend()}; session ready")

W = 256
rng = np.random.default_rng(7)
x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal((W, D)))
                  ).astype(np.float32))
out = {"W": W, "sync_every": 100}

# ---- 1+2: window driver (n_inner=99, thin=9) ------------------------------
tb = time.time()
window = make_sharded_kernel_step(sess, mesh1, n_inner=99,
                                  walkers_per_device=W, thin=9)
build1_s = time.time() - tb
x, lp, acc = x0, core(x0), jnp.zeros(W, jnp.float32)
seeds = jnp.asarray([11], jnp.int32)
tb = time.time()
x, lp, acc, ch, chlp = window(x, lp, acc, seeds)
jax.block_until_ready(x)
first_call1_s = time.time() - tb
log(f"window build {build1_s:.2f}s, first call {first_call1_s:.2f}s")

walls = []
for i in range(5):
    t1 = time.time()
    x, lp, acc, ch, chlp = window(x, lp, acc,
                                  jnp.asarray([20 + i], jnp.int32))
    jax.block_until_ready(ch)
    walls.append(time.time() - t1)
out["window_steady_ms"] = [round(w * 1e3, 2) for w in walls]
log(f"window steady (ms): {out['window_steady_ms']}")

# rebuild at identical shapes — what every run_hybrid call pays
tb = time.time()
window2 = make_sharded_kernel_step(sess, mesh1, n_inner=99,
                                   walkers_per_device=W, thin=9)
build2_s = time.time() - tb
tb = time.time()
x2, lp2, acc2, ch2, _ = window2(x, lp, acc, jnp.asarray([99], jnp.int32))
jax.block_until_ready(x2)
first_call2_s = time.time() - tb
out["window_build_s"] = [round(build1_s, 2), round(build2_s, 2)]
out["window_first_call_s"] = [round(first_call1_s, 2),
                              round(first_call2_s, 2)]
log(f"window REBUILD {build2_s:.2f}s, first call {first_call2_s:.2f}s")

# ---- 3: coupled step + run_hybrid's exact glue ----------------------------
built = _get_coupled_driver(sess, W, 1, 1, 2.0, False, "walker",
                            "onehot", mesh1)
coupled_fn, half, _ = built
Dp = half.Dp
DL, DA = Dp - 2, Dp - 1
H = W // 2
kinds = sorted({type(c).__name__ for c in half._consts})
out["consts_types"] = kinds
out["consts_mb"] = round(sum(np.asarray(c).nbytes
                             for c in half._consts) / 1e6, 2)
log(f"half._consts: {len(half._consts)} arrays, types {kinds}, "
    f"{out['consts_mb']} MB")


def glue(x, lp):
    xp = jnp.zeros((W, Dp), jnp.float32).at[:, :D].set(x)
    xp = xp.at[:, DL].set(lp.astype(jnp.float32))
    sd = jnp.asarray([int(rng.integers(2**31 - 1))], jnp.int32)
    xA, xB, _ = coupled_fn(sd, xp[:H], xp[H:], *half._consts)
    xf = jnp.concatenate([xA, xB])
    return xf[:, :D], xf[:, DL]


xg, lpg = glue(x[:, :D] if x.shape[1] != D else x, lp)
jax.block_until_ready(xg)
walls = []
for i in range(10):
    t1 = time.time()
    xg, lpg = glue(xg, lpg)
    jax.block_until_ready(xg)
    walls.append(time.time() - t1)
out["coupled_glue_steady_ms"] = [round(w * 1e3, 2) for w in walls]
log(f"coupled+glue steady (ms): {out['coupled_glue_steady_ms']}")

# ---- 3b: pure-coupled wrapper, WARM A/B -----------------------------------
# the mixing bench's original 7647 us/step pure-coupled reading warmed
# with n_steps=100 but timed n_steps=500 — a DIFFERENT coupled-driver
# cache key, so the timed wall included the one-time driver build
# (r4 self-review).  Identical-call A/B gives the true steady cost.
from joxsz_tpu.parallel.kernel_sharded import run_coupled_sharded_ensemble

run_coupled_sharded_ensemble(sess, np.asarray(x0), 500, 3, mesh1, thin=10)
t1 = time.time()
run_coupled_sharded_ensemble(sess, np.asarray(x0), 500, 3, mesh1, thin=10)
pure_us = (time.time() - t1) / 500 * 1e6
out["pure_coupled_warm_us_per_step"] = round(pure_us, 1)
log(f"pure-coupled WARM steady: {pure_us:.0f} us/step")

# ---- 4: run_hybrid end-to-end, twice --------------------------------------
for tag in ("A", "B"):
    t1 = time.time()
    res = run_hybrid_coupled_ensemble(sess, np.asarray(x0), 10, 100, 3,
                                      mesh1, thin=9, allow_small=True)
    wall = time.time() - t1
    out[f"run_hybrid_{tag}_s"] = round(wall, 2)
    out[f"run_hybrid_{tag}_us_per_step"] = round(wall / 1000 * 1e6, 1)
    log(f"run_hybrid call {tag}: {wall:.2f}s "
        f"({wall/1000*1e6:.0f} us/step), chain {res.chain.shape}")

p = pathlib.Path("/root/repo/results/tpu_hybrid_cost.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
