"""Partner-selection A/B on hardware: one-hot (H, H) MXU gather vs
hashed-rotation pltpu.roll, across ensemble sizes.  The one-hot gather is
O(H^2 Dp) — a growing share of the step's FLOPs at large W — while the
rotation is O(H Dp) data movement.

Run: setsid nohup python scripts/tpu_partner_bench.py > /tmp/pb.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_step_kernel, make_joint_core

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)
core = make_joint_core(sess, block_b=256)


def run(W, mode, n_inner=500, reps=8):
    x = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    lp = core(x)
    acc = jnp.zeros(W)
    step = make_step_kernel(sess, n_inner=n_inner, n_walkers=W,
                            partner=mode)
    t = time.time()
    x, lp, acc = step(x, lp, acc, 1)
    jax.block_until_ready(x)
    log(f"W={W} {mode}: compile+run {time.time()-t:.1f}s")
    t = time.time()
    for i in range(reps):
        x, lp, acc = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    per = (time.time() - t) / (reps * n_inner)
    afrac = float(jnp.mean(acc)) / ((reps + 1) * n_inner)
    lp_re = core(x)
    err = float(jnp.nanmax(jnp.abs(lp - lp_re)))
    log(f"W={W} {mode}: {per*1e6:7.1f} us/step -> {W/per/1e6:6.2f}M "
        f"evals/s  (acc {afrac:.3f}, lp err {err:.1e})")
    return per


for W in (512, 2048, 4096):
    pa = run(W, "onehot")
    pb = run(W, "roll")
    log(f"W={W}: roll/onehot speedup {pa/pb:.2f}x")

# W=8192: new territory for the step kernel
for mode in ("onehot", "roll"):
    try:
        run(8192, mode, reps=4)
    except Exception as e:
        log(f"W=8192 {mode} FAILED: {type(e).__name__}: {str(e)[:200]}")

log("done")
