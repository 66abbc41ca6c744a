"""Compile-time fix A/B: fori_loop-over-scratch likelihood tiling vs the
Python-unrolled tile evaluation in the fused step kernel.

Unrolled Mosaic compile times measured before the fix (tpu_partner_bench
session): W=2048 99s, W=4096 672s, W=8192 4444s — the H/256 inlined
likelihood copies explode compile time.  The loop path should flatten
this while staying bit-identical (per-row independent likelihood).

Run: setsid nohup python scripts/tpu_ll_loop_bench.py > /tmp/llb.log 2>&1 &
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


def init(W):
    x = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    return x, core(x), jnp.zeros(W)


# ---- bit-exactness at W=2048: loop (tile 256) vs single-call (tile H) ---
W = 2048
x0, lp0, acc0 = init(W)
outs = {}
for tile in (256, 1024):          # 256 -> fori_loop path; 1024=H -> single
    step = make_step_kernel(sess, n_inner=200, n_walkers=W, ll_tile=tile)
    t = time.time()
    o = step(x0, lp0, acc0, 5)
    jax.block_until_ready(o[0])
    log(f"W=2048 tile={tile}: compile+run {time.time()-t:.1f}s")
    outs[tile] = [np.asarray(v) for v in o]
same = all(np.array_equal(a, b) for a, b in zip(outs[256], outs[1024]))
log(f"W=2048 loop==single bit-exact: {same}")

# ---- compile time + throughput at large W (loop path, fresh programs) ---
for W in (4096, 8192, 16384):
    x, lp, acc = init(W)
    step = make_step_kernel(sess, n_inner=500, n_walkers=W)
    t = time.time()
    x, lp, acc = step(x, lp, acc, 1)
    jax.block_until_ready(x)
    log(f"W={W} loop path: compile+run {time.time()-t:.1f}s "
        f"(unrolled was 672s/4444s/untried at 4096/8192/16384)")
    t = time.time()
    reps = 6
    for i in range(reps):
        x, lp, acc = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    per = (time.time() - t) / (reps * 500)
    err = float(jnp.nanmax(jnp.abs(lp - core(x))))
    log(f"W={W} loop path: {per*1e6:7.1f} us/step -> "
        f"{W/per/1e6:6.2f}M evals/s (lp err {err:.1e})")

log("done")
