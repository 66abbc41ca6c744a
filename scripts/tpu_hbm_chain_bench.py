"""HBM chain buffer (per-frame DMA) vs the VMEM-output chain path, on
hardware: bit-exactness at W=512, sustained recorded-sampling throughput
at large W, and the >26MB chain sizes the VMEM path could never compile.

Run: setsid nohup python scripts/tpu_hbm_chain_bench.py > /tmp/hbm.log 2>&1 &
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
    x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    return x0, core(x0), jnp.zeros(W)


# ---- 1. bit-exactness A/B at W=512 (both paths compile) ----------------
W = 512
x0, lp0, acc0 = init(W)
outs = {}
for space in ("vmem", "hbm"):
    step = make_step_kernel(sess, n_inner=500, n_walkers=W, thin=5,
                            chain_space=space)
    t = time.time()
    o = step(x0, lp0, acc0, 42)
    jax.block_until_ready(o[0])
    log(f"W=512 {space}: compile+run 500 steps {time.time()-t:.1f}s")
    outs[space] = [np.asarray(v) for v in o]
same = all(np.array_equal(a, b)
           for a, b in zip(outs["vmem"], outs["hbm"]))
log(f"W=512 vmem==hbm bit-exact: {same}")
if not same:
    for i, (a, b) in enumerate(zip(outs["vmem"], outs["hbm"])):
        log(f"  out[{i}]: max|d|={np.max(np.abs(a-b)):.3e}")

# lp consistency on recorded frames
ch, chlp = outs["hbm"][3], outs["hbm"][4]
lp_re = np.asarray(core(jnp.asarray(ch[-1])))
log(f"W=512 hbm chain lp consistency: "
    f"{np.nanmax(np.abs(chlp[-1]-lp_re)):.2e}")

# steady-state timing, both spaces (chained calls: outputs feed inputs)
for space in ("vmem", "hbm"):
    step = make_step_kernel(sess, n_inner=500, n_walkers=W, thin=5,
                            chain_space=space)
    x, lp, acc = x0, lp0, acc0
    x, lp, acc, _, _ = step(x, lp, acc, 7)       # warm
    jax.block_until_ready(x)
    t = time.time()
    reps = 10
    for i in range(reps):
        x, lp, acc, ch, chlp = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    per = (time.time() - t) / (reps * 500)
    log(f"W=512 {space} recorded sampling: {per*1e6:.1f} us/step -> "
        f"{W/per/1e6:.2f}M evals/s")

# ---- 2. large-W recorded sampling (the lifted cap) ----------------------
for W in (2048, 4096):
    x0, lp0, acc0 = init(W)
    frame = W * 129 * 4
    # hbm: one invocation records 250 frames (1250 steps at thin=5);
    # chain buffer = 250*frame >> 26MB, impossible for the vmem path
    keep = 250
    nbytes = keep * frame / 1e6
    step = make_step_kernel(sess, n_inner=keep * 5, n_walkers=W, thin=5,
                            chain_space="hbm")
    t = time.time()
    o = step(x0, lp0, acc0, 1)
    jax.block_until_ready(o[0])
    log(f"W={W} hbm keep={keep} ({nbytes:.0f}MB chain): "
        f"compile+run {time.time()-t:.1f}s")
    lp_re = np.asarray(core(jnp.asarray(o[3][-1])))
    log(f"W={W} chain lp consistency: "
        f"{np.nanmax(np.abs(np.asarray(o[4][-1])-lp_re)):.2e}")
    x, lp, acc = o[:3]
    t = time.time()
    reps = 4
    for i in range(reps):
        x, lp, acc, ch, chlp = step(x, lp, acc, 200 + i)
    jax.block_until_ready(x)
    per = (time.time() - t) / (reps * keep * 5)
    log(f"W={W} hbm recorded sampling: {per*1e6:.1f} us/step -> "
        f"{W/per/1e6:.2f}M evals/s")

    # vmem path at the same W for contrast (small keep per call)
    keep_v = max(1, 26 * 1024 * 1024 // frame)
    step_v = make_step_kernel(sess, n_inner=keep_v * 5, n_walkers=W,
                              thin=5, chain_space="vmem")
    o = step_v(x0, lp0, acc0, 1)
    jax.block_until_ready(o[0])
    x, lp, acc = o[:3]
    t = time.time()
    reps_v = max(1, reps * keep // keep_v // 2)
    for i in range(reps_v):
        x, lp, acc, ch, chlp = step_v(x, lp, acc, 300 + i)
    jax.block_until_ready(x)
    per = (time.time() - t) / (reps_v * keep_v * 5)
    log(f"W={W} vmem (keep={keep_v}) recorded sampling: "
        f"{per*1e6:.1f} us/step -> {W/per/1e6:.2f}M evals/s")

log("done")
