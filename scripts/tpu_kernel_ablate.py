"""Cost attribution for the fused step-loop kernel: time W=512 step
variants with likelihood sections ablated.

Run: setsid nohup python scripts/tpu_kernel_ablate.py > /tmp/abl.log 2>&1 &
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

W = int(__import__("os").environ.get("ABL_W", "512"))
x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
lp0 = core(x0)

for ablate in ("", "no_xray", "no_sz", "priors", "no_ll"):
    try:
        step = make_step_kernel(sess, n_inner=100, n_walkers=W,
                                ablate=ablate)
        x, lp, acc = step(x0, lp0, jnp.zeros(W), 1)
        jax.block_until_ready(x)
        t = time.time()
        xx, llp, aacc = x, lp, acc
        for i in range(10):
            xx, llp, aacc = step(xx, llp, aacc, 100 + i)
        jax.block_until_ready(xx)
        per = (time.time() - t) / 1000
        log(f"{ablate or 'full':>8}: {per*1e6:7.1f} us/step")
    except Exception as e:
        log(f"{ablate or 'full':>8}: FAILED {type(e).__name__}: "
            f"{str(e)[:200]}")
log("DONE")
