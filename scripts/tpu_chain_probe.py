"""Probe the chain-recording step kernel at W=1024 with the capped
n_keep, and time the KernelSampler production path.

Run: setsid nohup python scripts/tpu_chain_probe.py > /tmp/cp.log 2>&1 &
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
from joxsz_tpu.sampling.kernel import make_kernel_sampler

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)

ks = make_kernel_sampler(sess)
assert ks is not None

for W in (1024, 512):
    x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    try:
        t = time.time()
        res = ks.run(x0, 5000, jax.random.PRNGKey(0), thin=5)
        log(f"W={W}: 5000-step thin=5 sampling run (compile+run) "
            f"{time.time()-t:.1f}s; chain {res.chain.shape}, "
            f"acc {float(np.mean(res.acceptance_fraction)):.3f}")
        # warm re-run for sustained rate
        t = time.time()
        res = ks.run(jnp.asarray(res.final_state[0]), 5000,
                     jax.random.PRNGKey(1), thin=5)
        dt = time.time() - t
        log(f"W={W}: warm 5000-step run {dt:.2f}s -> "
            f"{5000*W/dt/1e6:.1f}M evals/s sustained incl host")
        lp_re = ks.log_prob_batch(jnp.asarray(res.chain[-1]))
        log(f"W={W}: lp err {float(np.nanmax(np.abs(res.log_prob[-1] - np.asarray(lp_re)))):.1e}")
    except Exception as e:
        log(f"W={W}: FAILED: {type(e).__name__}: {str(e)[:200]}")
log("DONE")
