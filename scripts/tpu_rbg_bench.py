"""Threefry vs RBG (hardware) PRNG cost inside the sampling scan.

Run: setsid nohup python scripts/tpu_rbg_bench.py > /tmp/rbg.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
W = 4096
rng = np.random.default_rng(0)
p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
ll = jax.jit(jax.vmap(sess.log_like))

for impl in ("threefry2x32", "rbg"):
    key = jax.random.key(0, impl=impl)
    n = 200
    res = run_ensemble(ll, p0, n, key, thin=n)
    t = time.time()
    res = run_ensemble(ll, res.final_state[0], n,
                       jax.random.key(1, impl=impl), thin=n)
    dt = time.time() - t
    log(f"{impl:12s}: {dt/n*1e3:7.3f} ms/step -> {W*n/dt:12,.0f} evals/s "
        f"(acc {res.acceptance_fraction.mean():.3f})")

log("DONE")
