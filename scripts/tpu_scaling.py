"""Walker-ensemble scaling probe: evals/s vs batch size on one chip.

Run: setsid nohup python scripts/tpu_scaling.py > /tmp/tpu_scaling.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.stretch import run_ensemble
from joxsz_tpu.io.readers import read_conversion_table, read_xy

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
conv = read_conversion_table(cfg.sz.conversion_file)
flux = read_xy(cfg.sz.flux_file, 3)

theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)

for use_pallas in (False, True):
    if use_pallas:
        ll = jax.jit(sess.model.log_like_batch_fused(
            conv, flux, sess.sz_operator, use_pallas=True))
        tag = "pallas"
    else:
        ll = jax.jit(jax.vmap(sess.log_like))
        tag = "vmap"
    for W in (256, 1024, 4096, 16384):
        p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
            (W, theta0.size)))).astype(np.float32))
        n_steps = max(50, min(400, (1 << 20) // W))
        res = run_ensemble(ll, p0, n_steps, jax.random.PRNGKey(0),
                           thin=n_steps)
        t = time.time()
        res = run_ensemble(ll, res.final_state[0], n_steps,
                           jax.random.PRNGKey(1), thin=n_steps)
        dt = time.time() - t
        log(f"{tag:7s} W={W:6d}: {dt/n_steps*1e3:7.3f} ms/step "
            f"-> {W*n_steps/dt:12,.0f} evals/s "
            f"(acc {res.acceptance_fraction.mean():.3f})")

log("DONE")
