"""Diagnose multicluster throughput: batched-likelihood cost vs sampler.

Run: setsid nohup python scripts/tpu_mc_diag.py > /tmp/mc_diag.log 2>&1 &
"""

import dataclasses
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
from joxsz_tpu.models.multicluster import (
    stack_sz_data, stack_xray_data, make_multicluster_log_like,
)

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
rng = np.random.default_rng(0)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)

C, W = 16, 128
sz_list = [dataclasses.replace(sess.model.sz_data,
                               flux=sess.model.sz_data.flux * (1 + 0.01 * c))
           for c in range(C)]
batched = jax.jit(make_multicluster_log_like(
    sess.model, stack_sz_data(sz_list),
    stack_xray_data([sess.model.xray_data] * C)))

thetas = jnp.asarray((theta0[None, None] * (
    1 + 0.01 * rng.standard_normal((C, W, theta0.size)))).astype(np.float32))

out = batched(thetas)
jax.block_until_ready(out)
t = time.time()
for _ in range(100):
    out = batched(thetas)
jax.block_until_ready(out)
dt = (time.time() - t) / 100
log(f"multicluster ll (C={C},W={W}): {dt*1e3:.3f} ms "
    f"-> {C*W/dt:,.0f} evals/s")

single = jax.jit(jax.vmap(sess.log_like))
flat = thetas.reshape(C * W, -1)
out = single(flat)
jax.block_until_ready(out)
t = time.time()
for _ in range(100):
    out = single(flat)
jax.block_until_ready(out)
dt = (time.time() - t) / 100
log(f"single-cluster ll (B={C*W}): {dt*1e3:.3f} ms "
    f"-> {C*W/dt:,.0f} evals/s")
log("DONE")
