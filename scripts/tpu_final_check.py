"""End-of-round validation on the TPU: bench program, multicluster
steady-state, graft entry.

Run: setsid nohup python scripts/tpu_final_check.py > /tmp/final_check.log 2>&1 &
"""

import dataclasses
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

log(f"backend {jax.default_backend()}")

# 1. graft entry
import __graft_entry__ as g

fn, args = g.entry()
out = jax.jit(fn)(*args)
log(f"entry OK: {float(out[0]):.2f}")

# 2. multicluster steady state (cache-aware second call)
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models.multicluster import (
    stack_sz_data, stack_xray_data, make_multicluster_log_like,
)
from joxsz_tpu.parallel import make_mesh, run_multi_cluster

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
rng = np.random.default_rng(0)
C, W = 16, 128
sz_list = [dataclasses.replace(sess.model.sz_data,
                               flux=sess.model.sz_data.flux * (1 + 0.01 * c))
           for c in range(C)]
batched = jax.jit(make_multicluster_log_like(
    sess.model, stack_sz_data(sz_list),
    stack_xray_data([sess.model.xray_data] * C)))
mesh = make_mesh(1, axis_names=("cluster", "walker"), shape=(1, 1))
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
p0 = theta0[None, None] * (1 + 0.02 * rng.standard_normal(
    (C, W, theta0.size))).astype(np.float32)

n = 400
out = run_multi_cluster(batched, p0, n, jax.random.PRNGKey(0), mesh)
t = time.time()
out = run_multi_cluster(batched, out["positions"], n, jax.random.PRNGKey(1),
                        mesh)
dt = time.time() - t
log(f"multicluster steady: {dt:.2f}s for {n}x{C}x{W} -> "
    f"{n*C*W/dt:,.0f} evals/s")

log("DONE (run bench.py separately for the official line)")
