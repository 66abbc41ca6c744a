"""Multicluster cluster-grid step kernel on TPU: throughput vs the flat
widened-GEMM XLA sampler at the survey-demo scale (C=16, W=128).

Run: setsid nohup python scripts/tpu_mc_kernel_bench.py > /tmp/mck.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel
from joxsz_tpu.sampling.stretch import stretch_half_update

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)

C, W = 16, 128
sz0 = sess.model.sz_data
sz_stack = stack_sz_data([
    dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.01 * c))
    for c in range(C)
])
xr_stack = stack_xray_data([sess.model.xray_data] * C)
flat_ll = jax.jit(make_multicluster_log_like(sess.model, sz_stack, xr_stack))

x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
    (C, W, theta0.size))), jnp.float32)
lp0 = flat_ll(x0)
log(f"init lp finite: {bool(jnp.all(jnp.isfinite(lp0)))}")

n_inner = 100
step = make_multicluster_step_kernel(sess, sz_stack, xr_stack,
                                     n_inner=n_inner, n_walkers=W)
t = time.time()
x, lp, acc = step(x0, lp0, jnp.zeros((C, W)), 1)
jax.block_until_ready(x)
log(f"mc step kernel compile+run ({n_inner} steps): {time.time()-t:.1f}s; "
    f"acc {float(acc.mean())/n_inner:.3f}")
lp_re = flat_ll(x)
log(f"lp err vs flat XLA: {float(jnp.nanmax(jnp.abs(lp - lp_re))):.2e}")

t = time.time()
reps = 10
for i in range(reps):
    x, lp, acc = step(x, lp, acc, 100 + i)
jax.block_until_ready(x)
per_step = (time.time() - t) / (reps * n_inner)
log(f"mc kernel: {per_step*1e3:.4f} ms/step -> "
    f"{C*W/per_step/1e6:.2f}M evals/s")

# flat XLA sampler reference (same move, scan-resident, single device)
D = theta0.size
H = W // 2


def step_all(state, k):
    x, lp, acc = state
    u_all = jax.random.uniform(k, (2, C, 3, H), dtype=x.dtype)

    def half(x, lp, acc, u3, which):
        if which == 0:
            xm, lm, xf = x[:, :H], lp[:, :H], x[:, H:]
        else:
            xm, lm, xf = x[:, H:], lp[:, H:], x[:, :H]
        xm, lm, accept = stretch_half_update(flat_ll, u3, xm, lm, xf, 2.0, D)
        if which == 0:
            x = jnp.concatenate([xm, x[:, H:]], axis=1)
            lp = jnp.concatenate([lm, lp[:, H:]], axis=1)
        else:
            x = jnp.concatenate([x[:, :H], xm], axis=1)
            lp = jnp.concatenate([lp[:, :H], lm], axis=1)
        return x, lp, acc + 1e-9 * accept.sum()

    x, lp, acc = half(x, lp, acc, u_all[0], 0)
    x, lp, acc = half(x, lp, acc, u_all[1], 1)
    return (x, lp, acc), None


@jax.jit
def drive(x, lp, key):
    keys = jax.random.split(key, 200)
    state, _ = jax.lax.scan(step_all, (x, lp, jnp.float32(0.0)), keys)
    return state


t = time.time()
xs, lps, _ = drive(x0, lp0, jax.random.PRNGKey(0))
jax.block_until_ready(xs)
log(f"flat XLA sampler compile+200 steps: {time.time()-t:.1f}s")
t = time.time()
xs, lps, _ = drive(xs, lps, jax.random.PRNGKey(1))
jax.block_until_ready(xs)
dt = (time.time() - t) / 200
log(f"flat XLA sampler: {dt*1e3:.4f} ms/step -> {C*W/dt/1e6:.2f}M evals/s")
log("DONE")
