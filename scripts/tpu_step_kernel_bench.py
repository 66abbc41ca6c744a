"""Fused step-loop kernel on TPU: throughput + posterior agreement vs the
XLA sampler.

Run: setsid nohup python scripts/tpu_step_kernel_bench.py > /tmp/sk.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)

W = 512
x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
core = make_joint_core(sess, block_b=256)
ref_ll = jax.jit(jax.vmap(sess.log_like))

n_inner = 100
step = make_step_kernel(sess, n_inner=n_inner, n_walkers=W)

lp0 = core(x0)
acc0 = jnp.zeros(W)
t = time.time()
x, lp, acc = step(x0, lp0, acc0, 1)
jax.block_until_ready(x)
log(f"step kernel compile+run ({n_inner} steps): {time.time()-t:.1f}s; "
    f"acc frac {float(acc.mean())/n_inner:.3f}")

# sanity: stored lp equals recomputed ll
lp_re = core(x)
log(f"lp consistency: {float(jnp.nanmax(jnp.abs(lp - lp_re))):.2e}")

# throughput (amortised over n_inner)
t = time.time()
reps = 20
for i in range(reps):
    x, lp, acc = step(x, lp, acc, 100 + i)
jax.block_until_ready(x)
per_step = (time.time() - t) / (reps * n_inner)
log(f"kernel sampler: {per_step*1e3:.4f} ms/step -> "
    f"{W/per_step:,.0f} evals/s")

# XLA reference at the same W
res = run_ensemble(ref_ll, x0, 200, jax.random.PRNGKey(0), thin=200)
t = time.time()
res = run_ensemble(ref_ll, res.final_state[0], 200, jax.random.PRNGKey(1),
                   thin=200)
dt = (time.time() - t) / 200
log(f"xla sampler:    {dt*1e3:.4f} ms/step -> {W/dt:,.0f} evals/s")

# posterior agreement: run both for 2000 burn + 3000 sample
xk, lpk, acck = step(x0, lp0, jnp.zeros(W), 999)
for i in range(19):
    xk, lpk, acck = step(xk, lpk, acck, 1000 + i)   # 2000 burn
samples = []
for i in range(30):
    xk, lpk, acck = step(xk, lpk, acck, 2000 + i)
    samples.append(np.asarray(xk))
kflat = np.concatenate(samples)

res = run_ensemble(ref_ll, x0, 2000, jax.random.PRNGKey(2), thin=2000)
res = run_ensemble(ref_ll, res.final_state[0], 3000, jax.random.PRNGKey(3),
                   thin=100)
xflat = res.chain.reshape(-1, theta0.size)

med_k = np.median(kflat, axis=0)
med_x = np.median(xflat, axis=0)
std_k = np.std(kflat, axis=0)
std_x = np.std(xflat, axis=0)
width = 0.5 * (std_k + std_x) + 1e-12
pulls = (med_k - med_x) / width
log("median pulls (kernel vs xla): " + np.array2string(pulls, precision=2))
log("width ratios: " + np.array2string(std_k / std_x, precision=2))
constrained = std_x > 1e-6          # skip pinned/degenerate params
ratio = std_k[constrained] / std_x[constrained]
ok = (np.all(np.abs(pulls) < 0.75)
      and np.all((ratio > 0.5) & (ratio < 2.0)))
log(f"posterior agreement: {'PASS' if ok else 'FAIL'}")
log("DONE")
