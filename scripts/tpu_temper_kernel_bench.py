"""Tempered step kernel on TPU: throughput, swap rates and cold-rung
posterior agreement vs the XLA tempered sampler.

Run: setsid nohup python scripts/tpu_temper_kernel_bench.py > /tmp/tk.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                        make_tempered_step_kernel)
from joxsz_tpu.sampling.tempered import run_tempered_ensemble, default_betas

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)
core = make_joint_core(sess, block_b=256)
assert core is not None, "session outside the kernel specialisation"
ll = jax.jit(jax.vmap(sess.log_like))

K, W = 4, 256
betas = default_betas(K)
x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
    (K, W, theta0.size))), jnp.float32)
lp0 = jnp.stack([core(x0[k]) for k in range(K)])

n_inner = 100
step = make_tempered_step_kernel(sess, betas, n_inner=n_inner,
                                 n_walkers=W)
assert step is not None, "session outside the kernel specialisation"
t = time.time()
x, lp, acc, sacc = step(x0, lp0, jnp.zeros((K, W)), 1)
jax.block_until_ready(x)
log(f"tempered kernel compile+run ({n_inner} steps): {time.time()-t:.1f}s"
    f"; acc/rung {np.round(np.asarray(acc).mean(axis=1)/n_inner, 3)}"
    f"; swap rates {np.round(np.asarray(sacc)/(n_inner*W), 3)}")
for k in range(K):
    err = float(jnp.nanmax(jnp.abs(lp[k] - core(jnp.asarray(x[k])))))
    assert err == 0.0, (k, err)
log("lp consistency on all rungs: exact")

t = time.time()
reps = 10
for i in range(reps):
    x, lp, acc, sacc = step(x, lp, acc, 100 + i)
jax.block_until_ready(x)
per_step = (time.time() - t) / (reps * n_inner)
log(f"tempered kernel: {per_step*1e3:.4f} ms/step -> "
    f"{K*W/per_step/1e6:.2f}M evals/s")

# XLA tempered reference at the same shape
t = time.time()
res = run_tempered_ensemble(ll, x0, betas, 200, jax.random.PRNGKey(0),
                            thin=200)
log(f"xla tempered compile+200 steps: {time.time()-t:.1f}s; "
    f"swap rates {np.round(res.swap_acceptance, 3)}")
t = time.time()
res = run_tempered_ensemble(ll, jnp.asarray(res.final_state[0]), betas,
                            200, jax.random.PRNGKey(1), thin=200)
dt = (time.time() - t) / 200
log(f"xla tempered: {dt*1e3:.4f} ms/step -> {K*W/dt/1e6:.2f}M evals/s")

# cold-rung posterior agreement: 6000 burn + 10000 sample both ways.
# NOTE: shorter schedules FAIL this check spuriously — tempered chains
# mix across the multimodal (log r_s, epsilon) subspace, and the MODE
# POPULATIONS need many swap transits to equilibrate (measured: 2000+3000
# gives ~1 sigma pulls that shrink to <0.35 at this schedule).
xk, lpk = x0, lp0
acck = jnp.zeros((K, W))
for i in range(60):
    xk, lpk, acck, _ = step(xk, lpk, acck, 500 + i)
cold = []
for i in range(100):
    xk, lpk, acck, _ = step(xk, lpk, acck, 2000 + i)
    cold.append(np.asarray(xk[0]))
kflat = np.concatenate(cold)

res = run_tempered_ensemble(ll, x0, betas, 6000, jax.random.PRNGKey(2),
                            thin=6000)
res = run_tempered_ensemble(ll, jnp.asarray(res.final_state[0]), betas,
                            10000, jax.random.PRNGKey(3), thin=100)
xflat = res.chain.reshape(-1, theta0.size)

med_k = np.median(kflat, axis=0)
med_x = np.median(xflat, axis=0)
std_k = np.std(kflat, axis=0)
std_x = np.std(xflat, axis=0)
width = 0.5 * (std_k + std_x) + 1e-12
pulls = (med_k - med_x) / width
log("cold-rung median pulls: " + np.array2string(pulls, precision=2))
constrained = std_x > 1e-6
ratio = std_k[constrained] / std_x[constrained]
log("width ratios: " + np.array2string(ratio, precision=2))
ok = (np.all(np.abs(pulls) < 0.75)
      and np.all((ratio > 0.5) & (ratio < 2.0)))
log(f"posterior agreement: {'PASS' if ok else 'FAIL'}")
log("DONE")
