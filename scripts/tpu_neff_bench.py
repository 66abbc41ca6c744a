"""Sampling QUALITY per wall-clock: effective samples per second of the
fused step-loop kernel vs the XLA scan sampler, from the same
equilibrated state (throughput alone overstates a sampler whose chains
mix worse; N_eff/s is the figure of merit).

Run: setsid nohup python scripts/tpu_neff_bench.py <state.npz> > /tmp/neff.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble
from joxsz_tpu.postproc.summary import chain_tau_steps

state = np.load(sys.argv[1])
x0 = jnp.asarray(state["positions"], jnp.float32)
W = x0.shape[0]
log(f"backend {jax.default_backend()}; {W} equilibrated walkers")

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
ks = make_kernel_sampler(sess)
ll = jax.jit(jax.vmap(sess.log_like))

N_STEPS, THIN = 5000, 5


def report(name, chain, wall):
    # chain (n_saved, W, D); shared tau rules (negative-ACF clamp) via
    # postproc.summary.chain_tau_steps; tau here in saved-sample units
    tau = chain_tau_steps(chain, 1)
    n_saved = chain.shape[0]
    neff = n_saved * W / tau
    log(f"{name}: {wall:.2f}s wall, worst tau {tau.max():.1f} "
        f"(x{THIN} steps), worst-param N_eff {neff.min():,.0f} -> "
        f"{neff.min()/wall:,.0f} N_eff/s (median-param "
        f"{np.median(neff)/wall:,.0f})")
    return neff.min() / wall


# warm both compiled paths with the SAME schedule (a different n_steps
# compiles different programs/kernels and pollutes the timing)
res_k = ks.run(x0, N_STEPS, jax.random.PRNGKey(100), thin=THIN)
res_x = run_ensemble(ll, x0, N_STEPS, jax.random.PRNGKey(101), thin=THIN)

t = time.time()
res_k = ks.run(jnp.asarray(res_k.final_state[0]), N_STEPS,
               jax.random.PRNGKey(0), thin=THIN)
wall_k = time.time() - t
rate_k = report("kernel sampler", res_k.chain, wall_k)

t = time.time()
res_x = run_ensemble(ll, jnp.asarray(res_x.final_state[0]), N_STEPS,
                     jax.random.PRNGKey(1), thin=THIN)
wall_x = time.time() - t
rate_x = report("xla sampler   ", res_x.chain, wall_x)

log(f"N_eff/s ratio (kernel/xla): {rate_k/rate_x:.2f}x")
log("DONE")
