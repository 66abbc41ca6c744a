"""Gradient-based sampling quality on hardware: NUTS N_eff/s vs the
fused Goodman-Weare kernel on the real joint posterior.

Motivation (docs/PERFORMANCE.md round-2): the stretch move's binding
direction is the curved (a, b, r_p) gNFW degeneracy — tau ~ 1000-2000
steps on `a` and no tempering ladder fixes it.  Hamiltonian
trajectories follow curved ridges; if NUTS gets tau ~ O(1-10) on `a`,
it wins the worst-parameter N_eff/s race even at a much higher
per-sample cost.

Run: setsid nohup python -u scripts/tpu_nuts_neff_bench.py > /tmp/nuts.log 2>&1 &
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
from joxsz_tpu.sampling.nuts import run_nuts
from joxsz_tpu.sampling.stretch import generate_init_positions
from joxsz_tpu.postproc.summary import chain_tau_steps

C = 256          # chains
N_WARM = 500
N_STEPS = 1000

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
names = list(sess.params.thawed)
log(f"backend {jax.default_backend()}; session ready")

lp_b = jax.jit(jax.vmap(sess.log_like))
p0 = generate_init_positions(lp_b, jnp.asarray(theta0), C,
                             jax.random.PRNGKey(99), spread=0.05)
log(f"{C} finite init chains")

t1 = time.time()
res = run_nuts(sess.log_like, p0, n_steps=N_STEPS,
               key=jax.random.PRNGKey(7), n_warmup=N_WARM,
               max_depth=8, thin=1)
wall = time.time() - t1
# tau rules (negative-ACF clamp, max() reduction) shared via
# postproc.summary.chain_tau_steps; thin=1 (units: transitions)
tau = chain_tau_steps(res.chain, 1)
neff = res.chain.shape[0] * C / tau
worst = int(np.argmax(tau))
log(f"NUTS: wall {wall:.1f}s (incl. warmup {N_WARM}), accept "
    f"{res.mean_accept_prob:.3f}, mean depth {res.mean_tree_depth:.2f}, "
    f"eps {res.step_size:.2e}")
log(f"tau (transitions): mean {tau.mean():6.2f} max {tau.max():6.2f} "
    f"(worst={names[worst]}); tau[a]={tau[names.index('a')]:6.2f}")
log(f"N_eff: worst-param {neff[worst]:9.0f} -> {neff[worst]/wall:8.1f} "
    f"N_eff/s (incl warmup wall)")
for n, t, ne in zip(names, tau, neff):
    print(f"   {n:18} tau {t:8.2f}  N_eff {ne:9.0f}", flush=True)
print("DONE", flush=True)
