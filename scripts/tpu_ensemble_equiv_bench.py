"""Measure (not assert) the statistical equivalence of independent
per-chip ensembles vs one big ensemble (VERDICT r1 weak #3 /
docs/PERFORMANCE.md): from one equilibrated walker cloud, compare

  A: one W=2048 Goodman-Weare ensemble,
  B: 8 x 256 independent ensembles (the multi-chip kernel layout),
  C: 32 x 64 independent ensembles (small-per-chip regime),
  D: 128 x 16 independent ensembles (guard-violating regime, run here
     only to quantify why the guard exists)

all through the SAME fused step kernel for the same number of total
steps, and report the integrated autocorrelation time and effective
samples per likelihood eval of each.  Independent ensembles target the
same posterior either way; the question is purely mixing per walker.

Chains are recorded in-kernel and only a small walker slice is fetched
per ensemble (the tunnel moves ~20 MB/s; tau doesn't care which
walkers we look at).

Run: setsid nohup python scripts/tpu_ensemble_equiv_bench.py > /tmp/equiv.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
from joxsz_tpu.sampling.stretch import generate_init_positions
from joxsz_tpu.postproc.summary import chain_tau_steps

W_TOTAL = 2048
N_BURN = 4000
N_STEPS = 10000            # per layout (total walker-steps equal for all)
THIN = 5
CHUNK = 2000               # steps per kernel invocation (chain in HBM)
LAYOUTS = [("1 x 2048", 1), ("8 x 256", 8), ("32 x 64", 32),
           ("128 x 16", 128)]

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
p0 = generate_init_positions(core, jnp.asarray(theta0), W_TOTAL,
                             jax.random.PRNGKey(20240817), spread=0.1)
log(f"init positions generated ({W_TOTAL} walkers)")

# equilibrate once; every layout starts from the same cloud
eq = make_step_kernel(sess, n_inner=N_BURN, n_walkers=W_TOTAL)
x_eq, lp_eq, acc_eq = eq(p0, core(p0), jnp.zeros(W_TOTAL, jnp.float32), 7)
jax.block_until_ready(x_eq)
x_eq = np.asarray(x_eq)
log(f"equilibrated {N_BURN} steps; acc "
    f"{float(np.asarray(acc_eq).mean()) / N_BURN:.3f}")

results = {}
for name, n_ens in LAYOUTS:
    w = W_TOTAL // n_ens
    n_slice = min(w, max(4, 512 // n_ens))   # ~512 fetched series total
    step_c = make_step_kernel(sess, n_inner=CHUNK, n_walkers=w, thin=THIN)
    sl = jax.jit(lambda c, n=n_slice: c[:, :n, :D])
    chains = []
    t1 = time.time()
    for e in range(n_ens):
        x = jnp.asarray(x_eq[e * w:(e + 1) * w])
        lp = core(x)
        acc = jnp.zeros(w, jnp.float32)
        subs = []
        for i in range(N_STEPS // CHUNK):
            x, lp, acc, ch, chlp = step_c(x, lp, acc,
                                          1000 + 97 * e + i)
            subs.append(sl(ch))
        chains.append(subs)
    # fetch after all dispatches (overlaps device work)
    chain = np.concatenate(
        [np.concatenate([np.asarray(s) for s in subs], axis=0)
         for subs in chains], axis=1)        # (n_saved, n_ens*n_slice, D)
    wall = time.time() - t1
    # tau rules (negative-ACF clamp, max() reduction) shared via
    # postproc.summary.chain_tau_steps
    tau_steps = chain_tau_steps(chain, THIN)
    n_saved = chain.shape[0]
    neff_worst = n_saved * THIN * W_TOTAL / float(tau_steps.max())
    evals = W_TOTAL * N_STEPS
    results[name] = dict(tau_max=float(tau_steps.max()),
                         tau_mean=float(tau_steps.mean()),
                         neff_min=neff_worst,
                         neff_per_eval=neff_worst / evals,
                         wall=wall)
    log(f"{name}: tau(steps) mean {tau_steps.mean():7.1f} "
        f"max {tau_steps.max():7.1f}; N_eff(worst) {neff_worst:9.0f}; "
        f"N_eff/eval {neff_worst/evals:.5f}; wall {wall:6.1f}s")

base = results["1 x 2048"]["neff_per_eval"]
print("\nlayout        tau_mean  tau_max   N_eff(worst)  Neff/eval  vs 1x2048")
for name, _ in LAYOUTS:
    r = results[name]
    print(f"{name:12} {r['tau_mean']:8.1f} {r['tau_max']:8.1f} "
          f"{r['neff_min']:12.0f} {r['neff_per_eval']:10.5f} "
          f"{r['neff_per_eval']/base:8.2f}x")
print("DONE", flush=True)
