"""Hardware SBC study: simulation-based calibration of the full joint
CL J1226 pipeline (sampling/sbc.py) on the real TPU chip.

64 replications: theta* ~ the (tightened) prior -> mock SZ+X-ray data
through the likelihood's own forward models -> 64 independent
64-walker ensembles fit simultaneously through the stacked multicluster
likelihood in ONE program -> per-parameter rank histograms + chi^2
uniformity verdict.  A calibrated pipeline (simulator == likelihood,
sampler unbiased, priors consistent) must produce uniform ranks.

The prior is tightened to a CL J1226-plausible box (a few posterior
sigma around the fit) so every replication's posterior is reachable
within the burn budget — prior width does not change what SBC
validates (the model's own prior is the measure; the identity holds
for ANY prior the draws come from).

Run: setsid nohup python -u scripts/tpu_sbc_study.py > /tmp/sbc.log 2>&1 &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.sbc import run_sbc

N_REPS = 64
N_WALKERS = 64
N_BURN = 4000
N_STEPS = 2000
THIN = 100
SEED = 20

TIGHT = {
    "log(n_0)": (-1.55, -1.25), r"\beta": (0.58, 0.72),
    "log(r_c)": (1.85, 2.2), "log(r_s)": (2.2, 3.4),
    r"\epsilon": (0.0, 2.0), "log(T_X/T_{SZ})": (-0.2, 0.3),
    "Z": (0.0, 0.6), "P_0": (0.1, 0.4), "a": (0.8, 5.0),
    "b": (2.0, 4.0), "r_p": (110.0, 350.0),
}

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
p = sess.params
for name, (lo, hi) in TIGHT.items():
    p[name].minval, p[name].maxval = lo, hi
p._refresh()
log(f"backend {jax.default_backend()}; session ready (tightened prior)")

t1 = time.time()
res = run_sbc(sess.model, N_REPS, n_walkers=N_WALKERS, n_burn=N_BURN,
              n_steps=N_STEPS, thin=THIN, seed=SEED)
wall = time.time() - t1
evals = (N_BURN + N_STEPS) * N_REPS * N_WALKERS
log(f"SBC done in {wall:.1f}s ({evals/wall/1e6:.2f}M evals/s incl. "
    f"simulation + compile)")

log(f"L = {res.n_draws} draws/replication, N = {N_REPS} replications")
log(f"mean acceptance {res.acceptance.mean():.3f}")
for n, pv in zip(res.names, res.p_values):
    log(f"  {n:>18}: uniformity p = {pv:.3f}")
name, worst = res.worst()
verdict = "PASS" if worst > 0.01 / len(res.names) else "FAIL"
log(f"worst parameter {name}: p = {worst:.4f} -> {verdict} "
    f"(Bonferroni 1% threshold)")

out = {
    "n_reps": N_REPS, "n_walkers": N_WALKERS, "n_burn": N_BURN,
    "n_steps": N_STEPS, "thin": THIN, "n_draws": res.n_draws,
    "seed": SEED, "tight_prior": {k: list(v) for k, v in TIGHT.items()},
    "wall_s": wall, "backend": jax.default_backend(),
    "mean_acceptance": float(res.acceptance.mean()),
    "p_values": dict(zip(res.names, map(float, res.p_values))),
    "counts": {n: c.tolist() for n, c in zip(res.names, res.counts)},
    "ranks": res.ranks.tolist(),
    "thetas_true": res.thetas_true.tolist(),
    "verdict": verdict,
}
path = pathlib.Path("/root/repo/results/sbc_study.json")
path.write_text(json.dumps(out, indent=1))
log(f"written {path}")
