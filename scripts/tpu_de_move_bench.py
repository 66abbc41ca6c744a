"""DE move vs stretch move: mixing A/B on the real CL J1226 joint
posterior (same claim, same schedule, same equilibrated start).

The stretch move's mixing is geometry-limited by the curved (a, b, r_p)
gNFW degeneracy (tau ~ 800-2000 steps; docs/PERFORMANCE.md).  DE-MC
proposals use the ensemble's own difference vectors, which concentrate
along the posterior's ridge — the classic candidate to beat stretch on
correlated targets.  This measures it instead of asserting.

Run: setsid nohup python -u scripts/tpu_de_move_bench.py \
        results/tpu/joxsz_state.npz > /tmp/de_bench.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble
from joxsz_tpu.postproc.summary import chain_tau_steps

state = np.load(sys.argv[1])
x0 = jnp.asarray(state["positions"], jnp.float32)
W = x0.shape[0]
log(f"backend {jax.default_backend()}; {W} equilibrated walkers")

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
ll = jax.jit(jax.vmap(sess.log_like))
names = list(sess.params.thawed)

# tau ~ 850-2000 steps on this posterior; the window must be >> 5 tau
# (CLAUDE.md tau rules), so 20k steps, thin 25, 64-walker slice fetch.
N_STEPS, THIN, KEEP = 20_000, 25, 64


def arm(label, seed, **kw):
    # short same-move warm pass also compiles the program
    res = run_ensemble(ll, x0, 2000, jax.random.PRNGKey(seed), thin=2000,
                       keep_walkers=KEEP, **kw)
    t = time.time()
    res = run_ensemble(ll, jnp.asarray(res.final_state[0]), N_STEPS,
                       jax.random.PRNGKey(seed + 1), thin=THIN,
                       keep_walkers=KEEP, **kw)
    wall = time.time() - t
    tau_saved = chain_tau_steps(res.chain, 1)       # per-param, saved units
    tau_steps = tau_saved * THIN
    n_saved = res.chain.shape[0]
    neff = n_saved * W / tau_saved                  # full-W effective draws
    acc = float(res.acceptance_fraction.mean())
    worst = int(np.argmax(tau_steps))
    log(f"{label:14s}: acc {acc:.3f}, wall {wall:.1f}s "
        f"({N_STEPS*W/wall/1e6:.2f}M evals/s)")
    log(f"{label:14s}: worst tau {tau_steps.max():,.0f} steps "
        f"({names[worst]}), median tau {np.median(tau_steps):,.0f}; "
        f"worst-param N_eff/s {neff.min()/wall:,.0f}, median "
        f"{np.median(neff)/wall:,.0f}")
    return tau_steps, neff.min() / wall


from joxsz_tpu.sampling.stretch import de_gamma0

D = x0.shape[1]
g0 = de_gamma0(D)
arms = [
    ("stretch", dict(move="stretch")),
    ("de g=default", dict(move="de")),
    ("de g=0.5x", dict(move="de", de_gamma=0.5 * g0)),
    ("de g=0.25x", dict(move="de", de_gamma=0.25 * g0)),
    ("de g=1.5x", dict(move="de", de_gamma=1.5 * g0)),
    ("snooker", dict(move="snooker")),
]
results = {}
for i, (label, kw) in enumerate(arms):
    results[label] = arm(label, 10 * (i + 1), **kw)

base_tau, base_rate = results["stretch"]
log("per-parameter tau ratio vs stretch (>1 means the arm mixes faster):")
for label, (tau, rate) in results.items():
    if label == "stretch":
        continue
    ratios = base_tau / tau
    log(f"  {label:14s}: worst-param N_eff/s {rate:,.0f} "
        f"({rate/base_rate:.2f}x), tau ratio min/med/max "
        f"{ratios.min():.2f}/{np.median(ratios):.2f}/{ratios.max():.2f}")
log("DONE")
