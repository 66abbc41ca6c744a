"""Hybrid coupled-ensemble validation (VERDICT r3 task 4): does the
amortized sampler (chip-local windows + one global coupled step per
window) mix like the fully coupled single ensemble when walkers-per-chip
is BELOW the independent-ensemble floor?

Single-chip GROUP EMULATION of the exact move law: 4 "chips" of 32
walkers (W=128 total; the equivalence floor is 64/chip, the hard floor
2*ndim+2 = 28).  Window steps advance each group through its own
32-walker fused kernel (the same law as make_sharded_kernel_step on a
4-chip mesh); the coupled step runs the W=128 packed-half kernel
(n_dev=1 mesh) — the same law as the multi-chip coupled step.  tau is a
property of the move law, not of device placement, so the emulation
measures the real thing; only the W=256 COST numbers at the end are
single-chip (the multi-chip cost model is in
kernel_sharded.run_hybrid_coupled_ensemble's docstring).

Variants (same claim, same init cloud, own-law equilibration):
  global       one 128-walker ensemble (pure-coupled law = fused kernel)
  independent  4x32, never coupled (the known-artifacted baseline)
  hybrid10     4x32 windows of 9 local steps + 1 global coupled step
  hybrid100    windows of 99 local steps + 1 coupled step

Writes results/tpu_hybrid_mixing.json.
Run: setsid nohup python -u scripts/tpu_hybrid_mixing_bench.py \
    > /tmp/thyb.log 2>&1 &
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
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
from joxsz_tpu.parallel import make_mesh
from joxsz_tpu.parallel.kernel_sharded import (_get_coupled_driver,
                                               run_coupled_sharded_ensemble,
                                               run_hybrid_coupled_ensemble)
from joxsz_tpu.postproc.summary import chain_tau_steps

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
mesh1 = make_mesh(1, axis_names=("walker",))
log(f"backend {jax.default_backend()}; session ready")

W, G = 128, 4
WL = W // G
N_EQ, N_MEAS = 12000, 30000
rng = np.random.default_rng(5)
x0 = (theta0[None] * (1 + 0.1 * rng.standard_normal((W, D)))
      ).astype(np.float32)
iz = list(sess.params.thawed).index("Z")
ie = list(sess.params.thawed).index(r"\epsilon")
out = {"W": W, "groups": G, "walkers_per_group": WL,
       "eq_steps": N_EQ, "meas_steps": N_MEAS, "variants": {}}

built = _get_coupled_driver(sess, W, 1, 1, 2.0, False, "walker",
                            "onehot", mesh1)
coupled_fn, half, _ = built
Dp = half.Dp
DL = Dp - 2


def coupled_step(x, lp):
    xp = jnp.zeros((W, Dp), jnp.float32).at[:, :D].set(x)
    xp = xp.at[:, DL].set(lp)
    sd = jnp.asarray([int(rng.integers(0, 2**31 - 1))], jnp.int32)
    xA, xB, _ = coupled_fn(sd, xp[:W // 2], xp[W // 2:], *half._consts)
    xf = jnp.concatenate([xA, xB])
    return xf[:, :D], xf[:, DL]


def measure(name, n_local, thin, couple):
    """One variant.  n_local: steps per window; None = full-ensemble
    500-step windows (the 'global' law).  couple: add one global
    coupled step after each window."""
    if n_local is None:
        kern = make_step_kernel(sess, n_inner=500, n_walkers=W, thin=thin)
    else:
        kern = make_step_kernel(sess, n_inner=n_local, n_walkers=WL,
                                thin=thin)
    x = jnp.asarray(x0)
    lp = core(x)
    accs = [jnp.zeros(W if n_local is None else WL, jnp.float32)
            for _ in range(1 if n_local is None else G)]
    per_window = (500 if n_local is None else n_local) + \
        (1 if couple else 0)
    frames = []
    wall = 0.0
    for phase, n_total, record in (("eq", N_EQ, False),
                                   ("meas", N_MEAS, True)):
        done = 0
        t1 = time.time()
        while done < n_total:
            if n_local is None:
                x, lp, accs[0], ch, _ = kern(x, lp, accs[0],
                                             int(rng.integers(2**31)))
                if record:
                    frames.append(np.asarray(ch)[:, :64, :D])
            else:
                xs, lps, chs = [], [], []
                for g in range(G):
                    xg, lpg, accs[g], ch, _ = kern(
                        x[g * WL:(g + 1) * WL], lp[g * WL:(g + 1) * WL],
                        accs[g], int(rng.integers(2**31)))
                    xs.append(xg)
                    lps.append(lpg)
                    chs.append(ch)
                x = jnp.concatenate(xs)
                lp = jnp.concatenate(lps)
                if record:
                    frames.append(np.concatenate(
                        [np.asarray(c)[:, :16, :D] for c in chs], axis=1))
            if couple:
                x, lp = coupled_step(x, lp)
            done += per_window
        jax.block_until_ready(x)
        if phase == "meas":
            wall = time.time() - t1
    sub = np.concatenate(frames)
    # effective frame spacing in RAW steps: hybrid windows record
    # n_local/thin frames but advance n_local+1 steps (the coupled step
    # is unrecorded), so the spacing is per_window/frames-per-window,
    # not `thin` — assuming uniform `thin` spacing underestimated
    # hybrid10's tau by ~11% (r4 self-review #4)
    n_rec = 500 if n_local is None else n_local
    eff_spacing = per_window / (n_rec / thin)
    tau = chain_tau_steps(sub, eff_spacing)
    med = np.median(sub.reshape(-1, D), axis=0)
    r = {"tau_max": round(float(tau.max()), 1),
         "tau_mean": round(float(tau.mean()), 1),
         "median_Z": round(float(med[iz]), 4),
         "median_eps": round(float(med[ie]), 4),
         "thin": thin, "frame_spacing_steps": round(eff_spacing, 3),
         "wall_s": round(wall, 2)}
    out["variants"][name] = r
    log(f"{name:12s}: tau_max {r['tau_max']:7.1f} tau_mean "
        f"{r['tau_mean']:6.1f} Z~{r['median_Z']} eps~{r['median_eps']} "
        f"wall {wall:.1f}s")


measure("global", None, 25, couple=False)
measure("independent", 500, 25, couple=False)
measure("hybrid10", 9, 3, couple=True)
measure("hybrid100", 99, 33, couple=True)

# ---- same-claim cost at W=256, n_dev=1 mesh -------------------------------
WC = 256
xc = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (WC, D)))).astype(np.float32))
lpc = core(xc)
stepc = make_step_kernel(sess, n_inner=500, n_walkers=WC)
x, lp, acc = stepc(xc, lpc, jnp.zeros(WC, jnp.float32), 1)
jax.block_until_ready(x)
t1 = time.time()
for i in range(4):
    x, lp, acc = stepc(x, lp, acc, 2 + i)
jax.block_until_ready(x)
fused_us = (time.time() - t1) / 2000 * 1e6

# warm with the IDENTICAL call: the coupled-driver cache keys on
# n_steps, so a 100-step warm-up does NOT warm a 500-step timed call —
# the original 7647 us/step reading included the one-time driver build
# (r4 self-review; treat it as an upper bound)
run_coupled_sharded_ensemble(sess, np.asarray(xc), 500, 3, mesh1, thin=10)
t1 = time.time()
run_coupled_sharded_ensemble(sess, np.asarray(xc), 500, 3, mesh1, thin=10)
coupled_us = (time.time() - t1) / 500 * 1e6

run_hybrid_coupled_ensemble(sess, np.asarray(xc), 2, 100, 3, mesh1,
                            thin=9, allow_small=True)
t1 = time.time()
run_hybrid_coupled_ensemble(sess, np.asarray(xc), 10, 100, 3, mesh1,
                            thin=9, allow_small=True)
hybrid_us = (time.time() - t1) / 1000 * 1e6

out["cost_w256_us_per_step"] = {
    "fused": round(fused_us, 1), "pure_coupled": round(coupled_us, 1),
    "hybrid_sync100": round(hybrid_us, 1),
    "note": "n_dev=1 mesh, same claim; on a real mesh the coupled step "
            "adds 2 ICI gathers and the window is one sharded dispatch"}
log(f"cost us/step @W=256: fused {fused_us:.0f}, pure coupled "
    f"{coupled_us:.0f}, hybrid(sync=100) {hybrid_us:.0f}")

p = pathlib.Path("/root/repo/results/tpu_hybrid_mixing.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
