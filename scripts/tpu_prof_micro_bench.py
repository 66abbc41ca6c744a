"""Same-claim micro-attribution INSIDE the shared profile/veto chunk at
the W=32768 throughput peak, plus the RECIP_MUL knob A/B + accuracy gate.

The peak ablation (results/tpu_peak_ablation.json) put the shared
"likelihood_rest" at ~344 us/step (37%): priors + gNFW pressure/dpress
+ Vikhlinin density + HSE mass veto on (B, 384) grids.  This splits it:

* ``prof_pressstub`` — drop the pressure exp/log1p/exp chain (keep the
  shapes, data dependence and downstream divides);
* ``prof_densstub``  — drop the density log1p/log1p/exp chain (keep the
  x-ratio divides and the sqrt);
* ``prof_noveto``    — skip the mass-veto block (m computation +
  comparisons + reductions);
* ``RECIP_MUL``      — reciprocal-multiply/rsqrt rewrite of the chunk's
  full-width divides/sqrt (see ops/pallas_joint.py knob comment).

Each variant runs 2x1000 dependent-chained steps.  RECIP_MUL also gets
the posterior-row accuracy gate (CLAUDE.md r3 2x-band rule): 2048 rows
from the pinned converged chain, kernel-vs-XLA near-peak band must not
exceed 2x the base kernel's, with no extra veto flips.

Run:  setsid nohup python -u scripts/tpu_prof_micro_bench.py > /tmp/pmicro.log 2>&1 &
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import h5py  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

from joxsz_tpu.build import build_session  # noqa: E402
from joxsz_tpu.config import JoXSZConfig  # noqa: E402
import joxsz_tpu.ops.pallas_joint as pj  # noqa: E402

log(f"backend {jax.default_backend()}")
if jax.default_backend() == "cpu":
    log("FATAL: needs the TPU backend")
    sys.exit(1)

RECIP_DEFAULT = pj.RECIP_MUL                # restore the shipped default

W, N_IN, REPS = 32768, 1000, 2
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), np.float32)
rng = np.random.default_rng(0)
p0 = jnp.asarray(theta0[None] * (
    1 + 0.01 * rng.standard_normal((W, theta0.size))).astype(np.float32))
core = pj.make_joint_core(sess, block_b=256)
lp0 = core(p0)
jax.block_until_ready(lp0)
log("session + core ready")

VARIANTS = [
    ("base", None, ""),
    ("pressstub", None, "prof_pressstub"),
    ("densstub", None, "prof_densstub"),
    ("noveto", None, "prof_noveto"),
    ("recip_mul", True, ""),
]

out = {"W": W, "n_steps": REPS * N_IN}
for name, knob, ablate in VARIANTS:
    if knob is not None:
        pj.RECIP_MUL = knob
    try:
        k_ = pj.make_step_kernel(sess, n_inner=N_IN, n_walkers=W,
                                 ablate=ablate)
        if k_ is None:
            log(f"{name}: kernel builder returned None — skipped")
            continue
        x, lp, acc = k_(p0, lp0, jnp.zeros(W, jnp.float32), 21)
        jax.block_until_ready(x)
        t1 = time.time()
        for i in range(REPS):
            x, lp, acc = k_(x, lp, acc, 22 + i)
        jax.block_until_ready(x)
        us = (time.time() - t1) / (REPS * N_IN) * 1e6
        out[name] = round(us, 2)
        log(f"{name:>11}: {us:8.2f} us/step ({W / us:.2f}M evals/s)")
    except Exception as e:
        log(f"{name}: FAILED — {type(e).__name__}: {e}")
        out[name] = None
    finally:
        pj.RECIP_MUL = RECIP_DEFAULT

# ---- RECIP_MUL accuracy gate on posterior rows (2x-band rule) -----------
with h5py.File(REPO / "results" / "tpu_r3" / "joxsz_chain.hdf5", "r") as f:
    ch = np.asarray(f["mcmc/chain"])          # (n_saved, W, D)
rng = np.random.default_rng(7)
ns, Wc, D = ch.shape
rows = ch[rng.integers(ns // 2, ns, 2048),
          rng.integers(0, Wc, 2048)].astype(np.float32)
p = jnp.asarray(rows)
ll_xla = jax.jit(jax.vmap(sess.log_like))
lp_x = np.asarray(ll_xla(p))
log(f"2048 posterior rows from {ch.shape}")

report = {}
for name, knob in [("base", False), ("recip_mul", True)]:
    pj.RECIP_MUL = knob
    core_k = pj.make_joint_core(sess, block_b=256)
    lp_k = np.asarray(core_k(p))
    pj.RECIP_MUL = RECIP_DEFAULT
    d = np.abs(lp_k - lp_x)
    fin = np.isfinite(lp_x) & np.isfinite(lp_k)
    peak = lp_x[fin].max()
    r = {}
    for win in (30.0, 100.0):
        m = fin & (lp_x >= peak - win)
        r[f"max_dll_within_{int(win)}"] = float(d[m].max())
        r[f"rows_within_{int(win)}"] = int(m.sum())
    r["max_dll_all_finite"] = float(d[fin].max())
    r["veto_flips"] = int(np.sum(np.isfinite(lp_x) != np.isfinite(lp_k)))
    report[name] = r
    log(f"accuracy {name}: {r}")

ok = (report["recip_mul"]["max_dll_within_100"]
      <= max(2.0 * report["base"]["max_dll_within_100"], 0.1)
      and report["recip_mul"]["veto_flips"]
      <= report["base"]["veto_flips"] + 2)
out["accuracy"] = report
out["accuracy_pass"] = bool(ok)

if out.get("base"):
    out["attribution_us"] = {
        "press_transcendentals": (round(out["base"] - out["pressstub"], 2)
                                  if out.get("pressstub") else None),
        "dens_transcendentals": (round(out["base"] - out["densstub"], 2)
                                 if out.get("densstub") else None),
        "mass_veto": (round(out["base"] - out["noveto"], 2)
                      if out.get("noveto") else None),
        "recip_mul_gain": (round(out["base"] - out["recip_mul"], 2)
                           if out.get("recip_mul") else None),
    }
print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_prof_micro.json").write_text(
    json.dumps(out, indent=2))
log(f"accuracy gate: {'PASS' if ok else 'FAIL'}")
log("DONE")
