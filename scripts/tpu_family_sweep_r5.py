"""r5 family sweep at production scale: the alternative model-family
kernels (knot pressure, parametric-Vikhlinin T, double-beta density,
SZ-only) have carried r1 numbers at W=512 since the packed-X-ray /
RECIP_MUL / half_tile optimization rounds — all of which are
family-agnostic (they live in the shared spec/ll_body construction).
This measures each family's fused kernel at W=8192 in one claim
(dependent-chained 500-step blocks, no chain, so dispatch cannot
pipeline-fake the rate).

Also hardware-smokes the r5 mixed-family survey path: a gnfw+knots
3-cluster spec through `python -m joxsz_tpu.survey --step-kernel` must
run BOTH family groups on their fused cluster-grid kernels on the real
chip (the CPU test covers interpret mode only).

Writes results/tpu_family_sweep_r5.json.
Run: setsid nohup python -u scripts/tpu_family_sweep_r5.py \
    > /tmp/fam.log 2>&1 &
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel

W = 8192
out = {"W": W, "runs": []}


def family_cfg(name):
    cfg = JoXSZConfig.cl1226()
    cfg.dtype = "float32"
    sz_only = False
    if name == "knots":
        cfg.pressure_model = "knots"
    elif name == "vikh_T":
        cfg.temperature_model = "vikhlinin"
    elif name == "double_ne":
        cfg.density_mode = "double"
    elif name == "sz_only":
        sz_only = True
    return cfg, sz_only


for name in ("gnfw", "knots", "vikh_T", "double_ne", "sz_only"):
    cfg, sz_only = family_cfg(name)
    sess = build_session(cfg, sz_only=sz_only)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    D = theta0.size
    core = make_joint_core(sess, block_b=256)
    if core is None:
        log(f"{name}: outside kernel specialisation")
        continue
    rng = np.random.default_rng(9)
    x0 = jnp.asarray((theta0[None] * (1 + 0.05 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    t1 = time.time()
    step = make_step_kernel(sess, n_inner=500, n_walkers=W)
    if step is None:
        log(f"{name}: step kernel declined")
        continue
    x, lp, acc = x0, core(x0), jnp.zeros(W, jnp.float32)
    try:
        x, lp, acc = step(x, lp, acc, 5)
        jax.block_until_ready(x)
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        out["runs"].append({"family": name, "fail": str(e)[:200]})
        continue
    compile_s = time.time() - t1
    t1 = time.time()
    for i in range(2):
        x, lp, acc = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    wall = time.time() - t1
    evals = 1000 * W
    r = {"family": name, "D": D,
         "compile_plus_first_s": round(compile_s, 1),
         "steps_per_s": round(1000 / wall, 1),
         "evals_per_s_M": round(evals / wall / 1e6, 2),
         "lp_finite_frac": float(np.isfinite(np.asarray(lp)).mean())}
    out["runs"].append(r)
    log(f"{name} (D={D}): {r['evals_per_s_M']}M evals/s "
        f"({r['steps_per_s']} steps/s; first call {compile_s:.0f}s; "
        f"finite lp {r['lp_finite_frac']:.2f})")

# ---- mixed-family survey CLI smoke on the real kernel path -------------
log("mixed-family survey smoke (gnfw+knots, --step-kernel) ...")
import tempfile

td = pathlib.Path(tempfile.mkdtemp(prefix="joxsz_fam_"))
cfgs = []
for i, fam in enumerate(("gnfw", "knots", "gnfw")):
    cfg = JoXSZConfig.cl1226()
    cfg.name = f"cl{i}"
    cfg.pressure_model = fam
    p = td / f"cl{i}.json"
    p.write_text(cfg.to_json())
    cfgs.append({"name": f"cl{i}", "config": str(p)})
spec = td / "survey.json"
spec.write_text(json.dumps({"clusters": cfgs}))

import warnings as _warnings

from joxsz_tpu.survey import main as survey_main

sout = td / "summary.json"
with _warnings.catch_warnings(record=True) as wrec:
    _warnings.simplefilter("always")
    bundles = survey_main(["--spec", str(spec), "--step-kernel",
                           "--walkers", "64", "--burn", "200",
                           "--steps", "200", "--thin", "5",
                           "--seed", "6", "--out", str(sout)])
fallbacks = [str(w.message) for w in wrec
             if "step-kernel specialisation" in str(w.message)]
summary = json.loads(sout.read_text())
finite = all(np.isfinite(list(c["median"].values())).all()
             for c in summary["clusters"])
out["mixed_family_survey"] = {
    "families": summary.get("families"),
    "clusters": [c["name"] for c in summary["clusters"]],
    "kernel_fallback_warnings": fallbacks,
    "all_medians_finite": bool(finite),
    "pass": bool(not fallbacks and finite
                 and len(summary.get("families") or []) == 2),
}
log(f"mixed-family survey: pass={out['mixed_family_survey']['pass']} "
    f"(fallbacks {len(fallbacks)}, finite {finite})")

p = REPO / "results" / "tpu_family_sweep_r5.json"
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
