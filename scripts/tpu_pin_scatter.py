"""Independent-run median-scatter study for the posterior pin floor.

Round-3 finding: the fresh pin check and the pin SOURCE both used seed
31, so pre-RECIP_MUL the "fresh" fit was a bit-identical replay and the
0.08-sd median floor was never exposed to genuine run-to-run scatter.
RECIP_MUL (ULP-class bit change) broke the replay and the first truly
independent realization put 3 of 13 medians at 0.10-0.11 sd from the
pin (beta / log(r_c) / epsilon — the documented heavy-tailed gNFW/beta
degeneracy directions).

This completes a 2x2 (seed x RECIP_MUL) design: pin(31, off) and
results/tpu_pin_fresh (31, on) already exist; this runs (47, on) and
(47, off), then prints the pairwise |median diff|/sd matrix over all
runs.  If diffs group by knob -> RECIP_MUL is systematic (investigate /
revert).  If all pairs scatter alike -> the floor was calibrated on a
replay and must be raised to the measured independent-run scatter.

Run:  setsid nohup python -u scripts/tpu_pin_scatter.py > /tmp/pinscatter.log 2>&1 &
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


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import joxsz_tpu.ops.pallas_joint as pj  # noqa: E402
from joxsz_tpu import run as cli  # noqa: E402

log(f"backend {jax.default_backend()}")
if jax.default_backend() == "cpu":
    log("FATAL: needs the TPU backend")
    sys.exit(1)

RECIP_DEFAULT = pj.RECIP_MUL

# run.py has no output-dir flag; redirect the bundled config's save_dir
# the same way scripts/tpu_pin_check.py does.
import joxsz_tpu.config as cfgmod  # noqa: E402

_orig_cl1226 = cfgmod.JoXSZConfig.cl1226.__func__
_out_holder = {}


def _cl1226_redirected(cls, *a, **kw):
    cfg = _orig_cl1226(cls, *a, **kw)
    cfg.save_dir = str(_out_holder["dir"])
    cfg.plot_dir = str(_out_holder["dir"]) + "/"
    return cfg


cfgmod.JoXSZConfig.cl1226 = classmethod(_cl1226_redirected)

RUNS = [("s47_recip_on", 47, True), ("s47_recip_off", 47, False)]
for name, seed, knob in RUNS:
    out = REPO / "results" / "tpu_pin_scatter" / name
    if (out / "joxsz_summary.json").exists():
        log(f"{name}: already present, skipping")
        continue
    out.mkdir(parents=True, exist_ok=True)
    _out_holder["dir"] = out
    pj.RECIP_MUL = knob
    log(f"{name}: flagless fit seed {seed} RECIP_MUL={knob} -> {out}")
    try:
        cli.main(["--seed", str(seed), "--no-plots"])
    finally:
        pj.RECIP_MUL = RECIP_DEFAULT
    log(f"{name}: done")

# ---- pairwise median-diff matrix over all available runs ---------------
pin = json.loads((REPO / "tests" / "fixtures"
                  / "cl1226_posterior_pin.json").read_text())
params = list(pin["parameters"])
runs = {"pin_s31_off": {p: pin["parameters"][p]["median"] for p in params}}
sd = {p: pin["parameters"][p]["std"] for p in params}

for name, path in [
    ("fresh_s31_on", REPO / "results" / "tpu_pin_fresh"
     / "joxsz_summary.json"),
    ("s47_recip_on", REPO / "results" / "tpu_pin_scatter" / "s47_recip_on"
     / "joxsz_summary.json"),
    ("s47_recip_off", REPO / "results" / "tpu_pin_scatter"
     / "s47_recip_off" / "joxsz_summary.json"),
]:
    if not path.exists():
        log(f"{name}: missing summary at {path}")
        continue
    s = json.loads(path.read_text())
    med = {p: s["parameters"][p]["median"] for p in params}
    runs[name] = med

names = list(runs)
report = {"params": params, "runs": names, "pairs": {}}
log("pairwise max/mean |median diff| in pinned-sd units:")
for i in range(len(names)):
    for j in range(i + 1, len(names)):
        d = np.array([abs(runs[names[i]][p] - runs[names[j]][p]) / sd[p]
                      for p in params])
        key = f"{names[i]} vs {names[j]}"
        worst = params[int(d.argmax())]
        report["pairs"][key] = {
            "max_sd": round(float(d.max()), 4),
            "mean_sd": round(float(d.mean()), 4),
            "worst_param": worst,
        }
        log(f"  {key}: max {d.max():.3f} sd ({worst}), "
            f"mean {d.mean():.3f} sd")

(REPO / "results" / "tpu_pin_scatter" / "scatter.json").write_text(
    json.dumps(report, indent=2))
log("DONE")
