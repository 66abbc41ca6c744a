"""Heterogeneous-survey hardware smoke (VERDICT r2 #5 on real TPU).

The auto-grouping path (survey.py::_build_spec_survey + merge) is
CPU-tested; this runs the full CLI on hardware with the per-group
Pallas cluster-grid kernel: a 3-cluster spec in TWO stack groups
(clusters 0/2 = the bundled 10-band configuration, cluster 1 drops the
two softest bands), one batched kernel fit per group, merged summary in
spec order.

Run:  setsid nohup python -u scripts/tpu_hetero_survey_smoke.py > /tmp/hetsurv.log 2>&1 &
"""

import json
import pathlib
import sys
import tempfile
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

from joxsz_tpu.config import JoXSZConfig  # noqa: E402
from joxsz_tpu.survey import main  # noqa: E402

log(f"backend {jax.default_backend()}")
if jax.default_backend() == "cpu":
    log("FATAL: needs the TPU backend")
    sys.exit(1)

tmp = pathlib.Path(tempfile.mkdtemp())
cfgs = []
for i, nb in enumerate((10, 8, 10)):
    cfg = JoXSZConfig.cl1226()
    cfg.name = f"cl{i}"
    if nb != 10:
        cfg.xray.bands_eV = tuple(cfg.xray.bands_eV[10 - nb:])
        cfg.xray.table_path = None
    p = tmp / f"cl{i}.json"
    p.write_text(cfg.to_json())
    cfgs.append({"name": f"cl{i}", "config": str(p)})
spec = tmp / "survey.json"
spec.write_text(json.dumps({"clusters": cfgs}))
log("2-group heterogeneous spec written")

out = REPO / "results" / "tpu_hetero_survey.json"
t1 = time.time()
main(["--spec", str(spec), "--step-kernel", "--walkers", "256",
      "--burn", "2000", "--steps", "6000", "--thin", "10",
      "--seed", "9", "--out", str(out)])
wall = time.time() - t1
log(f"survey CLI done in {wall:.1f}s")

summary = json.loads(out.read_text())
names = [c["name"] for c in summary["clusters"]]
assert names == ["cl0", "cl1", "cl2"], names
ok = True
for c in summary["clusters"]:
    med = np.asarray(list(c["median"].values()), float)
    fin = np.isfinite(med).all()
    log(f"{c['name']}: acceptance {c['acceptance']:.3f}, "
        f"medians finite: {fin}")
    ok &= fin and 0.05 <= c["acceptance"] <= 0.9
# the two 10-band clusters fit IDENTICAL data — their medians must
# agree to well under the posterior width (same group, different
# walker streams per cluster row).  Gate at 2 sigma of the POSTERIOR
# sd: this is a smoke-scale schedule (plain-GW tau on this posterior
# is ~800-2000 steps), so each chain retains O(0.5 sd) median MC error
# — a 1.23 sigma worst-parameter pull was measured at burn 1000 /
# steps 2000, shrinking with schedule length; the converged-posterior
# accuracy story lives in the pin checks, not here.
m0 = np.asarray(list(summary["clusters"][0]["median"].values()), float)
m2 = np.asarray(list(summary["clusters"][2]["median"].values()), float)
s0 = np.asarray(list(summary["clusters"][0]["sd"].values()), float)
pulls = np.abs(m0 - m2) / np.maximum(s0, 1e-12)
log(f"cl0-vs-cl2 same-data median pulls: max {pulls.max():.2f} sigma")
ok &= bool(pulls.max() < 2.0)
summary["_smoke"] = {"wall_s": round(wall, 1),
                     "max_same_data_pull_sigma": round(float(pulls.max()), 3),
                     "pass": bool(ok)}
out.write_text(json.dumps(summary, indent=2))
log(f"{'PASS' if ok else 'FAIL'} (written {out})")
log("DONE")
