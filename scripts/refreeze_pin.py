"""Re-freeze tests/fixtures/cl1226_posterior_pin.json from a converged
run's summary (VALIDATION.md; postproc/pin.py).

Use after an INTENDED physics change moves the posterior (e.g. the r3
gNFW-derivative fix removed false mass vetoes) — never to silence an
unexplained pin failure.  The fixture records medians/stds/n_eff per
parameter plus per-parameter width-band overrides CALIBRATED from the
measured spread across the stored converged runs: the sample std of a
heavy-tailed marginal (P_0 against the curved gNFW degeneracy) varies
~0.7-1.4x between converged runs where medians agree to 0.06 sd, so a
one-size (0.8, 1.25) band flakes on exactly the parameter that mixes
worst.

The pin run's narrative (what intended change the re-pin records, which
seed/date) is CLI input — the audit trail must describe the run actually
being pinned, not a hard-coded past one.

Usage: python scripts/refreeze_pin.py <pin_summary.json> <chain.hdf5> \
           <split_rhat_max> [comparison_summary.json ...] \
           --why "<the intended physics change this re-pin records>" \
           --seed N [--date YYYY-MM-DD] [--schedule "..."]
"""

import argparse
import datetime
import hashlib
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
FIXTURE = REPO / "tests" / "fixtures" / "cl1226_posterior_pin.json"
DEFAULT_BAND = (0.8, 1.25)
MARGIN = 1.15          # headroom beyond the observed cross-run extreme

ap = argparse.ArgumentParser()
ap.add_argument("summary")
ap.add_argument("chain")
ap.add_argument("rhat", type=float)
ap.add_argument("comparisons", nargs="*",
                help="other converged summaries for width-band "
                     "calibration")
ap.add_argument("--why", required=True,
                help="the INTENDED physics change this re-pin records "
                     "(commit hash + one line)")
ap.add_argument("--seed", type=int, required=True,
                help="seed of the pin-source run")
ap.add_argument("--date", default=datetime.date.today().isoformat())
ap.add_argument("--schedule",
                default="FLAGLESS converged TPU default (run.py with no "
                        "schedule flags -> W=1024, K=4 tempering, 4000 "
                        "burn + 8000 steps thin 25, fused step kernel, "
                        "auto-extend to split-Rhat <= 1.01)")
args = ap.parse_args()

summary = json.loads(pathlib.Path(args.summary).read_text())["parameters"]
comps = [json.loads(pathlib.Path(p).read_text())["parameters"]
         for p in args.comparisons]

params = {}
spread_note = {}
for name, s in summary.items():
    entry = {"median": s["median"], "std": s["std"],
             "ci_low": s["ci_low"], "ci_high": s["ci_high"],
             "n_eff": s["n_eff"]}
    ratios = [c[name]["std"] / s["std"] for c in comps
              if name in c and s["std"] > 0]
    if ratios:
        lo = min(min(ratios) / MARGIN, DEFAULT_BAND[0])
        hi = max(max(ratios) * MARGIN, DEFAULT_BAND[1])
        if (lo, hi) != DEFAULT_BAND:
            entry["width_band"] = [round(lo, 3), round(hi, 3)]
            spread_note[name] = [round(min(ratios), 3),
                                 round(max(ratios), 3)]
    params[name] = entry

sha = hashlib.sha256(pathlib.Path(args.chain).read_bytes()).hexdigest()
fixture = {
    "_provenance": {
        "run": f"{args.schedule}, seed {args.seed}; {args.why}",
        "claim_date": args.date,
        "chain": str(pathlib.Path(args.chain).resolve()
                     .relative_to(REPO)),
        "chain_sha256": sha,
        "split_rhat_max": args.rhat,
        "width_band_calibration": {
            "comparison_runs": args.comparisons,
            "observed_std_ratio_range": spread_note,
            "rule": f"band = (min_ratio/{MARGIN}, max_ratio*{MARGIN}) "
                    f"where outside the default {DEFAULT_BAND}",
        },
        "median_floor_calibration": {
            "study": "scripts/tpu_pin_scatter.py (round 3) -> "
                     "results/tpu_pin_scatter/scatter.json",
            "design": "2x2 seed(31,47) x RECIP_MUL(on,off), four "
                      "independent converged flagless hardware fits",
            "seed_only_max_sd": 0.055,
            "ulp_knob_cross_pair_max_sd": 0.131,
            "rule": "fresh-mode median floor = worst observed "
                    "cross-pair + ~50% headroom = 0.20 sd "
                    "(postproc/pin.py default)",
        },
        "note": "internal regression anchor; no external anchor exists "
                "in this environment (VALIDATION.md)",
    },
    "parameters": params,
}
FIXTURE.write_text(json.dumps(fixture, indent=1) + "\n")
print(f"re-froze {FIXTURE} from {args.summary} "
      f"(split-Rhat {args.rhat}, {len(params)} parameters, "
      f"width-band overrides: {sorted(spread_note)})")
