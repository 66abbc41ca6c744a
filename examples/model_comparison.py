"""Example: Bayesian model comparison on the bundled CL J1226.9+3332 data.

Which pressure/density parametrization does the joint SZ+X-ray dataset
actually prefer?  The reference framework cannot ask this question (no
evidence machinery); here each family's log-evidence comes from the
stepping-stone ladder (sampling/evidence.py) and families are ranked by
Bayes factor.  Evidences are w.r.t. each family's own normalized
(veto-restricted) prior — the standard Bayesian semantics, so families
with more parameters pay their Occam factor automatically.

Run (CPU):  python examples/model_comparison.py --cpu --quick
Run (TPU):  python examples/model_comparison.py
Writes results/model_evidence.json.
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="small ladder/schedule (smoke-test scale)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny 2-family schedule for CI (numbers are "
                         "meaningless; exercises the full code path)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "results" /
                                         "model_evidence.json"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.sampling.evidence import model_evidence

    on_tpu = jax.default_backend() not in ("cpu",)
    families = {
        "gnfw_single": {},
        "knots_single": {"pressure_model": "knots"},
        "gnfw_double": {"density_mode": "double"},
    }
    if args.smoke:
        families = {k: families[k] for k in ("gnfw_single", "gnfw_double")}
        kw = dict(n_rungs=3, n_walkers=32, n_steps=40, n_burn=40, thin=4)
    elif args.quick:
        kw = dict(n_rungs=8, n_walkers=64, n_steps=400, n_burn=400,
                  thin=10)
    else:
        kw = dict(n_rungs=16, n_walkers=256, n_steps=4000, n_burn=2000,
                  thin=20)

    results = {}
    for name, overrides in families.items():
        cfg = JoXSZConfig.cl1226()
        cfg.dtype = "float32" if on_tpu else "float64"
        for k, v in overrides.items():
            setattr(cfg, k, v)
        sess = build_session(cfg)
        t0 = time.time()
        res = model_evidence(sess.model, seed=args.seed, **kw)
        wall = time.time() - t0
        results[name] = {
            "log_z": res.log_z,
            "log_z_err": res.log_z_err,
            "log_z_ti": res.log_z_ti,
            "swap_acceptance": [float(s) for s in res.swap_acceptance],
            "mean_log_like_cold": float(res.mean_log_like[-1]),
            "wall_s": wall,
        }
        print(f"{name:14s}  log Z = {res.log_z:.2f} +- {res.log_z_err:.2f}"
              f"  (TI {res.log_z_ti:.2f}; swaps "
              f"{min(res.swap_acceptance):.2f}-{max(res.swap_acceptance):.2f};"
              f" {wall:.0f}s)", flush=True)

    base = results["gnfw_single"]["log_z"]
    print("\nlog Bayes factors vs gnfw_single:")
    for name, r in results.items():
        if name != "gnfw_single":
            print(f"  {name:14s} {r['log_z'] - base:+.2f}")
            r["log_bf_vs_gnfw_single"] = r["log_z"] - base

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "schedule": kw, "seed": args.seed,
        "backend": jax.default_backend(), "families": results,
    }, indent=2))
    print(f"\nwritten {out}")


if __name__ == "__main__":
    main()
