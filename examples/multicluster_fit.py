"""Example: batched multi-cluster fitting on a device mesh.

Fits C independent clusters simultaneously, each with its own walker
ensemble, sharded over a ('cluster', 'walker') mesh.  With one process per
host and real multi-chip hardware the same code scales over ICI; here it
runs on whatever devices are visible (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh).

The survey is a real injection-recovery exercise: each cluster is a mock
observation simulated (joxsz_tpu.simulate) from its own known parameter
vector through the bundled CL J1226.9+3332 instrument configuration, and
the fit's per-cluster medians are compared against the injected truths.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models.multicluster import make_multicluster_log_like
from joxsz_tpu.parallel import make_mesh, run_multi_cluster
from joxsz_tpu.simulate import simulate_survey


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the local CPU backend")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny schedule for CI")
    args = ap.parse_args(argv)

    # honor JAX_PLATFORMS=cpu in-process: some launchers (e.g. a
    # site-customized remote-accelerator boot) override the env var
    # after import, which would silently put the "virtual mesh" run on
    # one real device
    if args.cpu or os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cfg = JoXSZConfig.cl1226()
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    else:
        # accelerator backends run f32 (like the CLI): a f64 request
        # without x64 enabled truncates with a warning per array
        cfg.dtype = "float32"
    sess = build_session(cfg)

    # --- inject a mock survey: C clusters with distinct true parameters ----
    C = 4
    theta0 = np.asarray(sess.params.thawed_values())
    names = list(sess.params.thawed)
    rng = np.random.default_rng(0)
    thetas_true = np.tile(theta0, (C, 1))
    thetas_true[:, names.index("P_0")] *= np.linspace(0.7, 1.3, C)
    thetas_true[:, names.index("\\beta")] += np.linspace(-0.03, 0.03, C)
    survey = simulate_survey(sess.model, thetas_true, rng)
    batched_ll = jax.jit(make_multicluster_log_like(
        sess.model, survey.sz_stack, survey.xray_stack))

    # --- mesh + ensembles ---------------------------------------------------
    n_dev = len(jax.devices())
    n_c = min(C, n_dev)
    mesh = make_mesh(n_dev, axis_names=("cluster", "walker"),
                     shape=(n_c, n_dev // n_c))
    W = 32
    p0 = thetas_true[:, None, :] * (
        1 + 0.02 * rng.standard_normal((C, W, theta0.size)))

    out = run_multi_cluster(batched_ll, p0, n_steps=50 if args.smoke
                            else 500, key=jax.random.PRNGKey(0), mesh=mesh)
    print("acceptance per cluster:",
          out["acceptance_fraction"].mean(axis=1).round(3))
    print("best log-prob per cluster:", out["log_prob"].max(axis=1).round(1))

    # --- recovery: final walker-cloud medians vs injected truths -----------
    # (500 steps is a demo schedule, not a converged posterior — see
    # tests/test_recovery.py for the calibrated slow version)
    med = np.median(np.asarray(out["positions"]), axis=1)   # (C, ndim)
    for pname in ("P_0", "\\beta"):
        i = names.index(pname)
        print(f"{pname:8s} truth {np.round(thetas_true[:, i], 3)}"
              f"  median {np.round(med[:, i], 3)}")


if __name__ == "__main__":
    main()
