"""Example: batched multi-cluster fitting on a device mesh.

Fits C independent clusters simultaneously, each with its own walker
ensemble, sharded over a ('cluster', 'walker') mesh.  With one process per
host and real multi-chip hardware the same code scales over ICI; here it
runs on whatever devices are visible (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh).

For demonstration the bundled CL J1226.9+3332 dataset is cloned with
scaled fluxes; in a real survey, build one session per cluster (same
instrument configuration => same shapes) and stack their data.
"""

import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models.multicluster import (
    stack_sz_data, stack_xray_data, make_multicluster_log_like,
)
from joxsz_tpu.parallel import make_mesh, run_multi_cluster


def main():
    import os

    # honor JAX_PLATFORMS=cpu in-process: some launchers (e.g. a
    # site-customized remote-accelerator boot) override the env var
    # after import, which would silently put the "virtual mesh" run on
    # one real device
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cfg = JoXSZConfig.cl1226()
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
    else:
        # accelerator backends run f32 (like the CLI): a f64 request
        # without x64 enabled truncates with a warning per array
        cfg.dtype = "float32"
    sess = build_session(cfg)

    # --- stack clusters (here: clones with scaled SZ flux) ------------------
    C = 4
    sz_list = [
        dataclasses.replace(sess.model.sz_data,
                            flux=sess.model.sz_data.flux * (1 + 0.05 * c))
        for c in range(C)
    ]
    xr_list = [sess.model.xray_data] * C
    batched_ll = jax.jit(make_multicluster_log_like(
        sess.model, stack_sz_data(sz_list), stack_xray_data(xr_list)))

    # --- mesh + ensembles ---------------------------------------------------
    n_dev = len(jax.devices())
    n_c = min(C, n_dev)
    mesh = make_mesh(n_dev, axis_names=("cluster", "walker"),
                     shape=(n_c, n_dev // n_c))
    W = 32
    theta0 = sess.params.thawed_values()
    rng = np.random.default_rng(0)
    p0 = theta0[None, None] * (
        1 + 0.02 * rng.standard_normal((C, W, theta0.size)))

    out = run_multi_cluster(batched_ll, p0, n_steps=500,
                            key=jax.random.PRNGKey(0), mesh=mesh)
    print("acceptance per cluster:",
          out["acceptance_fraction"].mean(axis=1).round(3))
    print("best log-prob per cluster:", out["log_prob"].max(axis=1).round(1))


if __name__ == "__main__":
    main()
