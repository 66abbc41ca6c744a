"""Multi-cluster batched fitting (BASELINE config #5).

The reference fits one cluster per process; the TPU-native scaling story
batches many independent cluster fits as a leading array axis: the data
containers (``SZData``/``XrayData``) are registered pytrees, so stacking C
clusters gives one pytree whose leaves carry a leading cluster axis, and

    vmap over clusters ( vmap over walkers ( log_like ) )

evaluates every walker of every cluster in a single device program.
Sharded over a ('cluster', 'walker') mesh there is zero cross-cluster
communication (see ``parallel.sharded.run_multi_cluster``).

Requirements: the clusters must share array shapes (same map geometry,
annuli count, band count — i.e. a common instrument configuration).  For
heterogeneous surveys, group clusters by shape and run one batch per
group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sz import SZData
from .xray import XrayData


def _stack(datas):
    """Stack a list of identical-structure pytrees along a new axis 0."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *datas)


def stack_sz_data(datas: list[SZData]) -> SZData:
    seps = {d.sep for d in datas}
    if len(seps) != 1:
        raise ValueError("clusters must share map geometry (sep differs)")
    return _stack(datas)


def stack_xray_data(datas: list[XrayData]) -> XrayData:
    return _stack(datas)


def make_multicluster_log_like(model, sz_stack: SZData | None,
                               xray_stack: XrayData | None):
    """(C, W, D) parameter batch -> (C, W) log-likelihoods.

    The single-cluster ``model`` provides components/priors; the stacked
    data provide per-cluster observations."""

    def one(theta, sz, xr):
        return model.log_like(theta, sz_data=sz, xray_data=xr)

    over_walkers = jax.vmap(one, in_axes=(0, None, None))
    in_sz = 0 if sz_stack is not None else None
    in_xr = 0 if xray_stack is not None else None
    over_clusters = jax.vmap(over_walkers, in_axes=(0, in_sz, in_xr))

    def batched(thetas):
        return over_clusters(thetas, sz_stack, xray_stack)

    return batched
