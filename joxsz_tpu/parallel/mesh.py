"""Device-mesh helpers for walker / cluster sharding.

The reference's only parallelism is a ``multiprocessing.Pool`` mapping
likelihood calls over walkers (SURVEY.md §2.2).  The TPU-native scaling
axes are:

  * ``walker`` — shard the ensemble across chips; each chip evaluates its
    walkers' likelihoods locally.  The stretch move needs the positions of
    the complementary half-ensemble, which XLA materialises as a small
    all-gather of the (W, D) position matrix over ICI (W*D floats — a few
    KB; latency-bound, negligible).
  * ``cluster`` — batch independent cluster fits (BASELINE config #5);
    no cross-cluster communication at all, so this axis scales linearly
    over ICI or even DCN.

``make_mesh`` builds a Mesh over the available devices; the samplers accept
shardings produced by ``walker_sharding``/``cluster_sharding``.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("walker",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            # silently building a smaller mesh would make every
            # walkers-per-device computation downstream (statistical
            # floors, hybrid auto-routing) wrong with no signal
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devs)} available")
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def walker_sharding(mesh: Mesh, axis: str = "walker") -> NamedSharding:
    """Shard a (W, D) walker matrix over the walker axis."""
    return NamedSharding(mesh, P(axis))


def cluster_walker_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (C, W, D) multi-cluster ensemble over ('cluster','walker')."""
    return NamedSharding(mesh, P("cluster", "walker"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
