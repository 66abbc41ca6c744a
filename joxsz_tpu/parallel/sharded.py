"""Sharded ensemble sampling: walkers (and clusters) over a device mesh.

Multi-chip equivalent of ``sampling.stretch`` (SURVEY.md §5.8): the walker
ensemble lives sharded over the mesh's walker axis; the per-walker
likelihood runs fully local; the only communication per stretch-move
substep is the all-gather of the complementary half's positions that XLA
inserts for the partner lookup — a few-KB ICI transfer.

For multi-cluster batches (BASELINE config #5), ``run_multi_cluster``
vmaps the single-cluster step over a leading cluster axis; sharded over
('cluster', 'walker') the fits proceed with zero cross-cluster traffic.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling.stretch import make_step, validate_schedule


def make_sharded_drive(log_prob_batch, ndim: int, mesh: Mesh,
                       n_steps: int, thin: int = 1, a: float = 2.0,
                       walker_axis: str = "walker"):
    """jitted driver with walker-sharded state: (x, lp, acc, key) -> same +
    thinned chain.  The per-step logic is identical to the single-chip
    path; sharding constraints keep the ensemble distributed between
    steps."""
    step = make_step(log_prob_batch, ndim, a)
    xs = NamedSharding(mesh, P(walker_axis))
    vs = NamedSharding(mesh, P(walker_axis))

    n_saved = n_steps // thin

    @partial(jax.jit,
             in_shardings=(xs, vs, vs, None),
             out_shardings=((xs, vs, vs), (None, None)))
    def drive(x, lp, acc, key):
        def outer(state, k):
            keys = jax.random.split(k, thin)
            state, _ = jax.lax.scan(step, state, keys)
            return state, (state[0], state[1])

        keys = jax.random.split(key, n_saved)
        state, saved = jax.lax.scan(outer, (x, lp, acc), keys)
        return state, saved

    return drive


_SHARDED_DRIVE_CACHE: dict = {}


def run_sharded_ensemble(log_prob_batch, p0, n_steps, key, mesh,
                         thin: int = 1, a: float = 2.0):
    """Convenience wrapper mirroring ``run_ensemble`` on a mesh.

    Compiled drivers are cached per (fn, schedule, shapes, mesh) like
    every other sampler driver: the fit driver's chunked-checkpoint and
    auto-extend loops call this once per chunk with identical
    configuration, and an uncached build paid a full re-trace per chunk
    on the mesh XLA-fallback path."""
    W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    xs = NamedSharding(mesh, P("walker"))
    x = jax.device_put(jnp.asarray(p0), xs)
    lp = log_prob_batch(x)
    acc = jnp.zeros((W,), dtype=x.dtype)
    cache_key = (log_prob_batch, n_steps, thin, a, W, D, mesh)
    drive = _SHARDED_DRIVE_CACHE.get(cache_key)
    if drive is None:
        drive = make_sharded_drive(log_prob_batch, D, mesh, n_steps,
                                   thin, a)
        _SHARDED_DRIVE_CACHE[cache_key] = drive
        if len(_SHARDED_DRIVE_CACHE) > 16:
            _SHARDED_DRIVE_CACHE.pop(next(iter(_SHARDED_DRIVE_CACHE)))
    (x, lp, acc), (chain, logp) = drive(x, lp, acc, key)
    return {
        "chain": np.asarray(chain),
        "log_prob": np.asarray(logp),
        "acceptance_fraction": np.asarray(acc) / float(n_steps),
        "final": (x, lp),
    }


_MC_DRIVE_CACHE: dict = {}


def make_multicluster_step(log_prob_batch_cluster, C: int, W: int, D: int,
                           a: float = 2.0):
    """Full ensemble step batched across clusters: the half-updates operate
    on (C, H, D) blocks so every cluster's half-batch is evaluated in a
    single call to log_prob_batch_cluster; one PRNG block per step and
    the shared stretch primitive (sampling.stretch.stretch_half_update).
    Shared by the single-process mesh runner below and the multi-host
    runner (parallel.multihost)."""
    from ..sampling.stretch import stretch_half_update

    H = W // 2

    def step_all(state, k):
        x, lp, acc = state
        dtype = x.dtype
        u_all = jax.random.uniform(k, (2, C, 3, H), dtype=dtype)

        def half(x, lp, acc, u3, which):
            if which == 0:
                xm, lm, xf = x[:, :H], lp[:, :H], x[:, H:]
            else:
                xm, lm, xf = x[:, H:], lp[:, H:], x[:, :H]
            xm, lm, accept = stretch_half_update(
                log_prob_batch_cluster, u3, xm, lm, xf, a, D)
            if which == 0:
                x = jnp.concatenate([xm, x[:, H:]], axis=1)
                lp = jnp.concatenate([lm, lp[:, H:]], axis=1)
                acc = acc.at[:, :H].add(accept.astype(dtype))
            else:
                x = jnp.concatenate([x[:, :H], xm], axis=1)
                lp = jnp.concatenate([lp[:, :H], lm], axis=1)
                acc = acc.at[:, H:].add(accept.astype(dtype))
            return x, lp, acc

        x, lp, acc = half(x, lp, acc, u_all[0], 0)
        x, lp, acc = half(x, lp, acc, u_all[1], 1)
        return (x, lp, acc), None

    return step_all


def run_multi_cluster(log_prob_batch_cluster, p0, n_steps, key, mesh,
                      thin: int = 1, a: float = 2.0):
    """Batched independent ensembles: p0 (C, W, D); the log-prob callable
    maps (C, W, D) -> (C, W) (e.g. vmap of per-cluster batched
    likelihoods).  State is sharded over ('cluster', 'walker').

    Compiled drivers are cached per (fn, schedule, shapes) like the
    single-cluster sampler — repeat calls reuse the program."""
    C, W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    cache_key = (log_prob_batch_cluster, n_steps, thin, a, C, W, D, mesh)
    cached = _MC_DRIVE_CACHE.get(cache_key)
    if cached is not None:
        return cached(p0, key)
    sh3 = NamedSharding(mesh, P("cluster", "walker"))
    sh2 = NamedSharding(mesh, P("cluster", "walker"))

    step_all = make_multicluster_step(log_prob_batch_cluster, C, W, D, a)

    n_saved = n_steps // thin

    @partial(jax.jit, in_shardings=(sh3, sh2, sh2, None),
             out_shardings=((sh3, sh2, sh2), None))
    def drive(x, lp, acc, key):
        def outer(state, k):
            keys = jax.random.split(k, thin)
            state, _ = jax.lax.scan(step_all, state, keys)
            return state, None

        keys = jax.random.split(key, n_saved)
        state, _ = jax.lax.scan(outer, (x, lp, acc), keys)
        return state, None

    def runner(p0_in, key_in):
        x = jax.device_put(jnp.asarray(p0_in), sh3)
        lp = log_prob_batch_cluster(x)
        acc = jnp.zeros((C, W), dtype=x.dtype)
        (x, lp, acc), _ = drive(x, lp, acc, key_in)
        return {
            "positions": np.asarray(x),
            "log_prob": np.asarray(lp),
            "acceptance_fraction": np.asarray(acc) / float(n_steps),
        }

    _MC_DRIVE_CACHE[cache_key] = runner
    if len(_MC_DRIVE_CACHE) > 16:
        _MC_DRIVE_CACHE.pop(next(iter(_MC_DRIVE_CACHE)))
    return runner(p0, key)
