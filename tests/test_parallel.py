"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
walker-sharded ensembles and multi-cluster batched fits (BASELINE configs
#3/#5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.parallel import (
    make_mesh, run_sharded_ensemble, run_multi_cluster,
)


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _gauss_logprob(ndim):
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    return jax.vmap(lp)


@needs_devices
def test_sharded_ensemble_matches_moments():
    mesh = make_mesh(8, axis_names=("walker",))
    lp_b = jax.jit(_gauss_logprob(4))
    W = 64
    p0 = jax.random.normal(jax.random.PRNGKey(0), (W, 4), dtype=jnp.float64)
    out = run_sharded_ensemble(lp_b, p0, 800, jax.random.PRNGKey(1), mesh,
                               thin=4)
    flat = out["chain"].reshape(-1, 4)
    assert 0.1 < out["acceptance_fraction"].mean() < 0.9
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    assert np.allclose(flat.std(axis=0), 1.0, atol=0.15)


@needs_devices
def test_multi_cluster_runs_and_updates():
    mesh = make_mesh(8, axis_names=("cluster", "walker"), shape=(2, 4))
    lp_cb = jax.jit(jax.vmap(_gauss_logprob(3)))
    C, W = 4, 16
    p0 = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (C, W, 3),
                                      dtype=jnp.float64)) * 3.0
    out = run_multi_cluster(lp_cb, p0, n_steps=200,
                            key=jax.random.PRNGKey(3), mesh=mesh)
    assert out["positions"].shape == (C, W, 3)
    # after 200 steps from a wide start the ensemble should have moved and
    # contracted toward the unit Gaussian
    assert out["acceptance_fraction"].mean() > 0.2
    assert out["positions"].std() < 2.0
    assert not np.allclose(out["positions"], p0)


@needs_devices
def test_sharded_equals_unsharded_distribution():
    """Sharding must not change the algorithm: same seed, same init -> the
    sharded run's chain matches the single-device run exactly (the program
    is deterministic and sharding is a layout annotation)."""
    from joxsz_tpu.sampling.stretch import run_ensemble

    lp_b = jax.jit(_gauss_logprob(2))
    W = 32
    p0 = jax.random.normal(jax.random.PRNGKey(5), (W, 2), dtype=jnp.float64)
    mesh = make_mesh(8, axis_names=("walker",))
    sharded = run_sharded_ensemble(lp_b, p0, 50, jax.random.PRNGKey(6),
                                   mesh, thin=5)
    plain = run_ensemble(lp_b, p0, 50, jax.random.PRNGKey(6), thin=5)
    assert np.allclose(sharded["chain"], plain.chain, atol=1e-12)
