"""Parallel tempering: mode mixing on a target the plain stretch move
cannot traverse, plus cold-chain correctness on a unimodal target."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.stretch import run_ensemble
from joxsz_tpu.sampling.tempered import (
    run_tempered_ensemble, default_betas,
)


def _bimodal_logprob(sep=8.0, sigma=0.5):
    """Two well-separated Gaussians at +-sep/2 in the first coordinate."""
    mu = sep / 2.0

    def lp(x):
        a = -0.5 * ((x[0] - mu) ** 2 + x[1] ** 2) / sigma**2
        b = -0.5 * ((x[0] + mu) ** 2 + x[1] ** 2) / sigma**2
        return jnp.logaddexp(a, b)

    return jax.jit(jax.vmap(lp))


def test_schedule_validation():
    """All scan drivers reject a thin that doesn't divide n_steps (the
    old max(n_steps//thin, 1) silently ran a different step count and
    mis-normalised acceptance/swap rates) and n_steps=0."""
    lp_b = jax.jit(jax.vmap(lambda x: -0.5 * jnp.sum(x * x)))
    p0 = jnp.zeros((8, 2))
    key = jax.random.PRNGKey(0)
    betas = default_betas(3)
    with pytest.raises(ValueError, match="multiple of"):
        run_tempered_ensemble(lp_b, p0, betas, 100, key, thin=33)
    with pytest.raises(ValueError, match="positive"):
        run_tempered_ensemble(lp_b, p0, betas, 0, key, thin=25)
    with pytest.raises(ValueError, match="multiple of"):
        run_ensemble(lp_b, p0, 100, key, thin=33)


def test_cold_chain_matches_unimodal_target():
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    lp_b = jax.jit(jax.vmap(lp))
    W, D, K = 32, 3, 4
    key = jax.random.PRNGKey(0)
    p0 = jax.random.normal(key, (W, D), dtype=jnp.float64)
    res = run_tempered_ensemble(lp_b, p0, default_betas(K), 3000,
                                jax.random.PRNGKey(1), thin=3)
    flat = res.chain[200:].reshape(-1, D)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    assert np.allclose(flat.std(axis=0), 1.0, atol=0.12)
    # swaps should actually happen
    assert np.all(res.swap_acceptance > 0.05)


def test_tempering_mixes_modes_where_stretch_cannot():
    lp_b = _bimodal_logprob(sep=10.0, sigma=0.4)
    W = 64
    key = jax.random.PRNGKey(2)
    # all walkers start in the LEFT mode
    p0 = jnp.asarray(
        np.column_stack([
            -5.0 + 0.2 * np.random.default_rng(0).standard_normal(W),
            0.2 * np.random.default_rng(1).standard_normal(W),
        ]))

    # plain ensemble: stuck in the left mode
    plain = run_ensemble(lp_b, p0, 2000, jax.random.PRNGKey(3), thin=4)
    right_frac_plain = (plain.chain[..., 0] > 0).mean()

    # tempered: hot rungs carry walkers across
    temp = run_tempered_ensemble(lp_b, p0, default_betas(6, ratio=0.45),
                                 2000, jax.random.PRNGKey(4), thin=4)
    n_saved = temp.chain.shape[0]
    right_frac_temp = (temp.chain[n_saved // 4:, :, 0] > 0).mean()

    assert right_frac_plain < 0.02, right_frac_plain
    # symmetric target: the tempered cold chain should populate both modes
    assert 0.2 < right_frac_temp < 0.8, right_frac_temp


def test_tempered_drive_cached_across_calls():
    """Repeated identical-schedule calls must reuse ONE compiled driver
    (r4 review: every --temper auto-extend round on the XLA path paid a
    full re-trace before _TEMPER_DRIVE_CACHE)."""
    import jax

    from joxsz_tpu.sampling.tempered import (_TEMPER_DRIVE_CACHE,
                                             run_tempered_ensemble)

    def lp(x):
        return -0.5 * jnp.sum(x * x, axis=-1)

    lp_b = jax.jit(lp)
    p0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 3))
    run_tempered_ensemble(lp_b, p0, [1.0, 0.6], 4, jax.random.PRNGKey(1),
                          thin=2)
    n = len(_TEMPER_DRIVE_CACHE)
    res2 = run_tempered_ensemble(lp_b, p0, [1.0, 0.6], 4,
                                 jax.random.PRNGKey(2), thin=2)
    assert len(_TEMPER_DRIVE_CACHE) == n     # hit, not a new entry
    # different schedule -> new entry
    run_tempered_ensemble(lp_b, p0, [1.0, 0.6], 8, jax.random.PRNGKey(3),
                          thin=2)
    assert len(_TEMPER_DRIVE_CACHE) == n + 1
    assert np.all(np.isfinite(res2.log_prob))
