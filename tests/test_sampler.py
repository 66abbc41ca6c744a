"""Stretch-move sampler correctness: distributional tests on analytic
targets (the emcee-parity strategy from SURVEY.md §7.3.7 — emcee itself is
not installed, so we verify against closed-form posteriors)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.stretch import (
    run_ensemble, generate_init_positions, _sample_z,
)


def test_z_distribution():
    """z ~ g(z) prop 1/sqrt(z) on [1/a, a]: check moments analytically.
    E[z] = int z g(z) dz / int g(z) dz with g = z^-1/2:
    for a=2: E[z] = (a - a^-2)/3 / (sqrt(a)-1/sqrt(a)) * ... use direct
    numeric integral instead."""
    a = 2.0
    key = jax.random.PRNGKey(0)
    z = np.asarray(_sample_z(key, (200_000,), a, jnp.float64))
    assert z.min() >= 1 / a - 1e-12 and z.max() <= a + 1e-12
    # analytic moments of the normalised density on [1/a, a]
    zs = np.linspace(1 / a, a, 100_001)
    g = 1 / np.sqrt(zs)
    m1 = np.trapezoid(zs * g, zs) / np.trapezoid(g, zs)
    m2 = np.trapezoid(zs**2 * g, zs) / np.trapezoid(g, zs)
    assert abs(z.mean() - m1) < 5e-3
    assert abs((z**2).mean() - m2) < 1e-2


@pytest.mark.parametrize("ndim", [2, 5])
def test_gaussian_target_moments(ndim):
    """Sampling a correlated Gaussian must recover mean and covariance."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(ndim, ndim))
    cov = A @ A.T + ndim * np.eye(ndim)
    prec = np.linalg.inv(cov)
    mu = rng.normal(size=ndim) * 2.0

    prec_j = jnp.asarray(prec)
    mu_j = jnp.asarray(mu)

    def log_prob(x):
        d = x - mu_j
        return -0.5 * d @ prec_j @ d

    log_prob_b = jax.jit(jax.vmap(log_prob))
    W = 64
    key = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = mu_j + 0.1 * jax.random.normal(k1, (W, ndim), dtype=jnp.float64)

    # burn, then sample
    res = run_ensemble(log_prob_b, p0, 500, k2, thin=500)
    res = run_ensemble(log_prob_b, res.final_state[0], 4000, k3, thin=2)
    flat = res.chain.reshape(-1, ndim)

    acc = res.acceptance_fraction.mean()
    assert 0.1 < acc < 0.9, f"acceptance {acc}"

    est_mu = flat.mean(axis=0)
    est_cov = np.cov(flat.T)
    # MC error scale: with ~128k samples (heavily autocorrelated), allow a
    # few percent of the scale
    scale = np.sqrt(np.diag(cov))
    assert np.all(np.abs(est_mu - mu) < 0.1 * scale)
    assert np.allclose(est_cov, cov, rtol=0.15, atol=0.1 * scale.max()**2)


def test_walker_init_rejection():
    """Init must produce finite-likelihood walkers only, even with a
    constraining support."""
    def log_prob(x):
        # finite only if all components positive
        ok = jnp.all(x > 0)
        return jnp.where(ok, -0.5 * jnp.sum(x**2), -jnp.inf)

    lp_b = jax.jit(jax.vmap(log_prob))
    theta0 = np.array([0.5, 0.2, 1.0])
    pos = generate_init_positions(lp_b, theta0, 32, jax.random.PRNGKey(1),
                                  spread=0.5)
    assert pos.shape == (32, 3)
    assert bool(jnp.all(jnp.isfinite(lp_b(pos))))


def test_walker_init_zero_coordinate_not_degenerate():
    """A centre value of exactly 0 (the default log(T_X/T_{SZ})) must
    still get per-walker diversity: a pure multiplicative perturbation
    would freeze the whole affine-invariant ensemble in that direction
    FOREVER (the stretch move preserves degenerate directions)."""
    def log_prob(x):
        return -0.5 * jnp.sum(x**2)

    lp_b = jax.jit(jax.vmap(log_prob))
    theta0 = np.array([1.0, 0.0, -2.0])
    pos = np.asarray(generate_init_positions(
        lp_b, theta0, 64, jax.random.PRNGKey(3), spread=0.1))
    assert np.std(pos[:, 1]) > 0.0
    # and the ensemble expands the tiny seed to the posterior width
    res = run_ensemble(lp_b, jnp.asarray(pos), 800,
                       jax.random.PRNGKey(4), thin=8)
    assert np.std(np.asarray(res.chain[-20:, :, 1])) > 0.3


def test_reproducibility():
    """Same seed -> identical chain (counter-based PRNG)."""
    def log_prob(x):
        return -0.5 * jnp.sum(x**2)

    lp_b = jax.jit(jax.vmap(log_prob))
    p0 = jax.random.normal(jax.random.PRNGKey(7), (16, 3), dtype=jnp.float64)
    r1 = run_ensemble(lp_b, p0, 100, jax.random.PRNGKey(9), thin=10)
    r2 = run_ensemble(lp_b, p0, 100, jax.random.PRNGKey(9), thin=10)
    assert np.array_equal(r1.chain, r2.chain)
    r3 = run_ensemble(lp_b, p0, 100, jax.random.PRNGKey(10), thin=10)
    assert not np.array_equal(r1.chain, r3.chain)


def test_validate_schedule_rejects_bad_thin():
    """The shared schedule guard must reject thin<=0 up front (run_hmc /
    run_nuts now rely on it exclusively): thin=0 used to raise a raw
    ZeroDivisionError and thin=-1 passed (n % -1 == 0) then produced a
    negative saved count downstream."""
    from joxsz_tpu.sampling.stretch import validate_schedule

    validate_schedule(100, 10, 4)
    with pytest.raises(ValueError, match="thin"):
        validate_schedule(100, 0, 4)
    with pytest.raises(ValueError, match="thin"):
        validate_schedule(100, -1, 4)
    with pytest.raises(ValueError, match="n_steps"):
        validate_schedule(0, 1, 4)
    with pytest.raises(ValueError, match="multiple"):
        validate_schedule(100, 7, 4)


def test_run_ensemble_keep_walkers_slices_chain():
    """keep_walkers fetches only the first k walkers of the saved chain
    (device-side slice) while sampling the full ensemble: the sliced
    result must equal the full result's prefix at identical seed."""
    def lp_b(x):
        return -0.5 * jnp.sum(x * x, axis=-1)

    p0 = jax.random.normal(jax.random.PRNGKey(0), (16, 3))
    full = run_ensemble(lp_b, p0, 40, jax.random.PRNGKey(1), thin=10)
    part = run_ensemble(lp_b, p0, 40, jax.random.PRNGKey(1), thin=10,
                        keep_walkers=4)
    assert part.chain.shape == (4, 4, 3)
    assert part.log_prob.shape == (4, 4)
    np.testing.assert_array_equal(part.chain, full.chain[:, :4, :])
    np.testing.assert_array_equal(part.log_prob, full.log_prob[:, :4])
    # the final state is the full ensemble either way
    np.testing.assert_array_equal(np.asarray(part.final_state[0]),
                                  np.asarray(full.final_state[0]))
