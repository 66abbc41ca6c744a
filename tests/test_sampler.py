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


@pytest.mark.parametrize("ndim", [2, 5])
def test_de_move_gaussian_target_moments(ndim):
    """The DE move (emcee's DEMove analog; de_half_update) must sample a
    correlated Gaussian correctly — same distributional bar as the
    stretch move."""
    rng = np.random.default_rng(5)
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
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 3)
    p0 = mu_j + 0.1 * jax.random.normal(k1, (W, ndim), dtype=jnp.float64)

    res = run_ensemble(log_prob_b, p0, 500, k2, thin=500, move="de")
    res = run_ensemble(log_prob_b, res.final_state[0], 4000, k3, thin=2,
                       move="de")
    flat = res.chain.reshape(-1, ndim)

    acc = res.acceptance_fraction.mean()
    assert 0.1 < acc < 0.9, f"acceptance {acc}"

    est_mu = flat.mean(axis=0)
    est_cov = np.cov(flat.T)
    scale = np.sqrt(np.diag(cov))
    assert np.all(np.abs(est_mu - mu) < 0.1 * scale)
    assert np.allclose(est_cov, cov, rtol=0.15, atol=0.1 * scale.max()**2)


def test_de_pair_indices_distinct_and_uniform():
    """The (a, b) partner pair must never coincide and must cover the
    off-diagonal pairs uniformly (the b-skip construction)."""
    from joxsz_tpu.sampling.stretch import de_half_update

    Hf, H = 8, 4096
    x_fixed = jnp.arange(Hf, dtype=jnp.float64)[:, None]  # value == index
    x_move = jnp.zeros((H, 1), dtype=jnp.float64)
    lp_move = jnp.full((H,), -jnp.inf)  # never accept: y is irrelevant
    u = jax.random.uniform(jax.random.PRNGKey(2), (3, H), dtype=jnp.float64)
    g = jnp.zeros((H,), dtype=jnp.float64)

    seen = {}

    def lp_fn(y):
        seen["diff"] = y[:, 0]  # gamma0=1, sigma=0, x=0 -> y = xa - xb
        return jnp.full((y.shape[0],), 0.0)

    de_half_update(lp_fn, u, g, x_move, lp_move, x_fixed, 1.0, 0.0)
    diff = np.asarray(seen["diff"])
    # distinct pair: xa - xb == 0 impossible when a != b (values = indices)
    assert np.all(diff != 0.0)
    # uniform over off-diagonal pairs: each signed difference d != 0 has
    # probability (Hf - |d|) / (Hf (Hf - 1)); chi^2-style loose check
    vals, counts = np.unique(diff.astype(int), return_counts=True)
    expected = np.array([(Hf - abs(d)) / (Hf * (Hf - 1)) for d in vals])
    freq = counts / diff.size
    assert np.all(np.abs(freq - expected) < 4 * np.sqrt(expected / diff.size))


def test_make_step_rejects_unknown_move():
    from joxsz_tpu.sampling.stretch import make_step

    with pytest.raises(ValueError, match="unknown move"):
        make_step(lambda x: x[:, 0], 3, move="walk")


@pytest.mark.parametrize("move", ["de", "snooker"])
def test_de_family_curved_target_moments(move):
    """DE and snooker must sample a curved (banana) 3-d target correctly
    — the geometry these moves exist for."""
    def log_prob(x):
        # Rosenbrock-style bend in (x0, x1), Gaussian x2
        return -(0.5 * x[0] ** 2
                 + 2.0 * (x[1] - x[0] ** 2) ** 2
                 + 0.5 * x[2] ** 2)

    log_prob_b = jax.jit(jax.vmap(log_prob))
    W = 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    p0 = jnp.array([0.0, 0.5, 0.0]) + 0.5 * jax.random.normal(
        k1, (W, 3), dtype=jnp.float64)

    res = run_ensemble(log_prob_b, p0, 1000, k2, thin=1000, move=move)
    res = run_ensemble(log_prob_b, res.final_state[0], 6000, k3, thin=3,
                       move=move)
    flat = res.chain.reshape(-1, 3)
    assert 0.01 < res.acceptance_fraction.mean() < 0.9

    # ground truth by direct 2-d quadrature over (x0, x1); x2 is N(0,1)
    g0 = np.linspace(-5, 5, 401)
    g1 = np.linspace(-3, 12, 601)
    X0, X1 = np.meshgrid(g0, g1, indexing="ij")
    P = np.exp(-(0.5 * X0**2 + 2.0 * (X1 - X0**2) ** 2))
    P /= P.sum()
    m1_true = (P * X1).sum()
    v1_true = (P * (X1 - m1_true) ** 2).sum()
    assert abs(flat[:, 1].mean() - m1_true) < 0.25 * np.sqrt(v1_true)
    assert abs(flat[:, 1].var() / v1_true - 1.0) < 0.3
    assert abs(flat[:, 2].mean()) < 0.15 and abs(flat[:, 2].var() - 1) < 0.3


def test_distinct3_indices():
    """The snooker (z, z1, z2) index triple must be distinct and cover
    all ordered triples uniformly."""
    from joxsz_tpu.sampling.stretch import _distinct3

    Hf, H = 6, 30000
    u = jax.random.uniform(jax.random.PRNGKey(4), (3, H), dtype=jnp.float64)
    i0, i1, i2 = (np.asarray(v) for v in _distinct3(u, Hf))
    assert np.all(i0 != i1) and np.all(i0 != i2) and np.all(i1 != i2)
    assert i2.min() >= 0 and i2.max() < Hf
    # uniformity over the Hf*(Hf-1)*(Hf-2) ordered triples
    code = (i0 * Hf + i1) * Hf + i2
    _, counts = np.unique(code, return_counts=True)
    n_triples = Hf * (Hf - 1) * (Hf - 2)
    assert counts.size == n_triples
    expected = H / n_triples
    assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected))
