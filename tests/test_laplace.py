"""Laplace approximation + prior-measure utilities: analytic ground
truth on Gaussian problems, exact prior sampling under vetoes, boundary
handling, and (slow) the real joint model on mock data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.models.params import ParamSet, Param, gaussian_param
from joxsz_tpu.sampling.laplace import (
    laplace_approximation, laplace_fit, model_laplace,
)
from joxsz_tpu.sampling.priors import (
    sample_prior, prior_log_norm, product_prior_draws,
)


def _mvn_problem():
    """Unnormalized correlated 3-dim Gaussian with known precision."""
    A = np.array([[2.0, 0.5, 0.0],
                  [0.5, 1.5, -0.3],
                  [0.0, -0.3, 1.0]])
    m = np.array([0.3, -0.7, 1.2])

    def log_post(x):
        d = x - jnp.asarray(m)
        return -0.5 * d @ jnp.asarray(A) @ d

    # integral of exp(log_post) = (2 pi)^{D/2} det(A)^{-1/2}
    log_z = 1.5 * np.log(2 * np.pi) - 0.5 * np.log(np.linalg.det(A))
    return log_post, m, np.linalg.inv(A), log_z


def test_laplace_exact_on_gaussian():
    log_post, m, cov_true, log_z_true = _mvn_problem()
    res = laplace_approximation(log_post, jnp.asarray(m, jnp.float64))
    assert res.ok
    np.testing.assert_allclose(res.cov, cov_true, rtol=1e-8, atol=1e-10)
    assert abs(res.log_z - log_z_true) < 1e-8
    assert abs(res.log_post_map) < 1e-12
    # correlation matrix has unit diagonal
    np.testing.assert_allclose(np.diag(res.correlation), 1.0, rtol=1e-10)


def test_laplace_fit_finds_the_mode():
    """MAP search from a poor start recovers the analytic mode."""
    log_post, m, cov_true, log_z_true = _mvn_problem()
    lo = np.full(3, -10.0)
    hi = np.full(3, 10.0)
    res = laplace_fit(log_post, np.zeros(3), lo, hi)
    assert res.ok
    np.testing.assert_allclose(res.theta_map, m, atol=2e-5)
    assert abs(res.log_z - log_z_true) < 1e-6
    assert not res.at_boundary.any()


def test_laplace_boundary_mode_is_flagged_not_inverted():
    """A mode pinned at a box bound gives a non-PD -H: ok must be False,
    cov NaN (no silent pseudo-inverse), at_boundary set."""
    def log_post(x):
        inside = jnp.all((x >= 0) & (x <= 1))
        return jnp.where(inside, -jnp.sum(x), -jnp.inf)  # mode at lower bound

    lo, hi = np.zeros(2), np.ones(2)
    res = laplace_fit(log_post, np.full(2, 0.5), lo, hi)
    assert not res.ok
    assert np.isnan(res.log_z)
    assert np.isnan(res.cov).all()
    assert res.at_boundary.all()
    assert np.isnan(res.sd_conditional).all()   # no interior subspace left


def test_laplace_conditional_sd_on_mixed_boundary_mode():
    """One interior Gaussian direction + one boundary-pinned linear
    direction: full -H is indefinite but the interior conditional sd
    must come out exactly."""
    def log_post(x):
        inside = jnp.all((x >= 0) & (x <= 1))
        return jnp.where(
            inside, -0.5 * ((x[0] - 0.5) / 0.1) ** 2 - 3.0 * x[1],
            -jnp.inf)

    lo, hi = np.zeros(2), np.ones(2)
    res = laplace_fit(log_post, np.array([0.3, 0.5]), lo, hi)
    assert not res.ok
    assert res.at_boundary.tolist() == [False, True]
    assert abs(res.sd_conditional[0] - 0.1) < 1e-6
    assert np.isnan(res.sd_conditional[1])


class _StubModel:
    """Minimal JointModel-shaped object: params + analytic factors."""

    def __init__(self, params, mu_like, sigma_like):
        self.params = params
        self._mu = jnp.asarray(mu_like)
        self._t2 = float(sigma_like) ** 2

    def log_prior_only(self, theta):
        return self.params.log_prior(theta)

    def log_data_like(self, theta):
        d = theta - self._mu
        D = theta.shape[-1]
        return (-0.5 * jnp.sum(d * d, axis=-1) / self._t2
                - 0.5 * D * np.log(2 * np.pi * self._t2))

    def log_like(self, theta):
        return self.log_prior_only(theta) + self.log_data_like(theta)


def test_model_laplace_conjugate_normalized_evidence():
    """Gaussian priors x Gaussian likelihood: the Laplace evidence is
    exact, and after the MC prior-normalization correction it matches
    the analytic normalized evidence Z = prod_i N(mu_i | m_i, s^2+t^2)
    (the same measure sampling/evidence.py estimates)."""
    s, t = 1.5, 0.4
    params = ParamSet([
        ("x0", gaussian_param(0.1, 0.0, s)),
        ("x1", gaussian_param(-0.2, 0.0, s)),
    ])
    mu = np.array([0.8, -0.5])
    model = _StubModel(params, mu, t)
    res = model_laplace(model, n_prior_samples=50_000, seed=3)
    truth = float(np.sum(-0.5 * mu**2 / (s**2 + t**2)
                         - 0.5 * np.log(2 * np.pi * (s**2 + t**2))))
    assert res.ok
    # prior norm is analytic here (acceptance = 1): 2 * log(sqrt(2pi) s)
    assert abs(res.prior_log_norm
               - 2 * np.log(np.sqrt(2 * np.pi) * s)) < 1e-12
    assert abs(res.log_z_normalized - truth) < 1e-6
    # posterior sd: conjugate shrinkage 1/sqrt(1/s^2 + 1/t^2)
    sd_true = 1.0 / np.sqrt(1 / s**2 + 1 / t**2)
    np.testing.assert_allclose(res.sd, sd_true, rtol=1e-6)


def _veto_paramset():
    params = ParamSet([
        ("x0", Param(0.4, 0.0, 1.0)),
        ("x1", Param(0.6, 0.0, 1.0)),
    ])

    def log_prior_batch(x):
        x = jnp.asarray(x)
        box = params.log_prior if x.ndim == 1 else jax.vmap(params.log_prior)
        return box(x) + jnp.where(x[..., 0] < x[..., 1], 0.0, -jnp.inf)

    return params, log_prior_batch


def test_sample_prior_respects_vetoes():
    params, lpb = _veto_paramset()
    rng = np.random.default_rng(7)
    draws = sample_prior(lpb, params, 4000, rng)
    assert draws.shape == (4000, 2)
    assert (draws[:, 0] < draws[:, 1]).all()
    assert (draws >= 0).all() and (draws <= 1).all()
    # exactness check: under the triangle x0<x1 on [0,1]^2,
    # E[x1] = 2/3 and E[x0] = 1/3
    assert abs(draws[:, 1].mean() - 2 / 3) < 0.02
    assert abs(draws[:, 0].mean() - 1 / 3) < 0.02


def test_prior_log_norm_analytic_triangle():
    """Support fraction of the x0<x1 veto on the unit box is exactly
    1/2: log-norm must estimate log(0.5) within its own reported MC
    error scale."""
    params, lpb = _veto_paramset()
    ln, err = prior_log_norm(lpb, params, 100_000,
                             np.random.default_rng(11))
    assert abs(ln - np.log(0.5)) < 5 * err
    assert err < 0.02


def test_product_prior_draws_rejects_improper_box():
    params = ParamSet([("x0", Param(0.0, -1e99, 1e99))])  # unbounded box
    with pytest.raises(ValueError, match="finite bounds"):
        product_prior_draws(params, 10, np.random.default_rng(0))


@pytest.mark.slow
def test_cli_laplace_quicklook(ref_data, tmp_path, monkeypatch):
    """--laplace on the real data: the CL J1226 MAP pins Z and epsilon
    at 0 (known posterior pile-up), so the quick-look must either flag
    those directions or report a non-PD curvature — and always write
    strict-JSON output."""
    import json
    from joxsz_tpu import run as cli

    monkeypatch.chdir(tmp_path)
    res = cli.main(["--cpu", "--laplace"])
    out = json.loads((tmp_path / "joxsz_laplace.json").read_text())
    assert set(out["theta_map"]) == set(out["sd"])
    boundary = [n for n, b in out["at_boundary"].items() if b]
    assert (not out["ok"]) or boundary, out
    if not res.ok:
        assert out["log_z"] is None      # null, not NaN, in strict JSON
        # the interior directions still get conditional error bars
        finite_cond = [v for v in out["sd_conditional"].values()
                       if v is not None]
        assert len(finite_cond) >= len(out["sd"]) - len(boundary) - 1


@pytest.mark.slow
def test_model_laplace_on_mock_joint_fit(ref_data):
    """Full joint model on interior-truth mock data: the MAP is interior,
    -H is PD, and the Laplace sd agrees with the mock posterior's scale
    (Laplace is a quadratic approximation of a non-Gaussian posterior —
    agreement to a factor ~2 on every parameter is the right bar)."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.simulate import simulate_observation
    from tests.test_recovery import TRUTH

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    p = sess.params
    theta_true = np.array([TRUTH[n] for n in p.thawed])
    model = simulate_observation(
        sess.model, theta_true, np.random.default_rng(5)).model

    res = model_laplace(model, theta0=theta_true, n_prior_samples=40_000,
                        seed=2)
    assert res.ok, (res.eigenvalues, res.at_boundary)
    assert np.isfinite(res.log_z_normalized)
    # weakly identified parameters (epsilon here) may legitimately pin at
    # a box bound for a given noise draw; the Gaussian picture only
    # applies to the interior directions
    interior = ~res.at_boundary
    assert interior.sum() >= p.ndim - 2, dict(zip(p.thawed,
                                                  res.at_boundary))
    # the mode of the mock posterior should sit near the truth
    pulls = np.abs(res.theta_map - theta_true) / res.sd
    assert np.max(pulls[interior]) < 5.0, dict(zip(p.thawed, pulls))

    # cross-check sd scale against a short MCMC on the same posterior
    from joxsz_tpu.sampling import run_ensemble, generate_init_positions

    llb = jax.jit(jax.vmap(model.log_like))
    p0 = generate_init_positions(llb, res.theta_map, 128,
                                 jax.random.PRNGKey(0))
    r = run_ensemble(llb, p0, 3000, jax.random.PRNGKey(1), thin=10)
    flat = r.chain[150:].reshape(-1, p.ndim)     # drop burn-in half
    sd_mcmc = flat.std(axis=0)
    ratio = (res.sd / sd_mcmc)[interior]
    assert np.all((ratio > 0.4) & (ratio < 2.5)), \
        dict(zip(np.asarray(p.thawed)[interior], ratio))
