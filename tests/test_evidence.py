"""Model-evidence estimation: analytic ground truth on conjugate
Gaussian problems, the prior/likelihood split of JointModel, and the
ladder machinery's edge cases."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.evidence import (
    run_evidence_ladder, power_betas, _logmeanexp,
)


def _gaussian_problem(ndim, prior_sigma, like_sigma, mu):
    """Prior N(0, s^2 I) (normalized), likelihood N(mu, t^2 I) as a
    function of theta.  Analytic evidence: Z = N(mu | 0, (s^2+t^2) I)."""
    s2, t2 = prior_sigma**2, like_sigma**2
    mu = np.full(ndim, mu)

    def log_prior(x):
        return -0.5 * jnp.sum(x * x, axis=-1) / s2 \
            - 0.5 * ndim * np.log(2 * np.pi * s2)

    def log_like(x):
        d = x - mu
        return -0.5 * jnp.sum(d * d, axis=-1) / t2 \
            - 0.5 * ndim * np.log(2 * np.pi * t2)

    log_z = float(-0.5 * np.sum(mu**2) / (s2 + t2)
                  - 0.5 * ndim * np.log(2 * np.pi * (s2 + t2)))
    return log_prior, log_like, log_z


def test_gaussian_evidence_matches_analytic():
    """Stepping-stone and TI both recover the analytic log-evidence of a
    3-dim conjugate Gaussian (a 5.5-nat evidence deficit vs the prior
    scale — a real contraction, not a null test)."""
    lpri, llik, truth = _gaussian_problem(3, prior_sigma=3.0,
                                          like_sigma=0.5, mu=1.0)
    key = jax.random.PRNGKey(0)
    p0 = 3.0 * jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    res = run_evidence_ladder(lpri, llik, p0, power_betas(12), 1500, key,
                              n_burn=500, thin=5)
    assert abs(res.log_z - truth) < 0.15, (res.log_z, truth)
    assert abs(res.log_z_ti - truth) < 0.3, (res.log_z_ti, truth)
    assert res.log_z_err < 0.2
    # the reported MC error should be an honest scale for the miss
    assert abs(res.log_z - truth) < 5 * max(res.log_z_err, 0.02)
    # ladder health: all swap rates nonzero, TI integrand monotone-ish
    assert (res.swap_acceptance > 0.05).all()
    assert res.mean_log_like[0] < res.mean_log_like[-1]


def test_bayes_factor_ranks_models():
    """Two 'models' = two likelihood centres; data generated at mu=0
    favours the centred model by the analytic log Bayes factor."""
    lpri, llikA, zA = _gaussian_problem(2, 2.0, 0.7, mu=0.0)
    _, llikB, zB = _gaussian_problem(2, 2.0, 0.7, mu=2.0)
    p0 = 2.0 * jax.random.normal(jax.random.PRNGKey(2), (64, 2))
    rA = run_evidence_ladder(lpri, llikA, p0, power_betas(10), 1000,
                             jax.random.PRNGKey(3), n_burn=400, thin=5)
    rB = run_evidence_ladder(lpri, llikB, p0, power_betas(10), 1000,
                             jax.random.PRNGKey(4), n_burn=400, thin=5)
    bf = rA.log_z - rB.log_z
    assert abs(bf - (zA - zB)) < 0.3, (bf, zA - zB)
    assert bf > 0.5      # the centred model clearly wins


def test_evidence_invariant_to_prior_normalization():
    """MCMC never sees the prior's normalization, so adding a constant
    to log_prior must not move the estimate (the normalized prior is
    the reference measure either way)."""
    lpri, llik, truth = _gaussian_problem(2, 2.0, 0.8, mu=0.5)
    p0 = 2.0 * jax.random.normal(jax.random.PRNGKey(5), (64, 2))

    def lpri_shifted(x):
        return lpri(x) + 123.0

    kw = dict(n_burn=400, thin=5)
    r1 = run_evidence_ladder(lpri, llik, p0, power_betas(10), 1000,
                             jax.random.PRNGKey(6), **kw)
    r2 = run_evidence_ladder(lpri_shifted, llik, p0, power_betas(10),
                             1000, jax.random.PRNGKey(6), **kw)
    np.testing.assert_allclose(r1.log_z, r2.log_z, atol=1e-6)
    assert abs(r1.log_z - truth) < 0.3


def test_stepping_stone_robust_to_zero_likelihood_regions():
    """A likelihood that is exactly zero on half the prior support
    (L = 0 for x0 < 0): stepping-stone stays finite and correct while
    TI honestly reports -inf (prior mass where log L = -inf)."""
    s2 = 4.0

    def lpri(x):
        return -0.5 * jnp.sum(x * x, axis=-1) / s2

    def llik(x):
        # truncated Gaussian likelihood: N(1, 0.5^2) for x0 >= 0, else 0
        d = x - 1.0
        ll = -0.5 * jnp.sum(d * d, axis=-1) / 0.25 \
            - 0.5 * np.log(2 * np.pi * 0.25)
        return jnp.where(x[..., 0] >= 0, ll, -jnp.inf)

    # analytic: Z = integral over x0>=0 of N(x0|0,s2)N(x0|1,0.25)
    # = N(1|0,s2+0.25) * Phi(m/sq) with posterior mean m, var v
    v = 1.0 / (1 / s2 + 1 / 0.25)
    m = v * (1.0 / 0.25)
    from scipy.stats import norm
    truth = float(norm.logpdf(1.0, 0, np.sqrt(s2 + 0.25))
                  + norm.logsf(0.0, m, np.sqrt(v)))
    p0 = jnp.abs(2.0 * jax.random.normal(jax.random.PRNGKey(7), (64, 1)))
    res = run_evidence_ladder(lpri, llik, p0, power_betas(12), 1500,
                              jax.random.PRNGKey(8), n_burn=500, thin=5)
    assert np.isfinite(res.log_z)
    assert abs(res.log_z - truth) < 0.2, (res.log_z, truth)
    assert res.log_z_ti == float("-inf")


def test_ladder_validation_and_logmeanexp():
    lpri, llik, _ = _gaussian_problem(1, 1.0, 1.0, 0.0)
    p0 = jnp.zeros((8, 1))
    with pytest.raises(ValueError, match="ascend"):
        run_evidence_ladder(lpri, llik, p0, [0.0, 0.5, 0.9], 10,
                            jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="ascend"):
        run_evidence_ladder(lpri, llik, p0, [0.1, 0.5, 1.0], 10,
                            jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="rungs"):
        power_betas(1)
    assert _logmeanexp(np.array([-np.inf, -np.inf])) == -np.inf
    # half the mass at exp(0), half at 0 -> log(1/2)
    assert np.isclose(_logmeanexp(np.array([0.0, -np.inf])), np.log(0.5))


def test_joint_model_split_and_evidence_smoke(ref_data):
    """JointModel.log_prior_only + log_data_like == log_like exactly on
    a walker cloud (finite and vetoed points), and the session-level
    model_evidence helper runs end-to-end on the real joint model."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    model = sess.model
    rng = np.random.default_rng(0)
    theta0 = np.asarray(sess.params.thawed_values())
    cloud = theta0[None] * (1 + 0.3 * rng.standard_normal((256, theta0.size)))
    lp = jax.vmap(model.log_like)(jnp.asarray(cloud))
    pri = jax.vmap(model.log_prior_only)(jnp.asarray(cloud))
    lik = jax.vmap(model.log_data_like)(jnp.asarray(cloud))
    tot = np.asarray(pri) + np.asarray(lik)
    lp = np.asarray(lp)
    fin = np.isfinite(lp)
    assert fin.sum() > 10 and (~fin).sum() > 10   # both classes exercised
    np.testing.assert_allclose(tot[fin], lp[fin], rtol=1e-6)
    assert not np.isfinite(tot[~fin]).any()

    from joxsz_tpu.sampling.evidence import model_evidence

    res = model_evidence(model, n_rungs=8, n_walkers=32, n_steps=200,
                         n_burn=200, thin=10, seed=0)
    assert np.isfinite(res.log_z)
    assert (res.swap_acceptance >= 0).all()
