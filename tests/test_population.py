"""Hierarchical population inference (sampling/population.py).

Strategy: the sampled hyper-posterior is pinned against direct 2-D grid
integration of the SAME hyper-likelihood (an independent quadrature of
the importance-reweighting estimator), including the truncated-support
and Gaussian-interim-prior variants; the lognormal family is pinned to
its exact gaussian-in-ln-theta equivalent; and a slow injection-recovery
runs the full two-stage pipeline on a simulated survey.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.population import (PopulationModel,
                                           make_population_log_like,
                                           fit_population,
                                           population_from_survey,
                                           weight_n_eff)

MU_TRUE, TAU_TRUE = 2.0, 0.3


def _stage1_samples(C=16, S=256, s_meas=0.15, support=None, seed=1):
    """Per-cluster stage-1 posteriors: theta_c ~ N(MU, TAU), measured
    with noise s_meas under a flat interim prior -> posterior
    N(theta_hat_c, s_meas).  With ``support``, draws are
    rejection-trimmed to the box (stage-1 samples always respect it)."""
    rng = np.random.default_rng(seed)
    theta = MU_TRUE + TAU_TRUE * rng.standard_normal(C)
    that = theta + s_meas * rng.standard_normal(C)
    if support is not None:
        # a real stage-1 posterior concentrates inside the prior box
        that = np.clip(that, support[0] + s_meas, support[1] - s_meas)
    cols = []
    for c in range(C):
        d = that[c] + s_meas * rng.standard_normal(4 * S)
        if support is not None:
            d = d[(d >= support[0]) & (d <= support[1])]
        assert d.size >= S
        cols.append(d[:S])
    return np.stack(cols)


def _grid_moments(samples, model, mu_rng, lsig_rng, interim_logp=None,
                  n=120):
    """Direct quadrature of the hyper-posterior (flat hyperpriors on mu
    and log sigma over the given ranges): posterior mean/sd of mu and
    of sigma.  Chunked so the (n^2, C, S) broadcast never materializes
    at once (1-core host)."""
    ll = jax.jit(make_population_log_like(samples, model,
                                          interim_logp=interim_logp))
    mg = np.linspace(*mu_rng, n)
    lg = np.linspace(*lsig_rng, n)
    phi = np.stack(np.meshgrid(mg, lg, indexing="ij"), -1).reshape(-1, 2)
    lp = np.concatenate([
        np.asarray(ll(jnp.asarray(phi[i:i + n], jnp.float32)))
        for i in range(0, phi.shape[0], n)
    ]).reshape(n, n)
    w = np.exp(lp - lp.max())
    w /= w.sum()

    def _med(grid, marg):
        cdf = np.cumsum(marg)
        return float(np.interp(0.5, cdf, grid))

    # medians, matching what PopulationResult reports (the truncated
    # sigma posterior is heavy-tailed: mean and median differ a lot)
    mu_marg, sig_marg = w.sum(axis=1), w.sum(axis=0)
    mu_m = _med(mg, mu_marg)
    mu_sd = np.sqrt((mu_marg * (mg - (mu_marg * mg).sum()) ** 2).sum())
    sig = np.exp(lg)
    sig_m = _med(sig, sig_marg)
    sig_sd = np.sqrt((sig_marg * (sig - (sig_marg * sig).sum()) ** 2).sum())
    return mu_m, mu_sd, sig_m, sig_sd


def _fit(samples, model, mu_rng, lsig_rng, **kw):
    return fit_population(samples, model, mu_bounds=mu_rng,
                          log_sigma_bounds=lsig_rng, n_walkers=64,
                          n_burn=200, n_steps=800, thin=5, seed=3, **kw)


# narrow boxes around the truth: the grid must resolve the posterior
# (sd ~ TAU/sqrt(C) ~ 0.08 in mu), and sampler and quadrature share the
# same flat-hyperprior box so their posteriors are identical objects
MU_RNG, LSIG_RNG = (1.5, 2.5), (np.log(0.05), np.log(1.0))


def test_population_matches_grid_flat_interim():
    """Sampled (mu, sigma) posterior agrees with direct 2-D quadrature
    of the same hyper-likelihood, and recovers the injected truth."""
    # seed 5 realizes a per-cluster scatter of 0.301 (close to TAU_TRUE;
    # small-C realizations vary a lot and the estimator deconvolves the
    # 0.15 measurement noise, so recovery is asserted loosely — the
    # sharp check is sampler == quadrature)
    x = _stage1_samples(seed=5)
    model = PopulationModel("theta", "gaussian", support=(-10.0, 10.0))
    mu_m, mu_sd, sig_m, sig_sd = _grid_moments(x, model, MU_RNG, LSIG_RNG)
    res = _fit(x, model, MU_RNG, LSIG_RNG)
    assert abs(res.mu - mu_m) < 0.25 * mu_sd
    assert abs(res.sigma - sig_m) < 0.3 * sig_sd
    assert abs(res.mu - MU_TRUE) < 4 * res.mu_sd
    assert 0.4 * TAU_TRUE < res.sigma < 2.0 * TAU_TRUE
    assert res.n_eff_weights.min() > 30


def test_population_matches_grid_truncated():
    """Support truncation (population pressing on the prior box): the
    renormalization term is exercised and sampler == quadrature."""
    support = (1.8, 2.3)
    x = _stage1_samples(support=support, seed=2)
    model = PopulationModel("theta", "gaussian", support=support)
    mu_m, mu_sd, sig_m, sig_sd = _grid_moments(
        x, model, MU_RNG, (np.log(0.05), np.log(2.0)))
    res = _fit(x, model, MU_RNG, (np.log(0.05), np.log(2.0)))
    assert abs(res.mu - mu_m) < 0.3 * mu_sd
    assert abs(res.sigma - sig_m) < 0.35 * sig_sd


def test_population_matches_grid_gaussian_interim():
    """Gaussian stage-1 prior: the importance ratio divides it out;
    sampler == quadrature with the same interim correction."""
    x = _stage1_samples(seed=3)
    model = PopulationModel("theta", "gaussian", support=(-10.0, 10.0),
                            interim=(2.0, 0.5))
    mu_m, mu_sd, sig_m, sig_sd = _grid_moments(x, model, MU_RNG, LSIG_RNG)
    res = _fit(x, model, MU_RNG, LSIG_RNG)
    assert abs(res.mu - mu_m) < 0.3 * mu_sd
    assert abs(res.sigma - sig_m) < 0.35 * sig_sd
    # and the interim correction changes the answer vs pretending flat
    flat = PopulationModel("theta", "gaussian", support=(-10.0, 10.0))
    mu_f, _, sig_f, _ = _grid_moments(x, flat, MU_RNG, LSIG_RNG)
    assert abs(mu_f - mu_m) > 1e-4 or abs(sig_f - sig_m) > 1e-4


def test_lognormal_equals_gaussian_in_log():
    """lognormal(theta) hyper-likelihood == gaussian(ln theta) with the
    interim log-prior shifted by the Jacobian ln theta (exact identity;
    the truncation terms map bound-for-bound)."""
    x = np.exp(_stage1_samples(C=6, S=128) / 2.0)     # positive draws
    sup = (float(x.min()) * 0.5, float(x.max()) * 2.0)
    ln_model = PopulationModel("theta", "lognormal", support=sup)
    g_model = PopulationModel("theta", "gaussian",
                              support=(np.log(sup[0]), np.log(sup[1])))
    ll_ln = make_population_log_like(x, ln_model)
    ll_g = make_population_log_like(np.log(x), g_model,
                                    interim_logp=np.log(x))
    phi = jnp.asarray([[0.5, np.log(0.3)], [0.8, np.log(0.1)],
                       [0.2, np.log(1.0)]], jnp.float32)
    np.testing.assert_allclose(np.asarray(ll_ln(phi)),
                               np.asarray(ll_g(phi)), rtol=2e-5)


def test_weight_n_eff_and_thin_overlap_warning():
    x = _stage1_samples(C=4, S=256)
    model = PopulationModel("theta", "gaussian", support=(-10.0, 10.0))
    n_eff = weight_n_eff(x, model, (MU_TRUE, np.log(1.0)))
    assert n_eff.shape == (4,) and np.all(n_eff > 1)
    # a population density far from every cluster -> thin weights warn
    with pytest.warns(UserWarning, match="n_eff"):
        fit_population(x, model, mu_bounds=(4.9, 5.1),
                       log_sigma_bounds=(np.log(0.005), np.log(0.01)),
                       n_walkers=16, n_burn=20, n_steps=40, thin=2,
                       seed=0)


def test_population_model_validation():
    with pytest.raises(ValueError, match="family"):
        PopulationModel("x", "weibull")
    with pytest.raises(ValueError, match="positive"):
        PopulationModel("x", "lognormal", support=(-1.0, 2.0))
    x = _stage1_samples(C=3, S=64)
    model = PopulationModel("theta", "gaussian")
    with pytest.raises(ValueError, match="interim_logp"):
        make_population_log_like(x, model, interim_logp=np.zeros((3, 8)))
    # a zero sample would NaN-poison the lognormal hyper-likelihood
    # (log(0) - log(0)) and silence the n_eff diagnostics — fail loudly
    xz = np.abs(x) + 0.1
    xz[1, 3] = 0.0
    ln = PopulationModel("theta", "lognormal", support=(0.0, 100.0))
    with pytest.raises(ValueError, match="strictly"):
        make_population_log_like(xz, ln)
    with pytest.raises(ValueError, match="strictly"):
        weight_n_eff(xz, ln, (0.0, 0.0))
    # C=1: all walkers would start at one mu, which affine stretch
    # proposals can never change — a confident delta-function posterior
    with pytest.raises(ValueError, match="2 clusters"):
        fit_population(x[:1], model, n_walkers=8, n_burn=0, n_steps=10)


@pytest.mark.slow
def test_two_stage_injection_recovery(ref_data):
    """Full pipeline: simulate a survey with a log-normal P_0
    population, fit it (stage 1), infer the population (stage 2); the
    population mean must be recovered."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.simulate import simulate_survey
    from joxsz_tpu.survey import fit_survey

    cfg = JoXSZConfig.cl1226(str(ref_data))
    sess = build_session(cfg)
    names = list(sess.params.thawed)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=float)
    C = 6
    rng = np.random.default_rng(11)
    mu_pop = float(np.log(theta0[names.index("P_0")]))
    truths = np.tile(theta0, (C, 1))
    truths[:, names.index("P_0")] = np.exp(
        mu_pop + 0.25 * rng.standard_normal(C))
    survey = simulate_survey(sess.model, truths, rng)
    res = fit_survey(sess.model, survey.sz_stack, survey.xray_stack,
                     truths, n_walkers=32, n_burn=200, n_steps=300,
                     thin=5, seed=4)
    pres = population_from_survey(res, sess.params, "P_0",
                                  family="lognormal", seed=4)
    assert abs(pres.mu - mu_pop) < 4 * pres.mu_sd
    assert pres.sigma < 1.0
