"""Mock-observation API: the simulated data must follow the likelihood's
own noise model (that is the whole point — injection-recovery is only
valid if simulation and inference share the forward model exactly)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.simulate import simulate_observation


@pytest.fixture(scope="module")
def sess(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)))


def test_noiseless_mock_is_the_model_prediction(sess):
    theta = np.asarray(sess.params.thawed_values())
    rng = np.random.default_rng(0)
    mock = simulate_observation(sess.model, theta, rng, sz_noise=False,
                                xray_noise=False)
    np.testing.assert_array_equal(mock.sz_flux, mock.sz_flux_true)
    np.testing.assert_array_equal(mock.xray_counts, mock.xray_pred_true)
    # fitting model evaluates finite at the truth, and the SZ chi^2 term
    # of a noiseless mock is exactly zero => its log-like is >= the
    # noisy-data log-like at the same theta in expectation; just check
    # finiteness and that data actually changed from the originals
    lp = float(jax.jit(mock.model.log_like)(jnp.asarray(theta)))
    assert np.isfinite(lp)
    assert not np.allclose(np.asarray(mock.model.sz_data.flux),
                           np.asarray(sess.model.sz_data.flux))


def test_mock_noise_follows_the_likelihood_model(sess):
    """Across repeated draws: SZ residuals are N(0, flux_err) per point
    and X-ray counts are Poisson(pred) (mean and variance checks at the
    3-sigma level of the draw count)."""
    theta = np.asarray(sess.params.thawed_values())
    n_draws = 200
    rng = np.random.default_rng(1)
    sz_res = []
    xr = []
    for _ in range(n_draws):
        mock = simulate_observation(sess.model, theta, rng)
        sz_res.append((mock.sz_flux - mock.sz_flux_true))
        xr.append(mock.xray_counts)
    sz_res = np.asarray(sz_res)                    # (n, 19)
    err = np.asarray(sess.model.sz_data.flux_err)
    z = sz_res / err
    assert abs(z.mean()) < 3 / np.sqrt(z.size)
    assert abs(z.std() - 1) < 0.05
    xr = np.asarray(xr)                            # (n, ...)
    pred = np.asarray(
        sess.model.xray_profiles(jnp.asarray(theta)))
    # Poisson: mean == var == pred; test the aggregated pulls
    zp = (xr.mean(axis=0) - pred) / np.sqrt(pred / n_draws)
    assert abs(zp.mean()) < 3 / np.sqrt(zp.size) * 1.5
    assert (xr == np.floor(xr)).all()   # Poisson draws are integer-valued


def test_sz_only_and_xray_only_models(sess):
    import dataclasses

    theta = np.asarray(sess.params.thawed_values())
    rng = np.random.default_rng(2)
    sz_only = dataclasses.replace(sess.model, xray_data=None)
    m1 = simulate_observation(sz_only, theta, rng)
    assert m1.xray_counts is None and m1.sz_flux is not None
    assert m1.model.xray_data is None
    xr_only = dataclasses.replace(sess.model, sz_data=None,
                                  exclude_unphysical_mass=False)
    m2 = simulate_observation(xr_only, theta, rng)
    assert m2.sz_flux is None and m2.xray_counts is not None


def test_unphysical_theta_rejected(sess):
    """A parameter vector with a catastrophically negative predicted
    X-ray profile must be refused, not silently Poisson-sampled."""
    theta = np.asarray(sess.params.thawed_values()).copy()
    names = list(sess.params.thawed)
    # drive the background scale very negative => negative predictions
    theta[names.index("backscale")] = -50.0
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="support"):
        simulate_observation(sess.model, theta, rng)


def test_simulate_survey_stacks_match_per_cluster(sess):
    """A mock survey's stacked likelihood at each cluster's truth must
    equal the single-cluster likelihood with that cluster's mock data
    bound — i.e. the stacking really carries C distinct datasets."""
    import jax

    from joxsz_tpu.models.multicluster import make_multicluster_log_like
    from joxsz_tpu.simulate import simulate_survey

    theta0 = np.asarray(sess.params.thawed_values())
    names = list(sess.params.thawed)
    C = 3
    thetas = np.tile(theta0, (C, 1))
    thetas[:, names.index("P_0")] *= [0.8, 1.0, 1.2]   # distinct truths
    rng = np.random.default_rng(5)
    survey = simulate_survey(sess.model, thetas, rng)
    assert survey.thetas_true.shape == (C, theta0.size)
    # distinct mock data per cluster
    assert not np.allclose(survey.mocks[0].sz_flux, survey.mocks[2].sz_flux)

    batched = jax.jit(make_multicluster_log_like(
        sess.model, survey.sz_stack, survey.xray_stack))
    out = np.asarray(batched(jnp.asarray(thetas)[:, None, :]))  # (C, 1)
    assert out.shape == (C, 1)
    for c in range(C):
        ref = float(sess.model.log_like(
            jnp.asarray(thetas[c]),
            sz_data=survey.mocks[c].model.sz_data,
            xray_data=survey.mocks[c].model.xray_data))
        assert np.isclose(out[c, 0], ref, rtol=1e-12)


def test_recovery_fit_on_mock_is_consistent(sess):
    """End-to-end smoke at test scale: a short fit of a mock started
    from the truth stays in a sane neighbourhood (the full coverage
    test is the slow test_parameter_recovery)."""
    from joxsz_tpu.sampling.stretch import (run_ensemble,
                                            generate_init_positions)

    theta = np.asarray(sess.params.thawed_values())
    rng = np.random.default_rng(4)
    mock = simulate_observation(sess.model, theta, rng)
    lp_b = jax.jit(jax.vmap(mock.model.log_like))
    p0 = generate_init_positions(lp_b, jnp.asarray(theta), 64,
                                 jax.random.PRNGKey(0), spread=0.02)
    res = run_ensemble(lp_b, p0, 200, jax.random.PRNGKey(1), thin=10)
    assert np.isfinite(res.log_prob).all()
    med = np.median(res.chain.reshape(-1, theta.size), axis=0)
    # loose per-parameter sanity relative to each parameter's own scale
    # (r_p lives at ~300 kpc; an absolute bound would be meaningless)
    assert np.all(np.abs(med - theta) < 0.2 * np.maximum(np.abs(theta), 1.0))
