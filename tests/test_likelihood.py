"""Golden-parity tests: the fused JAX likelihood vs an independent
scipy/numpy implementation of the reference math on the bundled data.

This is the test strategy SURVEY.md §4/§7.2 prescribes: the reference's
external engines are not installed, so ground truth is a from-first-
principles host implementation of each stage (which for the SZ side is the
exact ``sz_map_pipeline`` scipy path the operators were built from)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session


@pytest.fixture(scope="module")
def session(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)))


@pytest.fixture(scope="module")
def theta0(session):
    return jnp.asarray(session.params.thawed_values())


def test_parameter_layout(session):
    assert session.params.ndim == 13
    # SURVEY.md §2.4 free parameters all present
    expected = {"log(n_0)", r"\beta", "log(r_c)", "log(r_s)", r"\epsilon",
                "Z", "log(T_X/T_{SZ})", "P_0", "a", "b", "r_p",
                "backscale", "calibration"}
    assert set(session.params.thawed) == expected
    # frozen per reference config: alpha, gamma, c
    for frozen in (r"\alpha", r"\gamma", "c"):
        assert session.params[frozen].frozen
    # bound tightening from annuli edges (joxsz_main.py:160-161)
    assert session.params["log(r_c)"].maxval < 3.7


def test_sz_loglike_vs_numpy(session, theta0):
    """Full SZ chain: fused operators vs the explicit scipy pipeline
    (the session-generic replica lives in tests/replica.py — the
    geometry sweep reuses it at arbitrary shapes)."""
    from replica import sz_loglike_numpy

    expected_ll = sz_loglike_numpy(session, theta0)

    from joxsz_tpu.models.sz import sz_log_like
    pars_j = session.params.unpack(theta0)
    got = float(sz_log_like(pars_j, session.model.sz_data,
                            session.model.pressure,
                            session.model.temperature))
    assert np.isclose(got, expected_ll, rtol=1e-9)


def test_xray_pred_vs_numpy(session, theta0):
    """X-ray predicted counts: JAX path vs independent numpy folding."""
    from replica import xray_cash_numpy, xray_pred_numpy

    pred = xray_pred_numpy(session, theta0)
    got = np.asarray(session.model.xray_profiles(theta0))
    assert np.allclose(got, pred, rtol=1e-9)

    # Cash likelihood agreement
    expected_cash = xray_cash_numpy(session, theta0)
    from joxsz_tpu.models.xray import xray_log_like
    got_ll = float(xray_log_like(session.params.unpack(theta0),
                                 session.model.xray_data,
                                 session.model.density,
                                 session.model.temperature))
    assert np.isclose(got_ll, expected_cash, rtol=1e-9)


def test_joint_is_sum_of_parts(session, theta0):
    from joxsz_tpu.models.sz import sz_log_like
    from joxsz_tpu.models.xray import xray_log_like

    pars = session.params.unpack(theta0)
    sz = float(sz_log_like(pars, session.model.sz_data,
                           session.model.pressure, session.model.temperature))
    xr = float(xray_log_like(pars, session.model.xray_data,
                             session.model.density,
                             session.model.temperature))
    pr = float(session.params.log_prior(theta0))
    total = float(jax.jit(session.log_like)(theta0))
    assert np.isclose(total, sz + xr + pr, rtol=1e-12)


def test_vetoes(session, theta0):
    ll = jax.jit(session.log_like)
    t = np.asarray(theta0)

    # out-of-box parameter -> -inf (box prior)
    bad = t.copy()
    bad[session.params.thawed.index("P_0")] = -0.5
    assert float(ll(jnp.asarray(bad))) == -np.inf

    # r_c > r_s veto (joxsz_funcs.py:397-407)
    bad = t.copy()
    bad[session.params.thawed.index("log(r_c)")] = 3.0
    bad[session.params.thawed.index("log(r_s)")] = 2.0
    assert float(ll(jnp.asarray(bad))) == -np.inf

    # Gaussian prior terms present: shifting calibration by 1 sigma costs 0.5
    shift = t.copy()
    i = session.params.thawed.index("calibration")
    shift[i] = 1.0 + 0.07
    base_prior = float(session.params.log_prior(jnp.asarray(t)))
    new_prior = float(session.params.log_prior(jnp.asarray(shift)))
    assert np.isclose(base_prior - new_prior, 0.5, atol=1e-9)


def test_batched_matches_single(session, theta0):
    rng = np.random.default_rng(11)
    batch = np.asarray(theta0)[None] * (
        1 + 0.02 * rng.normal(size=(8, session.params.ndim)))
    single = np.array([float(jax.jit(session.log_like)(jnp.asarray(b)))
                       for b in batch])
    batched = np.asarray(jax.jit(jax.vmap(session.log_like))(
        jnp.asarray(batch)))
    assert np.allclose(batched, single, rtol=1e-12, equal_nan=True)
