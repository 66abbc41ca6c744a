"""Alternative parametrizations (BASELINE config #4), SZ-only sessions
(config #1), and postproc smoke tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models import (
    KnotPressure, GNFWPressure, VikhlininDensity, UPPTemperature,
    VikhlininTemperature, HSEMass,
)


@pytest.fixture(scope="module")
def sz_session(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)), sz_only=True)


def test_sz_only_session(sz_session):
    """Config #1: the preprofit capability — SZ likelihood only."""
    assert sz_session.model.xray_data is None
    theta0 = jnp.asarray(sz_session.params.thawed_values())
    ll = float(jax.jit(sz_session.log_like)(theta0))
    assert np.isfinite(ll)
    # with no X-ray term the value must equal prior + SZ ll
    from joxsz_tpu.models.sz import sz_log_like
    pars = sz_session.params.unpack(theta0)
    sz = float(sz_log_like(pars, sz_session.model.sz_data,
                           sz_session.model.pressure,
                           sz_session.model.temperature))
    pr = float(sz_session.params.log_prior(theta0))
    assert np.isclose(ll, sz + pr, rtol=1e-12)


def test_knot_pressure_component():
    knots = np.array([50.0, 150.0, 400.0, 1000.0, 3000.0])
    kp = KnotPressure(knots)
    pars = {n: v for n, v in
            zip(kp.param_names(), kp.init_logP)}
    r = jnp.asarray(np.geomspace(50, 3000, 64))
    P = np.asarray(kp(pars, r))
    assert P.shape == (64,) and np.all(P > 0)
    # interpolates the knots exactly
    Pk = np.asarray(kp(pars, jnp.asarray(knots)))
    assert np.allclose(np.log10(Pk), kp.init_logP, atol=1e-6)
    # derivative via autodiff is negative (decreasing profile)
    dP = np.asarray(kp.derivative(pars, r))
    assert np.all(dP < 0)


def test_knot_pressure_in_sz_likelihood(sz_session):
    """Swap the gNFW pressure for knots and evaluate the SZ likelihood."""
    from joxsz_tpu.models.sz import sz_log_like
    from joxsz_tpu.models.joint import JointModel
    from joxsz_tpu.models.params import ParamSet, Param, gaussian_param
    from collections import OrderedDict

    geom = sz_session.geometry
    knots = np.geomspace(geom.r_press_kpc[0], geom.r_press_kpc[-1], 6)
    kp = KnotPressure(knots)
    dens = VikhlininDensity()
    temp = UPPTemperature(kp, dens)

    pars = dens.default_params()
    pars.update(temp.default_params())
    pars.update(kp.default_params())
    pars.update(OrderedDict([("calibration",
                              gaussian_param(1.0, 1.0, 0.07))]))
    pars.freeze(r"\alpha", 0.0)
    pars.freeze(r"\gamma", 3.0)

    model = JointModel(pressure=kp, density=dens, temperature=temp,
                       params=pars, sz_data=sz_session.model.sz_data,
                       exclude_unphysical_mass=False)
    theta0 = jnp.asarray(pars.thawed_values())
    ll = float(jax.jit(model.log_like)(theta0))
    assert np.isfinite(ll)
    # batched evaluation too
    batch = jnp.asarray(np.tile(np.asarray(theta0), (4, 1)))
    lls = np.asarray(jax.jit(jax.vmap(model.log_like))(batch))
    assert np.allclose(lls, ll)


def test_knots_mass_veto(ref_data):
    """The knots family keeps a physicality veto (reference
    joxsz_funcs.py:522-525) in segment-averaged form: the default
    gNFW-seeded init passes, a mass-decreasing knot vector is rejected,
    and the config flag is honoured (no silent disable)."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.pressure_model = "knots"
    assert cfg.exclude_unphysical_mass
    sess = build_session(cfg)
    assert sess.model.exclude_unphysical_mass  # not overridden

    theta0 = np.asarray(sess.params.thawed_values())
    assert np.isfinite(float(sess.log_like(jnp.asarray(theta0))))

    names = sess.params.thawed
    kix = [i for i, n in enumerate(names) if n.startswith("logP_")]

    # flatten the outer pressure segment: the segment-averaged HSE mass
    # drops across the last midpoint -> -inf
    th = theta0.copy()
    th[kix[-1]] = th[kix[-2]] - 1e-3
    assert float(sess.log_like(jnp.asarray(th))) == -np.inf

    # increasing outer pressure (positive slope -> negative mass) is
    # also unphysical
    th2 = theta0.copy()
    th2[kix[-1]] = th2[kix[-2]] + 0.5
    assert float(sess.log_like(jnp.asarray(th2))) == -np.inf

    # enough of a reference-style init cloud must survive for the
    # rejection-resampled walker init to work
    rng = np.random.default_rng(0)
    cloud = theta0[None] * (1 + 0.1 * rng.standard_normal((256,
                                                           theta0.size)))
    lp = np.asarray(jax.vmap(sess.log_like)(jnp.asarray(cloud)))
    assert np.isfinite(lp).mean() > 0.3


def test_parametric_temperature():
    vt = VikhlininTemperature()
    pars = {n: p.val for n, p in
            zip(vt.default_params().names,
                [vt.default_params()[n] for n in vt.default_params().names])}
    r = jnp.asarray(np.geomspace(10, 2000, 50))
    T = np.asarray(vt.t_x(pars, r))
    assert np.all(T > 0)
    # cool core: T(10 kpc) < T(300 kpc)
    assert T[0] < np.max(T)
    # declining outskirts
    assert T[-1] < np.max(T)


def test_postproc_smoke(ref_data):
    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    # a physically plausible centre (near the CL J1226 MLE), not the raw
    # defaults (whose mass profile exceeds M_500 out to the grid edge)
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta0 = np.array([centre[n] for n in sess.params.thawed])
    rng = np.random.default_rng(0)
    flat = theta0[None] * (1 + 0.01 * rng.standard_normal((64, theta0.size)))

    from joxsz_tpu.postproc import (
        compute_profiles, compute_mass_profiles, compute_gas_fraction,
        posterior_predictive,
    )

    r_pp = sess.geometry.r_press_kpc
    profs = compute_profiles(sess.model, sess.cosmology, r_pp, flat)
    assert profs.density.shape == (3, r_pp.size)
    assert np.all(profs.density > 0)
    assert np.all(profs.temp_sz[1] > 0)
    assert np.all(np.diff(profs.gas_mass[1]) > 0)  # cumulative

    mass_bands, r_delta, m_delta = compute_mass_profiles(
        sess.model, sess.cosmology, r_pp, flat, delta=500.0)
    assert mass_bands.shape == (3, r_pp.size)
    # r500 of a massive z~0.9 cluster: hundreds of kpc to ~1.5 Mpc
    assert 200 < r_delta[1, 0] < 2500
    assert 1e13 < m_delta[1, 0] < 5e15

    fgas = compute_gas_fraction(sess.model, sess.cosmology, r_pp, flat)
    assert fgas.shape == (3, r_pp.size)
    assert np.all(fgas[1] > 0)

    perc_x, perc_sz = posterior_predictive(sess.model, flat)
    assert perc_x.shape[0] == 3 and perc_sz.shape[0] == 3


def test_gas_mass_matches_reference_formula(ref_data):
    """cumulative_gas_mass against a direct numpy transcription of the
    reference's cum_gas_mass math (joxsz_plots.py:208-217)."""
    import joxsz_tpu.constants as K
    from joxsz_tpu.postproc.profiles import cumulative_gas_mass

    r = np.arange(16.0, 2000.0, 16.0)
    ne = 1e-2 / (1 + (r / 300.0) ** 2)

    edg_cm = np.append(r[0] / 2, r + r[0] / 2) * K.kpc_cm
    mgas = (ne * K.mu_e * K.mu_g / K.solar_mass_g * 4 / 3 * np.pi
            * (edg_cm[1:] ** 3 - edg_cm[:-1] ** 3))
    lo, hi = edg_cm[:-1], edg_cm[1:]
    v_in = (lo + hi) ** 3 / 24 - lo**3 / 3
    v_out = hi**3 / 3 - (lo + hi) ** 3 / 24
    expected = mgas * (v_in / (v_in + v_out)) + np.concatenate(
        ([0], np.cumsum(mgas)[:-1]))

    got = np.asarray(cumulative_gas_mass(jnp.asarray(ne), jnp.asarray(r)))
    assert np.allclose(got, expected, rtol=1e-10)


@pytest.mark.parametrize("opt", ["knots", "vikhT", "double"])
def test_postproc_alternative_families(ref_data, opt):
    """Post-processing (thermo profiles + overdensity mass) works for
    every alternative model family — regression for the hard-coded UPP
    ratio in compute_profiles and the shape-changing knot derivative in
    the r_delta bisection."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    if opt == "knots":
        cfg.pressure_model = "knots"
    elif opt == "vikhT":
        cfg.temperature_model = "vikhlinin"
    else:
        cfg.density_mode = "double"
    sess = build_session(cfg)
    theta0 = np.asarray(sess.params.thawed_values())
    rng = np.random.default_rng(1)
    flat = theta0[None] * (1 + 0.01 * rng.standard_normal(
        (16, theta0.size)))

    from joxsz_tpu.postproc import compute_profiles, compute_mass_profiles

    r_pp = sess.geometry.r_press_kpc
    profs = compute_profiles(sess.model, sess.cosmology, r_pp, flat)
    assert profs.density.shape == (3, r_pp.size)
    assert np.all(np.isfinite(profs.temp_x[1]))
    mass_bands, r_delta, m_delta = compute_mass_profiles(
        sess.model, sess.cosmology, r_pp, flat, delta=500.0)
    assert mass_bands.shape == (3, r_pp.size)
    assert np.isfinite(r_delta[1, 0])
