"""Float32 (TPU) vs float64 numerical consistency of the joint likelihood
(SURVEY.md §7.3.3: f32 with unit rescaling must preserve the posterior)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session


@pytest.fixture(scope="module")
def sessions(ref_data):
    cfg64 = JoXSZConfig.cl1226(str(ref_data))
    cfg32 = JoXSZConfig.cl1226(str(ref_data))
    cfg32.dtype = "float32"
    return build_session(cfg64), build_session(cfg32)


def test_f32_loglike_consistency(sessions):
    s64, s32 = sessions
    theta0 = s64.params.thawed_values()
    rng = np.random.default_rng(0)
    batch = theta0[None] * (1 + 0.02 * rng.standard_normal((32, theta0.size)))

    ll64 = np.asarray(jax.jit(jax.vmap(s64.log_like))(jnp.asarray(batch)))
    ll32 = np.asarray(jax.jit(jax.vmap(s32.log_like))(
        jnp.asarray(batch, dtype=jnp.float32)))

    finite = np.isfinite(ll64)
    assert finite.sum() > 20
    # likelihood DIFFERENCES drive MCMC acceptance; absolute offsets are
    # harmless.  Compare pairwise deltas of finite walkers.
    d64 = ll64[finite] - ll64[finite][0]
    d32 = ll32[finite] - ll32[finite][0]
    scale = np.maximum(np.abs(d64), 1.0)
    rel = np.abs(d64 - d32) / scale
    # f32 roundoff through ~1e4-magnitude Cash sums: expect <1e-3 relative
    assert np.max(rel) < 5e-3, rel

    # veto structure must agree exactly
    assert np.array_equal(np.isfinite(ll64), np.isfinite(ll32))


@pytest.mark.parametrize("fam,mod", [
    ("flagship", {}),
    ("double", {"density_mode": "double"}),
    ("knots", {"pressure_model": "knots"}),
])
def test_veto_flip_rate_pinned(ref_data, fam, mod):
    """PARITY.md deviation #5 regression: kernel-vs-XLA veto-structure
    flips on a fixed 512-walker boundary-rich cloud are pinned at their
    measured value (ZERO in interpret mode for every family, at both
    0.1 and 0.2 multiplicative spread).  A kernel formula change that
    widens the f32 veto-boundary divergence fails here instead of
    slipping through CI.  (Hardware Mosaic rounding can still add
    boundary flips — that residual is the documented deviation; this
    test pins everything CI can see.)"""
    from joxsz_tpu.ops.pallas_joint import make_joint_core

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    for k, v in mod.items():
        setattr(cfg, k, v)
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=64, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float64)
    for spread in (0.1, 0.2):
        rng = np.random.default_rng(7)
        batch = jnp.asarray(
            (theta0[None] * (1 + spread * rng.standard_normal(
                (512, theta0.size)))).astype(np.float32))
        a = np.asarray(core(batch))
        b = np.asarray(ref(batch))
        # the cloud must actually straddle the veto boundary for the
        # pin to mean anything
        assert 0.05 < np.isfinite(b).mean() < 0.95
        flips = int((np.isfinite(a) != np.isfinite(b)).sum())
        assert flips == 0, (fam, spread, flips)


# Converged-chain state (results/tpu_conv) with a~19.7, r_p~126: the
# naive gNFW-derivative form overflows its (1+x^a)^((b-c+a)/a)
# denominator to f32 inf at the outer pressure radii, rounding dP/dr to
# -0 and falsely tripping the mass-monotonicity veto (f64-adjudicated
# genuine PASS, margin ~1e-3 of max|grad| — scripts/
# cpu_finite_mask_adjudicate.py).  Pins the stable -(P/r)(c+(b-c)s) form.
_UNDERFLOW_THETA = {
    "log(n_0)": -1.3871971, r"\beta": 0.21283358, "log(r_c)": 1.7109979,
    "log(r_s)": 2.1557074, r"\epsilon": 2.6171775,
    "log(T_X/T_{SZ})": 0.093440391, "Z": 0.20441175, "P_0": 0.19654875,
    "a": 19.731991, "b": 2.0354238, "r_p": 125.73824,
    "backscale": 0.96535051, "calibration": 1.1109961,
}


def test_f32_gnfw_derivative_no_underflow_veto(sessions):
    s64, s32 = sessions
    theta = np.array([_UNDERFLOW_THETA[n] for n in s32.params.thawed])

    # derivative at the outer grid edge: strictly negative in f32 and
    # consistent with f64 (the old form returned exactly -0.0 here)
    r_edge = np.asarray(s32.model.sz_data.r_press_kpc)[-1]
    pars32 = s32.params.unpack(jnp.asarray(theta, dtype=jnp.float32))
    pars64 = s64.params.unpack(jnp.asarray(theta))
    d32 = float(s32.model.pressure.derivative(pars32, jnp.float32(r_edge)))
    d64 = float(s64.model.pressure.derivative(pars64, float(r_edge)))
    assert d64 < 0
    assert d32 < 0, "f32 dP/dr underflowed to -0 at the outer grid point"
    assert abs(d32 - d64) < 1e-4 * abs(d64)

    # and the joint f32 log-like agrees with f64 on finiteness
    ll64 = float(s64.log_like(jnp.asarray(theta)))
    ll32 = float(jax.jit(s32.log_like)(jnp.asarray(theta,
                                                   dtype=jnp.float32)))
    assert np.isfinite(ll64)
    assert np.isfinite(ll32), "f32 falsely vetoed a genuine posterior state"


def test_f32_no_spurious_inf(sessions):
    """Plausible parameter regions must not produce f32 overflow -inf."""
    _, s32 = sessions
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta = np.array([centre[n] for n in s32.params.thawed])
    rng = np.random.default_rng(1)
    batch = theta[None] * (1 + 0.05 * rng.standard_normal((256, theta.size)))
    ll = np.asarray(jax.jit(jax.vmap(s32.log_like))(
        jnp.asarray(batch, dtype=jnp.float32)))
    # a few walkers may trip real vetoes; the bulk must be finite
    assert np.isfinite(ll).mean() > 0.5
    assert not np.any(np.isnan(ll))


def test_kernel_gnfw_softplus_no_overflow_veto(ref_data):
    """Kernel-vs-XLA parity past the f32 exp overflow edge (round-3
    review finding): the fused kernel used to form ln(1+x^a) as
    log1p(exp(a ln x)), which overflows at a*lnx > 88.7 — reachable
    inside a CUSTOM prior box (wider `a`, bigger map, smaller r_p floor)
    though not the bundled one (max ~78) — zeroing press and falsely
    vetoing XLA-finite states (log-like ~34668 -> -inf).  Both the main
    grid and the X-ray midpoint block now use the stable softplus
    max(z,0)+log1p(e^-|z|), the same form as models/pressure.py."""
    from joxsz_tpu.ops.pallas_joint import make_joint_core

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    p = sess.params
    ia = p.thawed.index("a")
    p.hi[ia] = 60.0                      # the custom-config scenario
    theta = np.array([_UNDERFLOW_THETA[n] for n in p.thawed],
                     dtype=np.float32)
    core = make_joint_core(sess, block_b=64, interpret=True)
    assert core is not None
    ll_xla = jax.jit(jax.vmap(sess.log_like))

    rows = []
    for a in (25.0, 28.0, 40.0):         # a*lnx up to ~147 at r_max
        t = theta.copy()
        t[ia] = a
        rows.append(t)
    batch = jnp.asarray(np.stack(rows))
    lx = np.asarray(ll_xla(batch))
    lk = np.asarray(core(batch))
    assert np.all(np.isfinite(lx)), lx   # genuine states by construction
    assert np.all(np.isfinite(lk)), (
        "kernel falsely vetoed past the exp overflow edge", lk)
    assert np.max(np.abs(lx - lk)) < 0.1, (lx, lk)


def test_f32_mass_overdensity_finite_and_exact():
    """Regression (r4 full-package review #1): mass_overdensity cubed r
    in cm (~1e73) INSIDE the traced computation, overflowing float32 to
    inf on the default TPU run — M_delta = inf made the r_500 bisection
    in compute_mass_profiles collapse to the first grid radius, so the
    mass_hse figure's M500/r500 were silently garbage.  The prefactor
    must fold to one host scalar; the f32 result must be finite and
    match f64 to f32 precision across the physical radius range."""
    from joxsz_tpu.cosmology import Cosmology
    from joxsz_tpu.models.mass import mass_overdensity

    cosmo = Cosmology(z=0.888)
    r = np.array([10.0, 150.0, 1000.0, 5000.0])
    got32 = np.asarray(mass_overdensity(jnp.asarray(r, jnp.float32), cosmo))
    want64 = np.asarray(mass_overdensity(jnp.asarray(r, jnp.float64), cosmo))
    assert np.all(np.isfinite(got32)), got32
    np.testing.assert_allclose(got32, want64, rtol=1e-5)
    # M500(1000 kpc) at z=0.888 is O(1e14) Msun — sanity anchor
    assert 1e13 < want64[2] < 1e15


def test_f32_mass_bisection_does_not_collapse(ref_data):
    """The TPU-path (float32) r_500 bisection end-to-end: before the
    mass_overdensity fold, M_delta = inf collapsed r_delta onto the
    first grid radius for every sample.  In f32 the bracket must close
    on a physical radius with a finite plausible M500."""
    from joxsz_tpu.postproc import compute_mass_profiles

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta0 = np.array([centre[n] for n in sess.params.thawed],
                      dtype=np.float32)
    rng = np.random.default_rng(3)
    flat = (theta0[None] * (1 + 0.01 * rng.standard_normal(
        (16, theta0.size)))).astype(np.float32)
    # the geometry grid is float64 numpy even in an f32 session, and
    # the bisection inherits its dtype — cast to f32 so the test runs
    # the arithmetic the TPU backend actually runs
    r_pp = np.asarray(sess.geometry.r_press_kpc, dtype=np.float32)
    _, r_delta, m_delta = compute_mass_profiles(
        sess.model, sess.cosmology, r_pp, flat, delta=500.0)
    assert r_delta[1, 0] > 5 * float(r_pp[0]), r_delta[1, 0]
    assert 200 < r_delta[1, 0] < 2500
    assert np.isfinite(m_delta).all()
    assert 1e13 < m_delta[1, 0] < 5e15
