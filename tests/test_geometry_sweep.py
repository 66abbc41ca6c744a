"""Geometry-generalization parity sweep (VERDICT r3 task 3).

Every other test orbits the bundled CL J1226 shapes.  This sweep builds
complete synthetic instrument configurations (tests/synthdata.py) at
randomized map sides (incl. odd), annulus counts, band counts, table nT,
pressure-grid lengths and knot counts, and pushes each through

    build_session -> XLA log_like vs the independent numpy replica
    (tests/replica.py) -> the fused Pallas kernel in interpret mode,

asserting value parity and veto agreement at every stage.  The packed
X-ray lane layout (ops/pallas_joint.py XRAY_FUSE) computes SPG/NG/NSK
from nT and n_sh — this sweep is what pins that math away from the
bundled nT=64 / 15-annuli point.

Fast suite: 6 hand-picked corner configurations.  Slow marker: a
20-configuration randomized sweep.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core

from replica import sz_loglike_numpy, xray_cash_numpy, xray_pred_numpy
from synthdata import make_synthetic_config


def _check_config(tmp_path, rng, kernel=True, replica=True, **dims):
    """Build + XLA-vs-numpy + kernel-interpret parity for one config."""
    cfg = make_synthetic_config(tmp_path, rng, **dims)
    cfg.dtype = "float64"
    sess = build_session(cfg, use_cache=False,
                         sz_only=dims.get("sz_only", False))
    theta0 = np.asarray(sess.params.thawed_values())
    ll_fn = jax.jit(jax.vmap(sess.log_like))

    # a small cloud of strictly-inside-the-box points
    batch = theta0[None] * (1 + 0.02 * rng.standard_normal(
        (6, theta0.size)))
    lo, hi = np.asarray(sess.params.lo), np.asarray(sess.params.hi)
    span = np.where(np.isfinite(hi - lo), hi - lo, 1.0)
    batch = np.clip(batch,
                    np.where(np.isfinite(lo), lo + 1e-6 * span, -np.inf),
                    np.where(np.isfinite(hi), hi - 1e-6 * span, np.inf))
    ll = np.asarray(ll_fn(jnp.asarray(batch)))
    assert np.isfinite(ll[0]) or np.isfinite(ll).any(), \
        f"no finite log-like in the sweep cloud for dims {dims}"

    if replica and cfg.pressure_model == "gnfw" and not dims.get("sz_only"):
        from joxsz_tpu.models.sz import sz_log_like
        from joxsz_tpu.models.xray import xray_log_like

        pars_j = sess.params.unpack(jnp.asarray(theta0))
        got_sz = float(sz_log_like(pars_j, sess.model.sz_data,
                                   sess.model.pressure,
                                   sess.model.temperature))
        want_sz = sz_loglike_numpy(sess, theta0)
        assert np.isclose(got_sz, want_sz, rtol=1e-8), (got_sz, want_sz)

        got_pred = np.asarray(sess.model.xray_profiles(jnp.asarray(theta0)))
        want_pred = xray_pred_numpy(sess, theta0)
        assert np.allclose(got_pred, want_pred, rtol=1e-8)
        got_cash = float(xray_log_like(pars_j, sess.model.xray_data,
                                       sess.model.density,
                                       sess.model.temperature))
        assert np.isclose(got_cash, xray_cash_numpy(sess, theta0),
                          rtol=1e-8)

    if not kernel:
        return sess

    # fused kernel, interpret mode, f32 session over the SAME dataset
    from joxsz_tpu.config import JoXSZConfig

    cfg32 = JoXSZConfig.from_json(cfg.to_json())
    cfg32.dtype = "float32"
    sess32 = build_session(cfg32, use_cache=False,
                           sz_only=dims.get("sz_only", False))
    core = make_joint_core(sess32, block_b=8, interpret=True)
    assert core is not None, \
        f"fused kernel DECLINED a flagship-family config at dims {dims}"
    b32 = jnp.asarray(batch, jnp.float32)
    a = np.asarray(core(b32))
    b = np.asarray(jax.jit(jax.vmap(sess32.log_like))(b32))
    finite = np.isfinite(b)
    assert np.array_equal(np.isfinite(a), finite), \
        f"kernel/XLA veto mismatch at dims {dims}: {a} vs {b}"
    if finite.any():
        assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), \
            f"kernel/XLA value mismatch at dims {dims}: " \
            f"{np.max(np.abs(a[finite] - b[finite]))}"
    return sess


# --- fast corners: one axis stressed per case ---------------------------

def test_sweep_small_nT32(tmp_path):
    """nT=32 -> SPG=4 packed shells/group; few annuli; odd-ish side."""
    _check_config(tmp_path, np.random.default_rng(1), nT=32, n_ann=8,
                  n_bands=3, step_arcsec=6.0, flux_rmax_arcsec=200.0,
                  extent_kpc=1800.0, redshift=0.35)


def test_sweep_nT96_many_annuli(tmp_path):
    """nT=96 -> SPG=1 with 32 dead lanes/group; 24 annuli; 12 bands."""
    _check_config(tmp_path, np.random.default_rng(2), nT=96, n_ann=24,
                  n_bands=12, step_arcsec=3.0, flux_rmax_arcsec=250.0,
                  extent_kpc=2200.0, redshift=0.8)


@pytest.mark.slow
def test_sweep_large_map_long_pressure_grid(tmp_path):
    """Big map side + pressure grid well past the bundled 313 points."""
    _check_config(tmp_path, np.random.default_rng(3), step_arcsec=2.5,
                  flux_rmax_arcsec=420.0, fwhm_arcsec=22.0,
                  extent_kpc=4200.0, n_ann=15, n_bands=6, nT=64,
                  redshift=1.1)


def test_sweep_knots_pressure(tmp_path):
    """Knot pressure at a non-bundled knot count and geometry."""
    _check_config(tmp_path, np.random.default_rng(4), nT=32, n_ann=10,
                  n_bands=4, step_arcsec=5.0, extent_kpc=2000.0,
                  redshift=0.25, pressure_model="knots",
                  n_pressure_knots=5, replica=False)


@pytest.mark.slow
def test_sweep_double_density(tmp_path):
    _check_config(tmp_path, np.random.default_rng(5), nT=64, n_ann=9,
                  n_bands=5, step_arcsec=4.5, extent_kpc=2600.0,
                  redshift=0.6, density_mode="double", replica=False)


def test_sweep_sz_only(tmp_path):
    _check_config(tmp_path, np.random.default_rng(6), sz_only=True,
                  step_arcsec=3.5, flux_rmax_arcsec=350.0,
                  extent_kpc=3000.0, redshift=0.45, replica=False)


@pytest.mark.parametrize("ceil", [2.05, 2.104, 1.5, 0.8, 2.2, 2.8])
def test_reference_params_compact_ceiling_keeps_rc_le_rs(ceil):
    """Regression (r4 self-review #1): the compact-instrument bound
    tightening (edges_logkpc[-2] as the r_c/r_s ceiling) nudged the two
    defaults into the box INDEPENDENTLY, which inverted the pair for
    ceil in (2.0, 2.105] (r_c kept its 2.0 default, r_s dropped to
    0.95*ceil < 2.0) — the Vikhlinin shape prior r_c <= r_s
    (models/density.py::log_prior) then vetoed the init to -inf and the
    fit could never start.  The ordering must survive any ceiling."""
    from joxsz_tpu.models.density import VikhlininDensity
    from joxsz_tpu.models.joint import build_reference_params
    from joxsz_tpu.models.pressure import GNFWPressure
    from joxsz_tpu.models.temperature import UPPTemperature

    edges = np.array([0.5, ceil, ceil + 0.2])
    pressure, density = GNFWPressure(), VikhlininDensity()
    pars = build_reference_params(
        pressure, density, UPPTemperature(pressure, density),
        edges_logkpc=edges)
    rc, rs = pars["log(r_c)"], pars["log(r_s)"]
    assert rc.val <= rs.val, (rc.val, rs.val)
    for p in (rc, rs):
        assert p.minval <= p.val < p.maxval, (p.val, p.minval, p.maxval)
    # the init must be finite under the full prior (box + shape veto)
    theta = jnp.asarray(np.asarray(pars.thawed_values()))
    assert np.isfinite(float(pars.log_prior(theta)))
    assert np.isfinite(float(VikhlininDensity().log_prior(pars.unpack(theta))))


def test_extent_too_small_fails_loudly(tmp_path):
    """cluster_extent_kpc below the map half-axis must raise the clear
    config error, not a broadcast failure deep in the SZ chain."""
    rng = np.random.default_rng(7)
    cfg = make_synthetic_config(tmp_path, rng, step_arcsec=3.0,
                                flux_rmax_arcsec=250.0, redshift=0.8,
                                n_ann=8, n_bands=3, nT=32)
    cfg.cluster_extent_kpc = 500.0          # far too compact
    cfg.dtype = "float64"
    with pytest.raises(ValueError, match="cluster_extent_kpc"):
        build_session(cfg, use_cache=False)


# --- slow: randomized 20-configuration sweep ----------------------------

@pytest.mark.slow
@pytest.mark.parametrize("seed", range(100, 120))
def test_sweep_randomized(tmp_path, seed):
    rng = np.random.default_rng(seed)
    dims = dict(
        step_arcsec=float(rng.uniform(2.0, 8.0)),
        flux_rmax_arcsec=float(rng.uniform(150.0, 450.0)),
        n_flux=int(rng.integers(20, 80)),
        fwhm_arcsec=float(rng.uniform(8.0, 25.0)),
        extent_kpc=float(rng.uniform(1500.0, 4500.0)),
        n_ann=int(rng.integers(8, 25)),
        n_bands=int(rng.integers(3, 13)),
        nT=int(rng.choice([32, 64, 96])),
        redshift=float(rng.uniform(0.2, 1.2)),
        NH_1022=float(rng.uniform(0.005, 0.1)),
    )
    if rng.random() < 0.25:
        dims.update(pressure_model="knots",
                    n_pressure_knots=int(rng.integers(3, 10)),
                    replica=False)
    _check_config(tmp_path, rng, **dims)
