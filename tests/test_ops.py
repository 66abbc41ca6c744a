"""Numerical tests of the fused operators: Abel quadrature, spline
matrices, and the SZ linear operator vs the explicit map-space pipeline."""

import numpy as np
import pytest
from scipy.interpolate import interp1d

from joxsz_tpu.ops.abel import forward_abel_matrix, forward_abel
from joxsz_tpu.ops.splines import interp_matrix, mirrored_interp_matrix, lerp_lookup


# --- Abel ---------------------------------------------------------------


def test_abel_gaussian_analytic():
    """Forward Abel of a Gaussian has a closed form:
    F(y) = sigma*sqrt(pi)*exp(-y^2/sigma^2) for f = exp(-r^2/sigma^2)."""
    sigma = 300.0
    r = np.arange(16.0, 5000.0, 16.0)
    f = np.exp(-(r / sigma) ** 2)
    expected = sigma * np.sqrt(np.pi) * np.exp(-(r / sigma) ** 2)
    sel = r < 3 * sigma

    # exact-linear scheme: error is purely the piecewise-linear
    # representation of the integrand (O(h^2 w''), ~1e-3 inner, ~1e-2 where
    # the profile falls ~30%/cell)
    F_exact = forward_abel(f, r, scheme="exact-linear")
    assert np.allclose(F_exact[r < sigma], expected[r < sigma], rtol=1.5e-3)
    assert np.allclose(F_exact[sel], expected[sel], rtol=1e-2)

    # pyabel scheme: carries the known near-singularity trapezoid bias
    # (positive, ~1e-3 inner growing to ~2% where the profile varies ~30%
    # per cell) — the same bias the reference pays
    F_py = forward_abel(f, r, scheme="pyabel")
    assert np.allclose(F_py[sel], expected[sel], rtol=3e-2)
    rel = (F_py[sel] - expected[sel]) / expected[sel]
    assert np.all(rel > 0) and rel[0] < 2e-3


def test_abel_convergence():
    """Halving the step should shrink the exact-linear scheme's error ~4x
    (O(h^2)); the pyabel scheme improves more slowly but monotonically."""
    sigma = 300.0

    def err(step, scheme):
        r = np.arange(step, 3000.0, step)
        f = np.exp(-(r / sigma) ** 2)
        F = forward_abel(f, r, scheme=scheme)
        exact = sigma * np.sqrt(np.pi) * np.exp(-(r / sigma) ** 2)
        sel = r < 2.0 * sigma
        return np.max(np.abs(F[sel] - exact[sel]) / exact[sel])

    assert err(8.0, "exact-linear") < err(16.0, "exact-linear") / 2.5
    assert err(8.0, "pyabel") < err(16.0, "pyabel")


def test_abel_pyabel_transcription_parity():
    """The matrix 'pyabel' scheme against the vendored numpy
    transcription of PyAbel's direct/Python forward path
    (tests/pyabel_direct_transcription.py) at <=1e-12 relative on the
    313-pt reference-style grid — including the second-to-last-row
    masked-triangle quirk — and on a non-uniform grid."""
    from pyabel_direct_transcription import pyabel_direct_forward

    for r in (np.arange(1, 314) * 16.00139123,
              np.geomspace(3.0, 5000.0, 200)):
        x = r / 300.0
        f = 0.4 / (x**0.014 * (1 + x**1.33) ** 3.08)
        ours = forward_abel_matrix(r, scheme="pyabel") @ f
        theirs = pyabel_direct_forward(f, r, correction=True)
        rel = np.abs(ours - theirs) / np.maximum(np.abs(theirs), 1e-300)
        assert rel[:-1].max() < 1e-12      # last row is exactly zero
        assert ours[-1] == theirs[-1] == 0.0


def test_abel_matrix_linear():
    r = np.arange(10.0, 1000.0, 10.0)
    A = forward_abel_matrix(r)
    rng = np.random.default_rng(0)
    f1, f2 = rng.random(r.size), rng.random(r.size)
    assert np.allclose(A @ (2 * f1 + 3 * f2), 2 * (A @ f1) + 3 * (A @ f2))
    # strictly upper-triangular support: F(y_j) only depends on f(r>=y_j)
    assert np.allclose(np.tril(A, -1), 0.0)
    assert np.allclose(A[-1], 0.0)


# --- spline matrices -----------------------------------------------------


def test_interp_matrix_matches_scipy():
    rng = np.random.default_rng(1)
    knots = np.sort(rng.uniform(0, 10, 25))
    vals = rng.normal(size=25)
    q = rng.uniform(-1, 11, 200)  # includes extrapolation region
    M = interp_matrix(knots, q, kind="cubic", fill_value="extrapolate",
                      assume_sorted=True)
    direct = interp1d(knots, vals, kind="cubic", fill_value="extrapolate",
                      bounds_error=False)(q)
    assert np.allclose(M @ vals, direct, atol=1e-12)


def test_interp_matrix_fill_values():
    knots = np.linspace(0, 1, 10)
    vals = np.sin(knots)
    q = np.array([-0.5, 0.5, 1.5])
    M = interp_matrix(knots, q, kind="cubic", fill_value=(0.0, 0.0))
    out = M @ vals
    assert out[0] == 0.0 and out[2] == 0.0
    assert np.isclose(out[1], interp1d(knots, vals, kind="cubic")(0.5))


def test_mirrored_interp_matrix_matches_reference_trick():
    """The mirrored matrix must equal scipy applied to the unsorted
    mirrored knot/value arrays exactly as the reference builds them
    (/root/reference/joxsz_funcs.py:460)."""
    rng = np.random.default_rng(2)
    r = np.linspace(1.0, 50.0, 40)
    v = rng.random(40)
    q = rng.uniform(0.0, 60.0, 300)
    M = mirrored_interp_matrix(r, q, kind="cubic", fill_value=(0.0, 0.0))
    ref = interp1d(np.append(-r, r), np.append(v, v), kind="cubic",
                   bounds_error=False, fill_value=(0.0, 0.0))(q)
    assert np.allclose(M @ v, ref, atol=1e-12)


def test_lerp_lookup_matches_scipy():
    import jax.numpy as jnp

    tx = np.array([1.0, 5.0, 7.0, 10.0, 20.0, 30.0, 50.0])
    ty = np.array([-11.6, -11.3, -11.1, -10.9, -10.5, -10.2, -9.9])
    q = np.array([0.5, 1.0, 6.0, 25.0, 50.0, 80.0])
    ours = np.asarray(lerp_lookup(jnp.array(tx), jnp.array(ty), jnp.array(q)))
    ref = interp1d(tx, ty, kind="linear", fill_value="extrapolate")(q)
    assert np.allclose(ours, ref, atol=1e-12)


# --- fused SZ operator ----------------------------------------------------


@pytest.fixture(scope="module")
def sz_setup(ref_data):
    from joxsz_tpu.cosmology import Cosmology
    from joxsz_tpu.geometry import build_beam, build_map_geometry, build_filter_image
    from joxsz_tpu.io.readers import read_xy, read_transfer_function

    cosmo = Cosmology(z=0.888, H0=67.32, WM=0.3158, WV=0.6842)
    flux = read_xy(str(ref_data / "SZ/press_data_cl1226_flagsource_Xraycent.dat"), 3)
    beam_2d, fwhm = build_beam(2.0, flux[0][-1],
                               filename=str(ref_data / "SZ/Beam150GHz.fits"))
    geom = build_map_geometry(2.0, flux[0][-1], fwhm, cosmo.kpc_per_arcsec, 5000.0)
    wn, tf = read_transfer_function(
        str(ref_data / "SZ/TransferFunction150GHz_CLJ1227.fits"))
    filt = build_filter_image(wn, tf, geom.side, 2.0)
    return geom, beam_2d, filt, flux


def test_sz_operator_matches_pipeline(sz_setup):
    from joxsz_tpu.ops.szkernel import sz_map_pipeline, build_sz_operator

    geom, beam_2d, filt, flux = sz_setup
    op = build_sz_operator(geom, beam_2d, filt, flux[0])
    assert op.L.shape == (86, 313)
    assert op.G.shape == (19, 86)

    # gNFW-like test pressure profile
    r = geom.r_press_kpc
    pp = 0.4 / ((r / 300.0) ** 0.014 * (1 + (r / 300.0) ** 1.33) ** ((4.13 - 0.014) / 1.33))
    direct = sz_map_pipeline(pp, geom, beam_2d, filt)
    fused = op.L @ pp
    assert np.allclose(fused, direct, rtol=1e-10, atol=1e-14)

    # resampling at the data radii matches a fresh scipy cubic interp
    from scipy.interpolate import interp1d
    g = interp1d(geom.radius_arcsec[geom.sep:], direct, kind="cubic",
                 fill_value="extrapolate")(flux[0])
    assert np.allclose(op.G @ fused, g, rtol=1e-10, atol=1e-14)


def test_sz_operator_magnitude(sz_setup):
    """Compton-y scale sanity: for a realistic pressure profile the raw
    central brightness (pre-conversion) should be ~1e-4 (dimensionless y)."""
    from joxsz_tpu.ops.szkernel import build_sz_operator

    geom, beam_2d, filt, flux = sz_setup
    op = build_sz_operator(geom, beam_2d, filt, flux[0])
    r = geom.r_press_kpc
    pp = 0.4 / ((r / 300.0) ** 0.014 * (1 + (r / 300.0) ** 1.33) ** 2.97)
    y_prof = op.L @ pp
    assert 1e-5 < y_prof[0] < 1e-3
    # beam+TF smoothing keeps the profile peaked at centre
    assert y_prof[0] == np.max(y_prof)


def test_interp_matrix_nonzero_fill_rejected_all_kinds():
    """r5 review: the generic (non-cubic) fallback silently built a
    wrong matrix for non-zero constant fills (identity push-through
    turns fill c into rows of c, so M @ v = c*sum(v)); it must raise
    like the cubic path does."""
    from joxsz_tpu.ops.splines import interp_matrix

    knots = np.linspace(0.0, 1.0, 8)
    q = np.array([-0.5, 0.5, 1.5])
    for kind in ("linear", "cubic"):
        with pytest.raises(NotImplementedError, match="constant fills"):
            interp_matrix(knots, q, kind=kind, fill_value=(7.0, 7.0))
    # zero fill and extrapolation stay supported
    M = interp_matrix(knots, q, kind="linear", fill_value=0.0)
    v = np.linspace(2.0, 3.0, 8)
    assert M.shape == (3, 8)
    assert M[0] @ v == 0.0 and M[2] @ v == 0.0
