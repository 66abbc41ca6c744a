"""IO + geometry tests against the bundled CL J1226.9+3332 data products.

Expected shapes/values are pinned from SURVEY.md §2.5 (independent
inspection of the reference data): beam valid out to 62.36", FWHM ~= 18.56",
map grid 171x171 @2" (sep=85), beam kernel 55x55, pressure grid 313 pts,
kpc/arcsec ~= 8.001, 16 annulus edges spanning 0-7.667'.
"""

import numpy as np
import pytest

from joxsz_tpu.cosmology import Cosmology
from joxsz_tpu.io.readers import (
    read_xy, read_beam_profile, read_transfer_function,
    read_conversion_table, load_band, annuli_edges_arcmin,
)
from joxsz_tpu.geometry import (
    build_beam, build_map_geometry, build_filter_image, Annuli,
    centered_distance_matrix, radial_freq_matrix,
)


@pytest.fixture(scope="module")
def cosmo():
    return Cosmology(z=0.888, H0=67.32, WM=0.3158, WV=0.6842)


def test_cosmology_scale(cosmo):
    # SURVEY.md §2.5: kpc/arcsec ~= 8.001 for the bundled config
    assert abs(cosmo.kpc_per_arcsec - 8.001) < 0.01
    # D_L consistency: D_L = D_A (1+z)^2
    assert np.isclose(cosmo.D_L, cosmo.D_A * 1.888**2)


def test_read_flux_data(ref_data):
    flux = read_xy(str(ref_data / "SZ/press_data_cl1226_flagsource_Xraycent.dat"), 3)
    assert flux.shape == (3, 19)
    assert np.isclose(flux[0][0], 3.136)
    assert np.isclose(flux[0][-1], 116.1, atol=0.05)
    assert np.all(flux[1][:5] < 0)  # SZ decrement in the inner region


def test_read_beam_fits(ref_data):
    r, b = read_beam_profile(str(ref_data / "SZ/Beam150GHz.fits"))
    assert r.size == b.size
    assert r[0] > 2.0 and r[-1] < 63.0
    assert np.all(np.isfinite(b)) and np.all(b >= 0)


def test_build_beam(ref_data):
    beam_2d, fwhm = build_beam(
        2.0, 116.1, filename=str(ref_data / "SZ/Beam150GHz.fits"))
    assert abs(fwhm - 18.56) < 0.05
    assert beam_2d.shape == (55, 55)
    # normalisation: sum * step^2 == 1
    assert np.isclose(beam_2d.sum() * 4.0, 1.0)


def test_transfer_function(ref_data):
    wn, tf = read_transfer_function(
        str(ref_data / "SZ/TransferFunction150GHz_CLJ1227.fits"))
    assert wn.size == 76
    assert wn[0] == 0.0 and wn[-1] < 0.5
    filt = build_filter_image(wn, tf, 171, 2.0)
    assert filt.shape == (171, 171)
    # zero-frequency bin carries the k=0 transmission
    assert np.isclose(filt[0, 0], tf[0])
    assert np.all(np.isfinite(filt))


def test_conversion_table(ref_data):
    t, conv = read_conversion_table(str(ref_data / "SZ/Compton_to_Jy_per_beam.dat"))
    assert t.size == 6
    assert np.all(conv < 0)  # decrement at 150 GHz
    assert np.isclose(conv[0], -11.63e3)


def test_map_geometry(ref_data, cosmo):
    beam_2d, fwhm = build_beam(
        2.0, 116.1, filename=str(ref_data / "SZ/Beam150GHz.fits"))
    geom = build_map_geometry(2.0, 116.1, fwhm, cosmo.kpc_per_arcsec, 5000.0)
    assert geom.side == 171 and geom.sep == 85
    assert geom.r_press_kpc.size == 313
    assert geom.dist_kpc.shape == (171, 171)
    assert np.isclose(geom.r_press_kpc[0], 2.0 * cosmo.kpc_per_arcsec)
    # reference grid semantics: arange(step, R_b + step, step) — the last
    # point may exceed R_b by less than one step (joxsz_main.py:104)
    step_kpc = 2.0 * cosmo.kpc_per_arcsec
    assert 5000.0 <= geom.r_press_kpc[-1] < 5000.0 + step_kpc


def test_distance_matrix_props():
    r = np.array([-4.0, -2.0, 0.0, 2.0, 4.0])
    d = centered_distance_matrix(r)
    assert d[2, 2] == 0.0
    assert np.allclose(d, d.T)
    assert np.isclose(d[0, 0], np.hypot(4, 4))


def test_radial_freq_matrix():
    m = radial_freq_matrix(8)
    assert m[0, 0] == 0.0           # DC bin at origin after roll
    assert np.isclose(m.max(), np.hypot(4, 4))
    # conjugate-symmetric layout: m[1] == m[-1]
    assert np.isclose(m[1, 0], m[-1, 0])


def test_bands_and_annuli(ref_data, cosmo):
    fg = str(ref_data / "X/fg_profnew_%04i_%04i.dat")
    bg = str(ref_data / "X/bg_profnew_%04i_%04i.dat")
    band = load_band(fg, bg, (700, 1000))
    assert band.counts.size == 15
    assert band.emin_keV == 0.7 and band.emax_keV == 1.0
    # areascales = pixelised area / geometric area ~ O(1)
    assert np.all((band.areascales > 0.3) & (band.areascales < 1.5))

    edges = annuli_edges_arcmin(fg, (700, 1000))
    assert edges.size == 16
    assert edges[0] == 0.0
    ann = Annuli(edges_arcmin=edges, cosmology=cosmo)
    assert ann.nshells == 15
    assert ann.midpt_kpc.size == 15
    V = ann.vols_cm3
    assert V.shape == (15, 15)
    # projection matrix is upper-triangular: inner shells cannot appear in
    # outer annuli
    assert np.allclose(np.tril(V, -1), 0.0)
    # total volume of each shell is recovered by summing its column
    edges_cm = ann.edges_cm
    shell_vols = 4.0 / 3.0 * np.pi * (edges_cm[1:] ** 3 - edges_cm[:-1] ** 3)
    assert np.allclose(V.sum(axis=0), shell_vols, rtol=1e-10)


def test_annuli_outer_edge(ref_data, cosmo):
    # SURVEY.md §2.5: edges 0-7.667', outer ~= 3681 kpc
    fg = str(ref_data / "X/fg_profnew_%04i_%04i.dat")
    edges = annuli_edges_arcmin(fg, (700, 1000))
    ann = Annuli(edges_arcmin=edges, cosmology=cosmo)
    assert abs(edges[-1] - 7.667) < 0.01
    assert abs(ann.edges_kpc[-1] - 3681) < 10


def test_read_transfer_function_requires_file():
    """r5 review: tf_file=None crashed with AttributeError inside
    read_xy; the error must name the config field and explain why the
    file is needed even with tf_approx."""
    with pytest.raises(ValueError, match="tf_file"):
        read_transfer_function(None, approx=True)


def test_load_band_validates_full_bg_grid(tmp_path):
    """r5 review: only the LAST fg/bg radius was compared, so a bg file
    with different interior binning silently assigned wrong background
    rates, and a short bg file raised a raw IndexError."""
    fg = np.column_stack([np.arange(1, 6, dtype=float),
                          np.full(5, 0.5), np.arange(5, dtype=float),
                          np.ones(5), np.ones(5)])
    np.savetxt(tmp_path / "fg_700_1000.txt", fg)

    bad = fg.copy()
    bad[2, 0] += 0.5                 # interior radius misaligned
    np.savetxt(tmp_path / "bg_700_1000.txt", bad)
    with pytest.raises(ValueError, match="annulus 2"):
        load_band(str(tmp_path / "fg_%d_%d.txt"),
                  str(tmp_path / "bg_%d_%d.txt"), (700, 1000))

    np.savetxt(tmp_path / "bg_700_1000.txt", fg[:3])   # short bg
    with pytest.raises(ValueError, match="3 annuli"):
        load_band(str(tmp_path / "fg_%d_%d.txt"),
                  str(tmp_path / "bg_%d_%d.txt"), (700, 1000))

    np.savetxt(tmp_path / "bg_700_1000.txt", fg)       # aligned passes
    band = load_band(str(tmp_path / "fg_%d_%d.txt"),
                     str(tmp_path / "bg_%d_%d.txt"), (700, 1000))
    # edges from the loaded band match the file-based helper
    np.testing.assert_allclose(
        band.edges_arcmin,
        annuli_edges_arcmin(str(tmp_path / "fg_%d_%d.txt"), (700, 1000)))
