"""Plotting smoke tests: every figure function renders a valid PDF from
synthetic inputs (Agg backend, no display)."""

import numpy as np
import pytest

from joxsz_tpu.plotting import (
    traceplot, cornerplot, fit_on_data, radial_profiles, mass_plot,
    gas_fraction_plot,
)
from joxsz_tpu.postproc.profiles import ProfileSet


def _pdf_ok(path):
    data = path.read_bytes()
    return data.startswith(b"%PDF") and len(data) > 1000


def test_traceplot_and_corner(tmp_path):
    rng = np.random.default_rng(0)
    cube = rng.normal(size=(24, 60, 5))  # (nw, nsteps, ndim)
    names = ["a", "b", "c", "d", "e"]
    out = str(tmp_path) + "/"
    traceplot(cube, names, seed=0, plotdir=out)
    cornerplot(cube.reshape(-1, 5), names, plotdir=out)
    assert _pdf_ok(tmp_path / "traceplot.pdf")
    assert _pdf_ok(tmp_path / "cornerplot.pdf")


def test_profile_mass_gas_figures(tmp_path):
    rng = np.random.default_rng(1)
    r = np.geomspace(20, 3000, 100)
    out = str(tmp_path) + "/"

    def bands(mid, spread=0.1):
        return np.stack([mid * (1 - spread), mid, mid * (1 + spread)])

    profs = ProfileSet(
        r_kpc=r,
        density=bands(2e-2 * (r / 100.0) ** -1.2),
        temp_sz=bands(9.0 * np.exp(-r / 3000)),
        temp_x=bands(11.0 * np.exp(-r / 3000)),
        pressure=bands(0.2 * (r / 100.0) ** -2.0),
        entropy=bands(100 * (r / 100.0) ** 1.1),
        cooling_time=bands(1e10 * (r / 100.0) ** 1.5),
        gas_mass=bands(1e12 * (r / 100.0) ** 2),
    )
    radial_profiles(profs, tempx_differs=True, plotdir=out)
    assert _pdf_ok(tmp_path / "radial_profiles.pdf")

    from joxsz_tpu.cosmology import Cosmology

    cosmo = Cosmology(z=0.888, H0=67.32, WM=0.3158, WV=0.6842)
    mass = bands(3e14 * (r / 1000.0) ** 0.9)
    mass_plot(r, mass, cosmo, r_delta=np.array([750, 820, 900]),
              m_delta=np.array([3e14, 4e14, 5e14]), plotdir=out)
    assert _pdf_ok(tmp_path / "mass_hse.pdf")

    gas_fraction_plot(r, bands(0.12 * np.ones_like(r)), plotdir=out)
    assert _pdf_ok(tmp_path / "frac_gas.pdf")


def test_fit_on_data_figure(tmp_path, ref_data):
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    rng = np.random.default_rng(2)
    n_band = len(sess.bands)
    n_ann = sess.bands[0].counts.size
    cts = np.stack([b.counts for b in sess.bands])
    perc_x = np.stack([cts * 0.9, cts, cts * 1.1])
    prof = -2.0 * np.exp(-np.arange(86) / 20.0)
    perc_sz = np.stack([prof * 1.1, prof, prof * 0.9])
    out = str(tmp_path) + "/"
    from joxsz_tpu.plotting import fit_on_data

    fit_on_data(sess.bands, sess.annuli, sess.model.sz_data, perc_x,
                perc_sz, step_arcsec=2.0, plotdir=out)
    assert _pdf_ok(tmp_path / "fit_on_data.pdf")


def test_fit_on_data_single_probe_modes(tmp_path, ref_data):
    """r5 review: SZ-only fits (perc_x=None) must still produce the SZ
    data-vs-model panel, and X-ray-only calls (perc_sz=None /
    sz_data=None) must not crash on the missing SZ block."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.plotting import fit_on_data

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    prof = -2.0 * np.exp(-np.arange(86) / 20.0)
    perc_sz = np.stack([prof * 1.1, prof, prof * 0.9])
    cts = np.stack([b.counts for b in sess.bands])
    perc_x = np.stack([cts * 0.9, cts, cts * 1.1])

    # SZ-only
    d1 = tmp_path / "szonly"
    d1.mkdir()
    fit_on_data(None, None, sess.model.sz_data, None, perc_sz,
                step_arcsec=2.0, plotdir=str(d1))
    assert _pdf_ok(d1 / "fit_on_data.pdf")

    # X-ray-only
    d2 = tmp_path / "xonly"
    d2.mkdir()
    fit_on_data(sess.bands, sess.annuli, None, perc_x, None,
                step_arcsec=2.0, plotdir=str(d2))
    assert _pdf_ok(d2 / "fit_on_data.pdf")


def test_plotdir_without_trailing_slash(tmp_path):
    """r5 review: output paths go through os.path.join — a plotdir
    without a trailing slash must write INTO the directory, not mangle
    the filename into the parent."""
    rng = np.random.default_rng(0)
    flat = rng.standard_normal((400, 2))
    cube = rng.standard_normal((8, 50, 2))
    from joxsz_tpu.plotting import cornerplot, traceplot

    out = tmp_path / "plots"
    out.mkdir()
    traceplot(cube, ["a", "b"], plotdir=str(out))      # no trailing /
    cornerplot(flat, ["a", "b"], plotdir=str(out))
    assert _pdf_ok(out / "traceplot.pdf")
    assert _pdf_ok(out / "cornerplot.pdf")
    assert not (tmp_path / "plotstraceplot.pdf").exists()


def test_cornerplot_single_parameter(tmp_path):
    """r5 review: a 1-parameter chain must not crash on axes indexing
    (squeeze=False)."""
    from joxsz_tpu.plotting import cornerplot

    flat = np.random.default_rng(1).standard_normal((300, 1))
    cornerplot(flat, ["a"], plotdir=str(tmp_path))
    assert _pdf_ok(tmp_path / "cornerplot.pdf")
