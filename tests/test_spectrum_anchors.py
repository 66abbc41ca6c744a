"""Quantitative anchors for the fallback thermal-plasma spectral model
(tablegen/spectrum.py) against independently published values, so the
X-ray spectral systematic is BOUNDED, not just asserted (PARITY.md
deviation #1).

Anchors:
  * total free-free cooling against the standard bremsstrahlung rate
    P = 1.426e-27 sqrt(T_K) <g_B> sum(Z_i^2 n_i) n_e  erg cm^-3 s^-1
    (Rybicki & Lightman eq. 5.15b) with the published frequency-averaged
    Gaunt factor <g_B> ~ 1.1-1.45 ("1.2 is accurate to within 20%");
  * the Born Gaunt-factor formula's low-frequency log behavior;
  * solar-metallicity Fe-K equivalent widths against the published
    APEC/CIE curve (Rothenflug & Arnaud 1985 and standard
    cluster-spectroscopy values);
  * line-to-continuum leverage in the CL J1226 observing configuration
    (the number that converts line-model error into count-rate error).
"""

import numpy as np

from joxsz_tpu.tablegen import spectrum as sp

KEV_ERG = 1.6021766e-9
K_PER_KEV = 1.16045e7


def _fek_ew_keV(T_keV, lo=6.2, hi=7.3):
    """EW of the Fe-K alpha complex (Fe XXV + XXVI; K-beta excluded) in
    keV at solar metallicity."""
    E = np.linspace(lo, hi, 3000)
    line = sp.line_photon_emissivity(E, T_keV, 1.0)
    return np.trapezoid(line / sp.ff_photon_emissivity(6.7, T_keV), E)


def test_freefree_total_power_anchor():
    """Integrated free-free energy emission per (n_e n_H) must match the
    published total bremsstrahlung formula within the Gaunt-factor
    uncertainty band."""
    for T_keV in (2.0, 5.0, 8.6, 15.0):   # kT=8.6 ~ T=1e8 K
        E = np.geomspace(1e-4 * T_keV, 50.0 * T_keV, 200_000)
        got = np.trapezoid(
            sp.ff_photon_emissivity(E, T_keV) * E * KEV_ERG, E)
        # R&L 5.15b with <g_B> = 1.2, charge sum folded like _ZSUM_HHE
        T_K = T_keV * K_PER_KEV
        expected = 1.426e-27 * np.sqrt(T_K) * 1.2 * sp._ZSUM_HHE
        assert abs(got / expected - 1.0) < 0.20, (T_keV, got, expected)


def test_gaunt_factor_low_frequency():
    """Born Gaunt factor at E << kT approaches (sqrt3/pi)(ln(2kT/E) -
    gamma_E + ln 2) — the published low-frequency logarithm; and stays
    within the 1.0-1.6 band over the X-ray range of cluster plasmas."""
    g = sp.gaunt_ff(0.01, 10.0)
    x = 0.01 / 20.0
    expected = np.sqrt(3.0) / np.pi * (np.log(2.0 / x) - 0.5772156649)
    assert abs(g / expected - 1.0) < 0.01
    for T in (3.0, 8.0, 15.0):
        E = np.linspace(0.5, min(7.0, 2.5 * T), 50)
        gv = sp.gaunt_ff(E, T)
        assert np.all((gv > 0.55) & (gv < 2.5))


def test_fek_equivalent_width_anchor():
    """Solar-Z Fe-K EW vs the published CIE curve; the calibration fit
    residual is <2%, the anchor values themselves carry ~25%
    literature spread — assert 25%."""
    anchors = {2.0: 2.00, 3.0: 1.40, 4.0: 1.00, 6.0: 0.70,
               8.0: 0.55, 10.0: 0.45, 12.0: 0.38, 15.0: 0.30}
    for T, ew_ref in anchors.items():
        ew = _fek_ew_keV(T)
        assert abs(ew / ew_ref - 1.0) < 0.25, (T, ew, ew_ref)


def test_soft_band_line_dominance():
    """Cool-plasma regime: at kT=1 and solar Z the 0.5-2 keV photon
    output is line-dominated (published line-to-continuum ~2-4)."""
    E = np.linspace(0.5, 2.0, 4000)
    ratio = (np.trapezoid(sp.line_photon_emissivity(E, 1.0, 1.0), E)
             / np.trapezoid(sp.ff_photon_emissivity(E, 1.0), E))
    assert 1.8 < ratio < 4.0, ratio


def test_line_leverage_cl1226_regime():
    """Bound the count-rate systematic for the shipped configuration:
    at kT = 10 keV, Z = 0.3 (the CL J1226 regime), lines contribute a
    small fraction of the 0.7-7 keV observed-band photon flux at
    z = 0.888, so a D% line-model error moves absolute rates by
    < 0.12 * D%.  The measured fraction is recorded in PARITY.md."""
    z = 0.888
    E_obs = np.linspace(0.7, 7.0, 6000)
    E_emit = E_obs * (1.0 + z)
    line = sp.line_photon_emissivity(E_emit, 10.0, 0.3)
    cont = sp.ff_photon_emissivity(E_emit, 10.0)
    frac = np.trapezoid(line, E_obs) / np.trapezoid(line + cont, E_obs)
    assert frac < 0.12, frac
    # and the Fe-K band (observed 3.4-3.8 keV) really is where the Z
    # information lives: line fraction there is much higher
    sel = (E_obs > 3.4) & (E_obs < 3.8)
    frac_fek = (np.trapezoid(line[sel], E_obs[sel])
                / np.trapezoid((line + cont)[sel], E_obs[sel]))
    assert frac_fek > 2.5 * frac


def test_python_native_line_model_parity():
    """The C++ core's spectrum must track spectrum.py exactly (the two
    line tables are maintained in sync by hand)."""
    from joxsz_tpu.tablegen.generate import build_native, _load_native
    import ctypes

    if not build_native():
        import pytest
        pytest.skip("no native toolchain")
    lib = _load_native()
    E = np.linspace(0.3, 9.0, 2000)
    out = np.zeros_like(E)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    for T, Z in [(1.0, 1.0), (4.0, 0.3), (10.0, 0.3), (15.0, 1.0)]:
        lib.jx_observed_spectrum(p(E), E.size, float(T), float(Z),
                                 0.888, 0.0183, p(out))
        ref = sp.observed_photon_flux(E, T, Z, 0.888, 0.0183)
        np.testing.assert_allclose(out, ref, rtol=5e-7, atol=1e-30)
