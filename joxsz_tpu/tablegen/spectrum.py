"""Fallback thermal-plasma spectral model for count-rate table generation.

The reference obtains per-band count rates from XSPEC (phabs x apec family)
through mbproj2's helper, executed offline as a subprocess
(/root/reference/joxsz_funcs.py:652-681; SURVEY.md §2.3).  HEASOFT is not
available in this environment, so the framework ships:

  * this analytic emission model (free-free continuum with the exact
    non-relativistic Born Gaunt factor + a parametrised metal-line model),
  * Morrison & McCammon (1983) photoelectric absorption,
  * proper redshifting and folding through the real RMF/ARF,

and uses it to generate the same table *format* the runtime interpolates.
Anyone with HEASOFT can regenerate the table with real APEC emissivities via
``joxsz_tpu.tablegen.generate --xspec`` (subprocess driver) and the fit code
is unchanged — the table is a versioned artifact, not a code path.

Accuracy note: the continuum is exact free-free (within the Born Gaunt
approximation, few-% for cluster temperatures); the line model reproduces
the qualitative T- and Z-dependence of APEC (Fe-L bump at ~1 keV for
kT < 3 keV, Fe-K at 6.7 keV, alpha-element lines) but is not a line-list
calculation — absolute metallicity posteriors carry a corresponding model
systematic until the table is regenerated with XSPEC.

Units/conventions (matching the XSPEC 'norm' convention the X-ray model
uses, see ``geometry.annuli.xspec_norm_per_cm3``):
  photon flux density per unit norm at observed energy E:
      f(E) = 1e14 * lambda(E*(1+z); T, Z) / (1+z)      [ph/cm^2/s/keV]
  with lambda the photon emissivity per (n_e n_H) in ph cm^3 s^-1 keV^-1.
"""

from __future__ import annotations

import numpy as np
from scipy.special import k0

# --- free-free continuum ----------------------------------------------------

# Rybicki & Lightman eq. 5.14b prefactor, converted to photons/keV:
#   6.842e-38 [erg s^-1 cm^-3 Hz^-1] * 2.41799e17 [Hz/keV]
#     / 1.60218e-9 [erg/keV] / sqrt(1.16045e7 [K/keV])
_C_FF = 6.842e-38 * 2.41799e17 / 1.60218e-9 / np.sqrt(1.16045e7)
# sum of Z_i^2 n_i / n_H over H + He (He/H = 0.0977, Anders & Grevesse)
_ZSUM_HHE = 1.0 + 4.0 * 0.0977


def gaunt_ff(E_keV, T_keV):
    """Non-relativistic Born free-free Gaunt factor:
    g = (sqrt(3)/pi) e^(x) K0(x), x = E/(2kT).  Exact dipole result; good to
    a few % for cluster plasmas."""
    x = np.clip(E_keV / (2.0 * T_keV), 1e-8, 600.0)
    return np.sqrt(3.0) / np.pi * np.exp(x) * k0(x)


def ff_photon_emissivity(E_keV, T_keV, zsum: float = _ZSUM_HHE):
    """Free-free photon emissivity per (n_e n_H): ph cm^3 s^-1 keV^-1."""
    E = np.asarray(E_keV)
    T = np.asarray(T_keV)
    g = gaunt_ff(E, T)
    return _C_FF * zsum * g * np.exp(-np.clip(E / T, 0.0, 600.0)) / (
        E * np.sqrt(T))


# --- metal lines ------------------------------------------------------------

# Line complexes: (centroid keV, Gaussian width keV, amplitude
# [ph cm^3 s^-1 at solar Z before the T response], log10 T_keV of the
# ion-balance peak, left log-T width, right log-T width).  The response
# of each complex is an asymmetric Gaussian in log10 T (standing in for
# the CIE ion fraction x effective collision strength) times the
# excitation Boltzmann factor exp(-E0/kT).
#
# Calibration (tests/test_spectrum_anchors.py pins all of these):
#   * Fe-K (Fe XXV He-alpha + Fe XXVI Ly-alpha): amplitudes and
#     responses least-squares fitted so the solar-metallicity
#     equivalent width of the 6.7 keV complex reproduces the published
#     APEC/ionization-equilibrium curve (Rothenflug & Arnaud 1985;
#     standard cluster-spectroscopy values): EW ~ 2.0 keV at kT=2,
#     1.0 keV at 4, 0.55 at 8, 0.45 at 10, 0.30 at 15 — fit residual
#     0.6% rms over kT = 2..15.  The Fe XXVI component carries the
#     high-T tail the previous single-complex model lacked.
#   * Si/S He+H-like pairs: EW anchors (solar) 250/150 eV at kT=2 and
#     30/30 eV at kT=8 (exactly matched); Ar/Ca at the tens-of-eV
#     level (anchors +-40%).
#   * Fe-L complex (5 sub-complexes, Fe XVII..XXIV): total soft-band
#     line-to-continuum photon ratio in 0.5-2 keV = 2.5 at kT=1,
#     Z=1 solar (line-dominated cool-plasma regime).
#   * O VIII Ly-alpha: EW = 50 eV at kT=1; Mg XII: EW = 60 eV at kT=2.
_LINES = np.array([
    # E0      sigE    amp       lt0    sltL   sltR
    [0.654, 0.020, 8.206e-16, -0.55, 0.30, 0.40],   # O VIII Ly-a
    [0.729, 0.025, 2.675e-15, -0.28, 0.22, 0.25],   # Fe XVII 2p-3s
    [0.826, 0.030, 3.478e-15, -0.25, 0.22, 0.28],   # Fe XVII/XVIII 2p-3d
    [0.950, 0.045, 4.013e-15, -0.10, 0.25, 0.30],   # Fe XIX/XX + Ne IX
    [1.070, 0.050, 3.210e-15,  0.00, 0.25, 0.32],   # Ne X + Fe XXI
    [1.170, 0.060, 2.140e-15,  0.15, 0.25, 0.35],   # Fe XXII-XXIV L
    [1.472, 0.030, 1.340e-16,  0.08, 0.30, 0.40],   # Mg XII Ly-a
    [1.865, 0.030, 3.927e-16,  0.00, 0.30, 0.30],   # Si XIII He-a
    [2.006, 0.030, 9.786e-17,  0.26, 0.30, 0.40],   # Si XIV Ly-a
    [2.461, 0.035, 1.248e-16,  0.15, 0.30, 0.30],   # S XV He-a
    [2.623, 0.035, 3.156e-17,  0.45, 0.30, 0.40],   # S XVI Ly-a
    [3.140, 0.045, 3.000e-17,  0.30, 0.30, 0.35],   # Ar XVII He-a
    [3.323, 0.045, 1.200e-17,  0.57, 0.30, 0.45],   # Ar XVIII Ly-a
    [3.902, 0.050, 2.200e-17,  0.40, 0.30, 0.35],   # Ca XIX He-a
    [4.107, 0.050, 1.200e-17,  0.67, 0.30, 0.45],   # Ca XX Ly-a
    [6.685, 0.060, 5.164e-16,  0.10, 0.606, 0.361],  # Fe XXV He-a complex
    [6.966, 0.050, 6.952e-17,  0.90, 0.190, 0.342],  # Fe XXVI Ly-a
    [7.850, 0.090, 7.000e-17,  0.60, 0.50, 0.45],   # Fe K-beta + Ni K-a
])


def line_photon_emissivity(E_keV, T_keV, Z_solar):
    """Metal-line photon emissivity per (n_e n_H), linear in Z."""
    E = np.asarray(E_keV)[..., None]
    logT = np.log10(T_keV)
    E0, sE, amp = _LINES[:, 0], _LINES[:, 1], _LINES[:, 2]
    lt0, sltL, sltR = _LINES[:, 3], _LINES[:, 4], _LINES[:, 5]
    slt = np.where(logT < lt0, sltL, sltR)
    t_resp = np.exp(-0.5 * ((logT - lt0) / slt) ** 2)
    t_resp = t_resp * np.exp(-np.clip(E0 / np.maximum(T_keV, 1e-3), 0, 600))
    prof = np.exp(-0.5 * ((E - E0) / sE) ** 2) / (sE * np.sqrt(2 * np.pi))
    return Z_solar * (prof * (amp * t_resp)).sum(axis=-1)


def photon_emissivity(E_keV, T_keV, Z_solar):
    """Total photon emissivity lambda(E; T, Z) per (n_e n_H)."""
    return ff_photon_emissivity(E_keV, T_keV) + \
        line_photon_emissivity(E_keV, T_keV, Z_solar)


# --- photoelectric absorption (Morrison & McCammon 1983) --------------------

_MM83 = np.array([
    # Emin   Emax    c0      c1      c2   (sigma*E^3 = c0 + c1 E + c2 E^2,
    #                                      sigma in 1e-24 cm^2, E in keV)
    [0.030, 0.100, 17.3, 608.1, -2150.0],
    [0.100, 0.284, 34.6, 267.9, -476.1],
    [0.284, 0.400, 78.1, 18.8, 4.3],
    [0.400, 0.532, 71.4, 66.8, -51.4],
    [0.532, 0.707, 95.5, 145.8, -61.1],
    [0.707, 0.867, 308.9, -380.6, 294.0],
    [0.867, 1.303, 120.6, 169.3, -47.7],
    [1.303, 1.840, 141.3, 146.8, -31.5],
    [1.840, 2.471, 202.7, 104.7, -17.0],
    [2.471, 3.210, 342.7, 18.7, 0.0],
    [3.210, 4.038, 352.2, 18.7, 0.0],
    [4.038, 7.111, 433.9, -2.4, 0.75],
    [7.111, 8.331, 629.0, 30.9, 0.0],
    [8.331, 10.000, 701.2, 25.2, 0.0],
])


def mm83_sigma_1e24cm2(E_keV):
    """Effective photoelectric cross-section per H atom (units 1e-24 cm^2),
    solar abundances; constant extension below 0.03/above 10 keV."""
    E = np.clip(np.asarray(E_keV, dtype=float), 0.030, 10.0)
    idx = np.clip(np.searchsorted(_MM83[:, 1], E, side="left"), 0,
                  _MM83.shape[0] - 1)
    c0, c1, c2 = _MM83[idx, 2], _MM83[idx, 3], _MM83[idx, 4]
    return (c0 + c1 * E + c2 * E * E) / (E * E * E)


def phabs_transmission(E_keV, NH_1022pcm2):
    """exp(-NH sigma(E)); NH in 10^22 cm^-2."""
    # NH[1e22 cm^-2] * sigma[1e-24 cm^2] = NH * sigma_poly * 1e-2
    tau = NH_1022pcm2 * mm83_sigma_1e24cm2(E_keV) * 1e-2
    return np.exp(-tau)


# --- observed spectrum per unit XSPEC norm ---------------------------------


def observed_photon_flux(E_obs_keV, T_keV, Z_solar, z, NH_1022pcm2):
    """Absorbed, redshifted photon flux density per unit norm
    [ph/cm^2/s/keV] at observed energies."""
    E_emit = np.asarray(E_obs_keV) * (1.0 + z)
    lam = photon_emissivity(E_emit, T_keV, Z_solar)
    return 1e14 * lam / (1.0 + z) * phabs_transmission(E_obs_keV, NH_1022pcm2)


def bolometric_flux_per_norm(T_keV, Z_solar, z,
                             e_lo=0.01, e_hi=100.0, n=4000):
    """Unabsorbed bolometric energy flux per unit norm [erg/cm^2/s]
    (consumed by the cooling-time profile, reference joxsz_plots.py:243)."""
    import joxsz_tpu.constants as K

    E = np.geomspace(e_lo, e_hi, n)
    lam = photon_emissivity(E * (1.0 + z), T_keV, Z_solar) / (1.0 + z)
    integrand = 1e14 * lam * E * K.keV_erg
    return np.trapezoid(integrand, E)
