"""Posterior post-processing: thermodynamic / mass / gas-fraction profiles.

Replaces the reference's plot-support machinery
(/root/reference/joxsz_plots.py:104-132, 194-273, 316-399, 451-478), which
re-runs the full forward model sequentially for every one of the 30,000
posterior samples (SURVEY.md §2.6.6 — hours of CPU).  Here every profile is
a vmapped batch over the chain: one device call per quantity.

Quantities (reference parity):
  density ne(r), T_SZ = P/ne, T_X = T_SZ 10^ratio, pressure P(r),
  entropy K = T/ne^(2/3), cooling time, cumulative gas mass (with the
  inner/outer half-shell split), hydrostatic mass M(<r), overdensity
  radius/mass r_Delta/M_Delta (vectorised bisection instead of
  scipy.optimize.newton), gas fraction M_gas/M_HSE.

All CGS conversions are folded into O(1)-range scalars so the same code
runs in float32 on TPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as K
from ..cosmology import Cosmology
from ..models.mass import mass_overdensity


def equal_tailed(data: np.ndarray, ci: float = 95.0) -> np.ndarray:
    """(3, ...) array of [lower, median, upper] over axis 0 — the
    reference's get_equal_tailed (joxsz_plots.py:93-102)."""
    lo, med, up = np.percentile(
        np.asarray(data), [50 - ci / 2, 50.0, 50 + ci / 2], axis=0)
    return np.array([np.atleast_1d(lo), np.atleast_1d(med),
                     np.atleast_1d(up)])


# gas-mass conversion: M[Msun] = ne[cm^-3] * V[kpc^3] * C_GAS
_C_GAS = K.kpc_cm**3 * K.mu_e * K.mu_g / K.solar_mass_g


def _gas_shell_edges_kpc(r_kpc: jnp.ndarray) -> jnp.ndarray:
    """Shell edges r_0/2, r_i + r_0/2 (reference cum_gas_mass,
    joxsz_plots.py:215)."""
    return jnp.concatenate([r_kpc[:1] / 2.0, r_kpc + r_kpc[0] / 2.0])


def _frac_inner(edges: jnp.ndarray) -> jnp.ndarray:
    """Fraction of a shell's mass inside its midpoint radius (reference
    frac_int, joxsz_plots.py:194-206)."""
    lo, hi = edges[:-1], edges[1:]
    v_in = (lo + hi) ** 3 / 24.0 - lo**3 / 3.0
    v_out = hi**3 / 3.0 - (lo + hi) ** 3 / 24.0
    return v_in / (v_in + v_out)


def cumulative_gas_mass(ne: jnp.ndarray, r_kpc: jnp.ndarray) -> jnp.ndarray:
    """Cumulative gas mass (Msun) at each radius from the density profile."""
    e = _gas_shell_edges_kpc(r_kpc)
    shell_m = ne * (e[1:] ** 3 - e[:-1] ** 3) * (4.0 / 3.0 * jnp.pi * _C_GAS)
    csum = jnp.concatenate([jnp.zeros_like(shell_m[:1]),
                            jnp.cumsum(shell_m)[:-1]])
    return shell_m * _frac_inner(e) + csum


@dataclasses.dataclass
class ProfileSet:
    """Equal-tailed (3, n_r) bands of each thermodynamic quantity."""

    r_kpc: np.ndarray
    density: np.ndarray
    temp_sz: np.ndarray
    temp_x: np.ndarray
    pressure: np.ndarray
    entropy: np.ndarray
    cooling_time: np.ndarray
    gas_mass: np.ndarray
    # f_gas = M_gas/M_HSE band, computed inside the SAME vmapped pass as
    # the thermo profiles (one extra mass evaluation per sample) so the
    # figure path doesn't pay a third full-chain device pass + compile
    # (compute_gas_fraction remains as the standalone API)
    gas_fraction: np.ndarray | None = None


def make_profile_fns(model, cosmo: Cosmology, r_kpc,
                     Z_name: str = "Z"):
    """Build jitted per-sample profile functions bound to a JointModel."""
    r = jnp.asarray(r_kpc)
    zf2 = (1.0 + cosmo.z) ** 2
    # luminosity per cm^3 = bolo_rate(T,Z) * ne^2 * 1e-14 (1+z)^2 / ne_nH
    # (uses D_L = D_A (1+z)^2 to cancel the distance factors in the
    # XSPEC-norm prefactor — float32-safe)
    lum_scale = 1e-14 * zf2 / K.ne_nH

    table = model.xray_data.table if model.xray_data is not None else None

    def thermo(theta):
        pars = model.params.unpack(theta)
        ne = model.density(pars, r)
        press = model.pressure(pars, r)
        # route T_SZ/T_X through the temperature component, so
        # alternative models (parametric Vikhlinin T) post-process
        # correctly too
        t_sz = model.temperature.t_sz(pars, r)
        t_x = model.temperature.t_x(pars, r)
        entropy = t_sz / ne ** (2.0 / 3.0)
        mgas = cumulative_gas_mass(ne, r)
        if table is not None:
            # line_scale scales the Z-linear (metal-line) component of the
            # flux table too, keeping cooling times consistent with the
            # count-rate nuisance (models/xray.py::predicted_counts)
            Z = (pars[Z_name] * pars.get("line_scale", 1.0)
                 * jnp.ones_like(t_sz))
            tl = jnp.log(t_sz)
            from ..ops.splines import lerp_lookup
            f0 = jnp.exp(lerp_lookup(table.Tlog, table.logflux_Z0, tl))
            f1 = jnp.exp(lerp_lookup(table.Tlog, table.logflux_Z1, tl))
            lum = (f0 * (1 - Z) + f1 * Z) * ne * ne * lum_scale
            # t_cool = (5/2) ne (1 + 1/ne_nH) T keV_erg / lum / yr_s
            tcool = (2.5 * ne * (1.0 + 1.0 / K.ne_nH) * t_sz
                     * (K.keV_erg / K.yr_s) / lum)
        else:
            tcool = jnp.full_like(t_sz, jnp.nan)
        fgas = mgas / model.mass(pars, r)
        return ne, t_sz, t_x, press, entropy, tcool, mgas, fgas

    def hse_mass(theta):
        pars = model.params.unpack(theta)
        return model.mass(pars, r)

    return jax.jit(jax.vmap(thermo)), jax.jit(jax.vmap(hse_mass))


# cap on posterior samples used for profile BANDS: the per-sample profile
# matrices ((N, n_radii) x 7 quantities) cross device->host; beyond ~1e5
# samples the percentile bands are converged to far below line width while
# the transfer cost keeps growing linearly (the reference itself uses its
# full 30k samples, joxsz_plots.py:117).  Deterministic stride keeps
# walker/time coverage uniform.
_MAX_BAND_SAMPLES = 131072


def _band_subsample(flat_chain: np.ndarray,
                    max_samples: int | None) -> np.ndarray:
    if max_samples and len(flat_chain) > max_samples:
        stride = -(-len(flat_chain) // max_samples)
        return flat_chain[::stride]
    return flat_chain


def compute_profiles(model, cosmo: Cosmology, r_kpc, flat_chain: np.ndarray,
                     ci: float = 95.0, batch: int = 4096,
                     max_samples: int | None = _MAX_BAND_SAMPLES
                     ) -> ProfileSet:
    """Equal-tailed bands of all thermodynamic profiles over the chain."""
    flat_chain = _band_subsample(flat_chain, max_samples)
    thermo_fn, _ = make_profile_fns(model, cosmo, r_kpc)
    outs = [[] for _ in range(8)]
    for i in range(0, len(flat_chain), batch):
        chunk = jnp.asarray(flat_chain[i : i + batch])
        res = thermo_fn(chunk)
        for j, a in enumerate(res):
            outs[j].append(np.asarray(a))
    cat = [np.concatenate(o) for o in outs]
    bands = [equal_tailed(c, ci) for c in cat]
    return ProfileSet(
        r_kpc=np.asarray(r_kpc),
        density=bands[0], temp_sz=bands[1], temp_x=bands[2],
        pressure=bands[3], entropy=bands[4], cooling_time=bands[5],
        gas_mass=bands[6], gas_fraction=bands[7],
    )


def compute_mass_profiles(model, cosmo: Cosmology, r_kpc,
                          flat_chain: np.ndarray, delta: float = 500.0,
                          ci: float = 95.0, batch: int = 4096,
                          n_bisect: int = 60,
                          max_samples: int | None = _MAX_BAND_SAMPLES):
    """HSE mass bands + overdensity radius/mass (vectorised bisection on
    M(r) - M_Delta(r) = 0, replacing the reference's per-sample
    scipy.optimize.newton at joxsz_plots.py:335)."""
    flat_chain = _band_subsample(flat_chain, max_samples)
    _, mass_fn = make_profile_fns(model, cosmo, r_kpc)
    r = jnp.asarray(r_kpc)
    lo0 = float(r_kpc[0])
    hi0 = float(r_kpc[-1])

    def rdelta_one(theta):
        pars = model.params.unpack(theta)

        def f(rr):
            return model.mass(pars, rr) - mass_overdensity(rr, cosmo, delta)

        def body(_, state):
            lo, hi = state
            mid = 0.5 * (lo + hi)
            fm = f(mid)
            # M - M_delta is positive inside r_delta (M grows slower than
            # r^3 asymptotically); move the bracket accordingly
            lo = jnp.where(fm > 0, mid, lo)
            hi = jnp.where(fm > 0, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(
            0, n_bisect, body,
            (jnp.asarray(lo0, dtype=r.dtype), jnp.asarray(hi0, dtype=r.dtype)))
        rd = 0.5 * (lo + hi)
        md = model.mass(pars, rd)
        return rd, md

    rdelta_fn = jax.jit(jax.vmap(rdelta_one))

    masses, rds, mds = [], [], []
    for i in range(0, len(flat_chain), batch):
        chunk = jnp.asarray(flat_chain[i : i + batch])
        masses.append(np.asarray(mass_fn(chunk)))
        rd, md = rdelta_fn(chunk)
        rds.append(np.asarray(rd))
        mds.append(np.asarray(md))
    mass_bands = equal_tailed(np.concatenate(masses), ci)
    r_delta = equal_tailed(np.concatenate(rds), ci)
    m_delta = equal_tailed(np.concatenate(mds), ci)
    return mass_bands, r_delta, m_delta


def compute_gas_fraction(model, cosmo: Cosmology, r_kpc,
                         flat_chain: np.ndarray, ci: float = 95.0,
                         batch: int = 4096,
                         max_samples: int | None = _MAX_BAND_SAMPLES
                         ) -> np.ndarray:
    """f_gas = M_gas / M_HSE bands (reference frac_gas_prof)."""
    flat_chain = _band_subsample(flat_chain, max_samples)
    r = jnp.asarray(r_kpc)

    def fgas_one(theta):
        pars = model.params.unpack(theta)
        ne = model.density(pars, r)
        return cumulative_gas_mass(ne, r) / model.mass(pars, r)

    fn = jax.jit(jax.vmap(fgas_one))
    outs = []
    for i in range(0, len(flat_chain), batch):
        outs.append(np.asarray(fn(jnp.asarray(flat_chain[i : i + batch]))))
    return equal_tailed(np.concatenate(outs), ci)


def posterior_predictive(model, flat_chain: np.ndarray, ci: float = 95.0,
                         batch: int = 4096,
                         max_samples: int | None = _MAX_BAND_SAMPLES):
    """Bands of the X-ray predicted count profiles and the SZ brightness
    profile over the chain (reference best_fit_prof)."""
    flat_chain = _band_subsample(flat_chain, max_samples)
    sz_fn = jax.jit(jax.vmap(model.sz_profile)) \
        if model.sz_data is not None else None
    x_fn = jax.jit(jax.vmap(model.xray_profiles)) \
        if model.xray_data is not None else None
    sz_out, x_out = [], []
    for i in range(0, len(flat_chain), batch):
        chunk = jnp.asarray(flat_chain[i : i + batch])
        if sz_fn is not None:
            sz_out.append(np.asarray(sz_fn(chunk)))
        if x_fn is not None:
            x_out.append(np.asarray(x_fn(chunk)))
    perc_sz = equal_tailed(np.concatenate(sz_out), ci) if sz_out else None
    perc_x = equal_tailed(np.concatenate(x_out), ci) if x_out else None
    return perc_x, perc_sz
