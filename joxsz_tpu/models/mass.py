"""Hydrostatic-equilibrium mass profile.

Replaces the reference's ``CmptMyMass`` (/root/reference/joxsz_funcs.py:409-437):

    M(<r) = - (dP/dr) r^2 / (mu_gas m_u n_e G)   [solar masses]

with dP/dr from the pressure component (analytic for gNFW, autodiff
otherwise).  Also provides the overdensity mass M_Delta(r) of the critical
density (joxsz_plots.py:378-399) used to solve for r_500/M_500.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as K
from ..cosmology import Cosmology


class HSEMass:
    def __init__(self, pressure, density, mu_gas: float = K.mu_gas,
                 name: str = "m"):
        self.name = name
        self.pressure = pressure
        self.density = density
        self.mu_gas = mu_gas
        # fold all CGS conversions into one O(1e10) scalar so the traced
        # computation stays in float32 range on TPU (no 1e49 intermediates):
        # M[Msun] = -dP/dr[keV cm^-3 kpc^-1] * r[kpc]^2 / ne * C
        self._C = (K.keV_erg * K.kpc_cm
                   / (mu_gas * K.mu_g * K.G_cgs) / K.solar_mass_g)

    def __call__(self, pars: dict, r_kpc) -> jnp.ndarray:
        dp_dr_kpc = self.pressure.derivative(pars, r_kpc)
        ne = self.density(pars, r_kpc)
        r = jnp.asarray(r_kpc)
        return -dp_dr_kpc * r * r / ne * self._C


def mass_overdensity(r_kpc, cosmo: Cosmology, delta: float = 500.0):
    """M_Delta(r) = (4/3) pi rho_c(z) Delta r^3 in solar masses.

    The whole prefactor folds to ONE host-side scalar (float: numpy
    math, never traced): cubing r in cm inside the trace (~1e73) would
    overflow float32 on the default TPU run and silently collapse the
    r_500 bisection in compute_mass_profiles (the f32 discipline all
    mass constants follow — see HSEMass._C)."""
    rho_c = cosmo.critical_density_cgs()
    C = float(4.0 / 3.0 * jnp.pi * rho_c * delta
              * K.kpc_cm**3 / K.solar_mass_g)   # O(1e5): Msun per kpc^3
    r = jnp.asarray(r_kpc)
    return C * r * r * r
