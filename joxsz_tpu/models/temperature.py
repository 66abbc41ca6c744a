"""Temperature profile components.

``UPPTemperature`` replaces the reference's ``CmptUPPTemperature``
(/root/reference/joxsz_funcs.py:303-339): the ideal-gas law T = P/ne gives
the (gas-mass-weighted) SZ temperature, and a free log-ratio parameter
log(T_X/T_SZ) maps it to the spectroscopic X-ray temperature.

``VikhlininTemperature`` is a parametric alternative (BASELINE config #4):
the 6-parameter Vikhlinin+2006 form with a central cool-core dip,

    T(r) = T0 * (x^ac + Tmin/T0)/(x^ac + 1) / (1 + (r/rt)^bt)^(ct/bt),
    x = r / rcool.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp

from .params import Param, ParamSet


class UPPTemperature:
    """T_SZ = P/ne (keV); T_X = T_SZ * 10^log(T_X/T_SZ)."""

    def __init__(self, pressure, density, name: str = "T"):
        self.name = name
        self.pressure = pressure
        self.density = density

    def default_params(self) -> ParamSet:
        return ParamSet(OrderedDict([
            ("log(T_X/T_{SZ})", Param(0.0, -1.0, 1.0)),
        ]))

    def t_sz(self, pars: dict, r_kpc) -> jnp.ndarray:
        return self.pressure(pars, r_kpc) / self.density(pars, r_kpc)

    def t_x(self, pars: dict, r_kpc) -> jnp.ndarray:
        return self.t_sz(pars, r_kpc) * 10.0 ** pars["log(T_X/T_{SZ})"]

    def __call__(self, pars: dict, r_kpc, sz: bool = False) -> jnp.ndarray:
        return self.t_sz(pars, r_kpc) if sz else self.t_x(pars, r_kpc)


class VikhlininTemperature:
    """Parametric 3D temperature profile (keV), decoupled from pressure.

    Vikhlinin et al. 2006 form with the slope-transition width FIXED at
    b_t = 2 (the common simplification): T = T_0 * cool(r) *
    (1 + (r/r_t)^2)^(-c_t/2) — only the 6 parameters below are free, so
    fits interpreted against the full published parametrization should
    note the fixed b_t.

    When used in place of ``UPPTemperature`` the SZ pressure and the X-ray
    temperature are sampled independently (useful for consistency checks
    between the two probes)."""

    def __init__(self, name: str = "T"):
        self.name = name

    def default_params(self) -> ParamSet:
        return ParamSet(OrderedDict([
            ("T_0", Param(8.0, 0.5, 30.0, unit="keV")),
            ("T_{min}/T_0", Param(0.7, 0.05, 1.0)),
            ("r_{cool}", Param(100.0, 1.0, 1000.0, unit="kpc")),
            ("a_{cool}", Param(2.0, 0.1, 10.0)),
            ("r_t", Param(1000.0, 100.0, 5000.0, unit="kpc")),
            ("c_t", Param(1.0, 0.0, 4.0)),
        ]))

    def t_x(self, pars: dict, r_kpc) -> jnp.ndarray:
        r = jnp.asarray(r_kpc)
        T0 = pars["T_0"]
        tmin_ratio = pars["T_{min}/T_0"]
        rcool = pars["r_{cool}"]
        acool = pars["a_{cool}"]
        rt = pars["r_t"]
        ct = pars["c_t"]
        x = (r / rcool) ** acool
        cool = (x + tmin_ratio) / (x + 1.0)
        outer = (1.0 + (r / rt) ** 2) ** (-ct / 2.0)
        return T0 * cool * outer

    t_sz = t_x

    def __call__(self, pars: dict, r_kpc, sz: bool = False) -> jnp.ndarray:
        return self.t_x(pars, r_kpc)
