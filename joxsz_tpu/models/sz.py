"""SZ forward model + likelihood (JAX, jittable, vmappable).

Runtime equivalent of the reference's ``get_sz_like``
(/root/reference/joxsz_funcs.py:439-493), with the entire linear chain
(Abel -> spline-to-map -> beam convolution -> transfer-function filtering ->
central-profile extraction) pre-composed into the dense operators of
``ops.szkernel.SZOperator``.  Per evaluation this is:

    raw   = L @ P(r_pp)                         # one (86, 313) matvec (MXU)
    T_SZ  = P/ne on r_pp[:sep];  T(0) = w_T0 . T_SZ
    conv  = lerp(conversion table, [T(0), T_SZ])
    prof  = raw * conv * calibration
    model = G @ prof                            # (19, 86) matvec
    chi2  = sum(((flux - model)/err)^2);  ll = -chi2/2
    (+ optional integrated-Y Gaussian prior term)

Batched over walkers with vmap, both matvecs become MXU matmuls; the
reference pays ~9.3 ms/eval on CPU for the same chain (SURVEY.md §6).
"""

from __future__ import annotations

import dataclasses


import numpy as np
import jax
import jax.numpy as jnp

from ..ops.szkernel import SZOperator
from ..ops.splines import lerp_lookup


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SZData:
    """Device-resident constants for the SZ likelihood of one cluster.

    Registered as a JAX pytree (array fields are leaves; `sep`/integ
    settings are static) so a stack of clusters' data can be vmapped
    alongside the parameter batch (multi-cluster fits, BASELINE #5)."""

    L: jnp.ndarray            # (n_pix, n_press)
    G: jnp.ndarray            # (n_data, n_pix)
    w_T0: jnp.ndarray         # (sep,)
    integ_w: jnp.ndarray      # (n_press,)
    conv_T: jnp.ndarray       # conversion table: temperatures (keV)
    conv_val: jnp.ndarray     # conversion table: mJy/beam per unit y
    flux_r: jnp.ndarray       # data radii (arcsec) — kept for plots
    flux: jnp.ndarray         # (n_data,) flux densities (mJy/beam)
    flux_err: jnp.ndarray     # (n_data,)
    r_press_kpc: jnp.ndarray  # (n_press,)
    sep: int = dataclasses.field(metadata=dict(static=True))
    calc_integ: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # per-cluster scalars are DATA leaves (not static) so clusters with
    # different integrated-Y priors can be stacked/vmapped together
    integ_mu: float = 0.0
    integ_sig: float = 1.0

    @classmethod
    def build(cls, op: SZOperator, conv_table, flux_data,
              r_press_kpc, sep: int, dtype=jnp.float64,
              calc_integ: bool = False, integ_mu: float = 0.0,
              integ_sig: float = 1.0) -> "SZData":
        t_tab, v_tab = conv_table
        asx = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)
        return cls(
            L=asx(op.L), G=asx(op.G), w_T0=asx(op.w_T0),
            integ_w=asx(op.integ_w),
            conv_T=asx(t_tab), conv_val=asx(v_tab),
            flux_r=asx(flux_data[0]), flux=asx(flux_data[1]),
            flux_err=asx(flux_data[2]),
            r_press_kpc=asx(r_press_kpc), sep=int(sep),
            calc_integ=calc_integ, integ_mu=float(integ_mu),
            integ_sig=float(integ_sig),
        )


def sz_brightness(pars: dict, sz: SZData, pressure, temperature) -> jnp.ndarray:
    """Model surface-brightness profile (mJy/beam) on the map radius axis
    (the reference's ``output='bright'``)."""
    pp = pressure(pars, sz.r_press_kpc)
    raw = sz.L @ pp
    t_prof = temperature.t_sz(pars, sz.r_press_kpc[: sz.sep])
    t0 = sz.w_T0 @ t_prof
    t_all = jnp.concatenate([t0[None], t_prof])
    conv = lerp_lookup(sz.conv_T, sz.conv_val, t_all)
    return raw * conv * pars["calibration"]


def sz_log_like(pars: dict, sz: SZData, pressure, temperature) -> jnp.ndarray:
    """-chi^2/2 against the flux profile (+ optional integrated-Y term)."""
    prof = sz_brightness(pars, sz, pressure, temperature)
    model = sz.G @ prof
    resid = (sz.flux - model) / sz.flux_err
    chisq = jnp.nansum(resid * resid)
    ll = -0.5 * chisq
    if sz.calc_integ:
        pp = pressure(pars, sz.r_press_kpc)
        cint = sz.integ_w @ pp
        ll = ll - 0.5 * ((cint - sz.integ_mu) / sz.integ_sig) ** 2
    return ll


def sz_integrated_y(pars: dict, sz: SZData, pressure) -> jnp.ndarray:
    """Integrated Compton parameter (arcmin^2), reference 'integ' output."""
    return sz.integ_w @ pressure(pars, sz.r_press_kpc)


def sz_outputs(pars: dict, sz: SZData, pressure, temperature,
               output: str = "ll") -> jnp.ndarray:
    """Named-output selector mirroring the reference's
    ``get_sz_like(output=...)`` API (/root/reference/joxsz_funcs.py:439-493):
    'll' | 'chisq' | 'pp' | 'bright' | 'integ'."""
    if output == "pp":
        return pressure(pars, sz.r_press_kpc)
    if output == "bright":
        return sz_brightness(pars, sz, pressure, temperature)
    if output == "integ":
        return sz_integrated_y(pars, sz, pressure)
    if output == "ll":
        return sz_log_like(pars, sz, pressure, temperature)
    if output == "chisq":
        # flux chi^2 only, excluding any integrated-Y prior term (the
        # reference computes chisq before that addition)
        prof = sz_brightness(pars, sz, pressure, temperature)
        resid = (sz.flux - sz.G @ prof) / sz.flux_err
        return jnp.nansum(resid * resid)
    raise ValueError(
        "output must be one of 'll', 'chisq', 'pp', 'bright', 'integ'")
