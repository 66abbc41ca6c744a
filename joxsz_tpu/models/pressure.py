"""Electron-pressure profile components.

``GNFWPressure`` replaces the reference's ``CmptPressure``
(/root/reference/joxsz_funcs.py:248-301): the generalised-NFW profile

    P(r) = P0 / [ (r/rp)^c * (1 + (r/rp)^a)^((b-c)/a) ]

with its analytic radial derivative (used by the hydrostatic-mass veto and
the mass profiles).

``KnotPressure`` is the non-parametric alternative (BASELINE config #4): the
log-pressure is interpolated linearly between fixed log-radius knots; the
derivative comes from autodiff, keeping the HSE mass generic.

All profile functions are pure jnp and broadcast over radius arrays; under
vmap a walker batch evaluates as one fused elementwise kernel.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from .params import Param, ParamSet


class GNFWPressure:
    """gNFW pressure (keV cm^-3) with the reference's defaults/bounds."""

    def __init__(self, name: str = "p"):
        self.name = name

    def default_params(self) -> ParamSet:
        return ParamSet(OrderedDict([
            ("P_0", Param(0.4, 0.0, 2.0, unit="keV.cm^{-3}")),
            ("a", Param(1.33, 0.1, 20.0)),
            ("b", Param(4.13, 0.1, 15.0)),
            ("c", Param(0.014, 0.0, 3.0)),
            ("r_p", Param(300.0, 100.0, 3000.0, unit="kpc")),
        ]))

    def __call__(self, pars: dict, r_kpc) -> jnp.ndarray:
        # log-space evaluation: the naive (1+x^a)^((b-c)/a) overflows
        # f32 for in-bounds corners (x=50, a=20 -> x^a ~ 1e34);
        # softplus(a ln x) = ln(1+x^a) never materialises x^a.
        P0, a, b, c, rp = (pars["P_0"], pars["a"], pars["b"], pars["c"],
                           pars["r_p"])
        lnx = jnp.log(r_kpc / rp)
        return P0 * jnp.exp(-c * lnx
                            - ((b - c) / a) * jax.nn.softplus(a * lnx))

    def derivative(self, pars: dict, r_kpc) -> jnp.ndarray:
        """Analytic dP/dr (keV cm^-3 kpc^-1).

        Evaluated as -(P/r) * (c + (b-c) * sigmoid(a ln x)): identical
        math to the reference's closed form (joxsz_funcs.py:283-301),
        but underflows only where P itself does.  The naive form's
        (1+x^a)^((b-c+a)/a) denominator overflows f32 to inf inside the
        prior box (a~20, r_p~100 at r~5000 kpc), returning dP/dr = -0
        and making the HSE-mass monotonicity veto falsely reject
        genuine posterior states (f64-adjudicated on converged-chain
        samples, scripts/cpu_finite_mask_adjudicate.py)."""
        a, b, c, rp = pars["a"], pars["b"], pars["c"], pars["r_p"]
        r = jnp.asarray(r_kpc)
        # reuse __call__ for P: the overflow-hardened pressure
        # expression lives in ONE place — a future stability change
        # there cannot desynchronise P and dP/dr (which would corrupt
        # the HSE-mass veto while the profile still looked right)
        press = self(pars, r)
        s = jax.nn.sigmoid(a * jnp.log(r / rp))   # x^a / (1 + x^a)
        return -press / r * (c + (b - c) * s)


class KnotPressure:
    """Non-parametric pressure: log10 P interpolated linearly in log10 r
    between fixed knots (values are the free parameters)."""

    def __init__(self, knots_r_kpc: np.ndarray,
                 init_logP: np.ndarray | None = None,
                 bounds_logP: tuple[float, float] = (-7.0, 2.0),
                 name: str = "p"):
        self.name = name
        self.knots_logr = np.log10(np.asarray(knots_r_kpc, dtype=float))
        self.n_knots = self.knots_logr.size
        if init_logP is None:
            # seed from a typical gNFW shape
            r = np.asarray(knots_r_kpc, dtype=float)
            x = r / 300.0
            init_logP = np.log10(0.4 / (x**0.014 * (1 + x**1.33) ** 3.08))
        self.init_logP = np.asarray(init_logP, dtype=float)
        self.bounds_logP = bounds_logP

    def param_names(self) -> list[str]:
        return [f"logP_{i}" for i in range(self.n_knots)]

    def default_params(self) -> ParamSet:
        lo, hi = self.bounds_logP
        return ParamSet(OrderedDict(
            (f"logP_{i}", Param(float(self.init_logP[i]), lo, hi,
                                unit="log(keV.cm^{-3})"))
            for i in range(self.n_knots)
        ))

    def _log_press(self, pars: dict, logr) -> jnp.ndarray:
        vals = jnp.stack([pars[n] for n in self.param_names()])
        return jnp.interp(logr, jnp.asarray(self.knots_logr), vals)

    def __call__(self, pars: dict, r_kpc) -> jnp.ndarray:
        logr = jnp.log10(jnp.asarray(r_kpc))
        return 10.0 ** self._log_press(pars, logr)

    def derivative(self, pars: dict, r_kpc) -> jnp.ndarray:
        """dP/dr via autodiff of the interpolant (vectorised; preserves
        the input shape, including scalars — the r_delta bisection
        carries a scalar radius through it)."""
        f = lambda r: 10.0 ** self._log_press(pars, jnp.log10(r))
        r = jnp.asarray(r_kpc)
        out = jax.vmap(jax.grad(f))(jnp.atleast_1d(r))
        return out.reshape(r.shape)

    def mass_veto_radii(self) -> np.ndarray:
        """Segment midpoints (log-space) for the HSE-mass physicality
        veto.  The piecewise log-lerp makes dP/dr — hence the derived
        mass — discontinuous at the knots, so the reference's dense-grid
        monotonicity check (joxsz_funcs.py:522-525, designed for smooth
        gNFW profiles) rejects nearly every knot vector on segment-slope
        kinks alone.  The family-appropriate criterion evaluates the
        segment-averaged mass (the slope is exact and constant inside
        each segment) at one midpoint per segment and requires that
        sequence to be increasing; see JointModel._mass_veto_ok."""
        return 10.0 ** ((self.knots_logr[:-1] + self.knots_logr[1:]) / 2.0)
