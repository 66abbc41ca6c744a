"""Joint SZ + X-ray model: one fused, jittable log-likelihood.

TPU-native equivalent of the reference's monkey-patched ``getLikelihood``
(/root/reference/joxsz_funcs.py:507-546), SURVEY.md §3.3.  The whole stack —
parameter priors, hydrostatic-mass monotonicity veto, X-ray predicted counts
with positivity veto, Cash term, SZ chi^2 — is a single pure function of the
flat thawed-parameter vector.  The reference's early-exit -inf returns
become `jnp.where` masks so shapes stay static under vmap: a full walker
ensemble evaluates as one batched call.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .params import ParamSet, Param, gaussian_param
from .pressure import GNFWPressure
from .density import VikhlininDensity
from .temperature import UPPTemperature
from .mass import HSEMass
from .sz import SZData, sz_log_like, sz_brightness
from .xray import XrayData, xray_log_like, predicted_counts


@dataclasses.dataclass
class JointModel:
    """Bundle of components + data defining the joint posterior.

    ``sz_data`` and/or ``xray_data`` may be None for single-probe fits
    (SZ-only = the `preprofit` capability, BASELINE config #1)."""

    pressure: object
    density: object
    temperature: object
    params: ParamSet
    sz_data: SZData | None = None
    xray_data: XrayData | None = None
    mass: HSEMass | None = None
    exclude_unphysical_mass: bool = True
    Z_name: str = "Z"

    def __post_init__(self):
        if self.mass is None:
            self.mass = HSEMass(self.pressure, self.density)

    # -- likelihood ----------------------------------------------------------
    def log_like(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Joint log-likelihood (including priors) of a thawed vector."""
        pars = self.params.unpack(theta)
        total = self.params.log_prior(theta)
        if hasattr(self.density, "log_prior"):
            total = total + self.density.log_prior(pars)

        if self.exclude_unphysical_mass and self.sz_data is not None:
            m = self.mass(pars, self.sz_data.r_press_kpc)
            # reference veto: np.gradient(m, 1) > 0 everywhere
            # (joxsz_funcs.py:522-525); jnp.gradient matches numpy's
            # central/one-sided differencing
            mono = jnp.all(jnp.gradient(m) > 0.0)
            total = total + jnp.where(mono, 0.0, -jnp.inf)

        if self.xray_data is not None:
            total = total + xray_log_like(
                pars, self.xray_data, self.density, self.temperature,
                self.Z_name)

        if self.sz_data is not None:
            total = total + sz_log_like(
                pars, self.sz_data, self.pressure, self.temperature)

        # keep NaNs (e.g. 0*inf products under masking) out of the chain
        return jnp.where(jnp.isnan(total), -jnp.inf, total)

    def log_like_batch(self):
        """vmapped version: (n_walkers, ndim) -> (n_walkers,)."""
        return jax.vmap(self.log_like)

    # -- diagnostics / post-processing --------------------------------------
    def sz_profile(self, theta) -> jnp.ndarray:
        pars = self.params.unpack(theta)
        return sz_brightness(pars, self.sz_data, self.pressure,
                             self.temperature)

    def xray_profiles(self, theta) -> jnp.ndarray:
        pars = self.params.unpack(theta)
        return predicted_counts(pars, self.xray_data, self.density,
                                self.temperature, self.Z_name)


def build_reference_params(
    pressure: GNFWPressure,
    density: VikhlininDensity,
    temperature: UPPTemperature,
    Z_solar: float = 0.3,
    edges_logkpc: np.ndarray | None = None,
) -> ParamSet:
    """Assemble the reference's 13-parameter configuration
    (/root/reference/joxsz_main.py:128-175, SURVEY.md §2.4): Vikhlinin
    density (alpha, gamma frozen; rc reset; eps bound widened), flat
    metallicity, gNFW pressure (c frozen), thawed T-ratio, Gaussian-prior
    backscale and calibration."""
    pars = density.default_params()
    pars.update(temperature.default_params())
    pars.update(OrderedDict([
        ("Z", Param(Z_solar, 0.0, 1.0, unit="solar")),
    ]))
    pars.update(pressure.default_params())
    pars.update(OrderedDict([
        ("backscale", gaussian_param(1.0, 1.0, 0.1)),
        ("calibration", gaussian_param(1.0, 1.0, 0.07)),
    ]))

    if edges_logkpc is not None:
        pars["log(r_c)"].maxval = float(edges_logkpc[-2])
        pars["log(r_s)"].maxval = float(edges_logkpc[-2])
    pars.freeze(r"\gamma", 3.0)
    pars["log(r_c)"].val = 2.0
    pars[r"\epsilon"].maxval = 10.0
    pars.freeze(r"\alpha", 0.0)
    if "c" in pars:
        pars.freeze("c")
    pars.thaw("log(T_X/T_{SZ})")

    # reorder the thawed list to the reference's sampling order
    # (density, Z, T-ratio, pressure, backscale, calibration):
    # ParamSet preserves insertion order; the assembly above already yields
    # [log(n_0), beta, log(r_c), log(r_s), eps, log(T_X/T_SZ), Z, P_0, a,
    #  b, r_p, backscale, calibration] — matching §2.4 up to the (Z,
    # T-ratio) adjacency, which is a labelling choice with no sampling
    # consequence.
    return pars
