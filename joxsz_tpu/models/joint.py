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
    def _mass_veto_ok(self, pars: dict, r_press_kpc) -> jnp.ndarray:
        """Physical-mass criterion (reference veto,
        /root/reference/joxsz_funcs.py:522-525), family-aware.

        Smooth pressure families: the reference check verbatim —
        np.gradient of M(<r) strictly positive on the dense pressure
        grid (jnp.gradient matches numpy's central/one-sided scheme).

        Knot pressure: the mass is discontinuous at the knots (piecewise
        slope), so the dense-grid check rejects nearly all knot vectors
        on kink artifacts.  Instead require the segment-averaged mass —
        M evaluated at one log-midpoint per segment, where the slope is
        exact — to be strictly increasing and to end positive (a
        decreasing outer pressure), the same physical content without
        penalising the interpolant's kinks."""
        rv = getattr(self.pressure, "mass_veto_radii", None)
        if rv is not None:
            m = self.mass(pars, jnp.asarray(rv()))
            return jnp.all(m[1:] > m[:-1]) & (m[-1] > 0.0)
        m = self.mass(pars, r_press_kpc)
        return jnp.all(jnp.gradient(m) > 0.0)

    def log_like(self, theta: jnp.ndarray, sz_data: SZData | None = None,
                 xray_data: XrayData | None = None) -> jnp.ndarray:
        """Joint log-likelihood (including priors) of a thawed vector.

        ``sz_data``/``xray_data`` override the bound datasets — both
        containers are registered pytrees, so a stacked multi-cluster batch
        can be vmapped over data and parameters together (see
        ``models.multicluster``)."""
        sz = sz_data if sz_data is not None else self.sz_data
        xr = xray_data if xray_data is not None else self.xray_data
        pars = self.params.unpack(theta)
        total = self.params.log_prior(theta)
        if hasattr(self.density, "log_prior"):
            total = total + self.density.log_prior(pars)

        if self.exclude_unphysical_mass and sz is not None:
            mono = self._mass_veto_ok(pars, sz.r_press_kpc)
            total = total + jnp.where(mono, 0.0, -jnp.inf)

        if xr is not None:
            total = total + xray_log_like(
                pars, xr, self.density, self.temperature, self.Z_name)

        if sz is not None:
            total = total + sz_log_like(
                pars, sz, self.pressure, self.temperature)

        # keep NaNs (e.g. 0*inf products under masking) out of the chain
        return jnp.where(jnp.isnan(total), -jnp.inf, total)

    # -- prior/likelihood decomposition (evidence estimation) ---------------
    # log_like above is the full posterior density (the reference's
    # getLikelihood semantics, priors folded in).  The evidence ladder
    # (sampling/evidence.py) needs the two factors separately:
    # p_beta ∝ exp(log_prior_only + beta * log_data_like).  The split is
    # exact: log_like == log_prior_only + log_data_like wherever the
    # prior is finite (asserted by tests/test_evidence.py).

    def log_prior_only(self, theta: jnp.ndarray,
                       sz_data: SZData | None = None) -> jnp.ndarray:
        """Prior factor: box/Gaussian parameter priors, the density's
        structural prior (r_c < r_s), and the physical-mass veto —
        support restrictions are prior semantics (they do not involve
        the data), so evidence is defined w.r.t. this veto-restricted
        normalized prior."""
        sz = sz_data if sz_data is not None else self.sz_data
        pars = self.params.unpack(theta)
        total = self.params.log_prior(theta)
        if hasattr(self.density, "log_prior"):
            total = total + self.density.log_prior(pars)
        if self.exclude_unphysical_mass and sz is not None:
            mono = self._mass_veto_ok(pars, sz.r_press_kpc)
            total = total + jnp.where(mono, 0.0, -jnp.inf)
        return jnp.where(jnp.isnan(total), -jnp.inf, total)

    def log_data_like(self, theta: jnp.ndarray,
                      sz_data: SZData | None = None,
                      xray_data: XrayData | None = None) -> jnp.ndarray:
        """Data factor: the X-ray Cash and SZ chi^2 terms only (includes
        the predicted-counts positivity veto — zero likelihood is a
        statement about the data model, not the prior)."""
        sz = sz_data if sz_data is not None else self.sz_data
        xr = xray_data if xray_data is not None else self.xray_data
        pars = self.params.unpack(theta)
        total = jnp.zeros(())
        if xr is not None:
            total = total + xray_log_like(
                pars, xr, self.density, self.temperature, self.Z_name)
        if sz is not None:
            total = total + sz_log_like(
                pars, sz, self.pressure, self.temperature)
        return jnp.where(jnp.isnan(total), -jnp.inf, total)

    def log_like_batch(self):
        """vmapped version: (n_walkers, ndim) -> (n_walkers,)."""
        return jax.vmap(self.log_like)

    def log_like_batch_fused(self, conv_table, flux_data, op,
                             use_pallas: bool = True,
                             interpret: bool = False, dtype=None):
        """Batch-level joint likelihood with the SZ core as one fused
        Pallas kernel (ops.pallas_kernels): profile evaluation and the
        X-ray/prior terms stay vmapped XLA; the two SZ matmuls + conversion
        + chi^2 run VMEM-resident per walker tile.

        Numerically identical to vmap(log_like) (covered by tests); on TPU
        it removes the HBM round-trips between the SZ stages."""
        from ..ops.pallas_kernels import make_sz_core
        from .xray import xray_log_like

        if dtype is None:
            dtype = self.sz_data.L.dtype
        sz = self.sz_data
        core = make_sz_core(op, conv_table, flux_data[1], flux_data[2],
                            dtype=dtype, use_pallas=use_pallas,
                            interpret=interpret)
        sep = sz.sep

        def profiles_one(theta):
            pars = self.params.unpack(theta)
            pp = self.pressure(pars, sz.r_press_kpc)
            t_prof = self.temperature.t_sz(pars, sz.r_press_kpc[:sep])
            t0 = sz.w_T0 @ t_prof
            t_all = jnp.concatenate([t0[None], t_prof])
            return pp, t_all, pars["calibration"]

        def rest_one(theta):
            pars = self.params.unpack(theta)
            total = self.params.log_prior(theta)
            if hasattr(self.density, "log_prior"):
                total = total + self.density.log_prior(pars)
            if self.exclude_unphysical_mass:
                mono = self._mass_veto_ok(pars, sz.r_press_kpc)
                total = total + jnp.where(mono, 0.0, -jnp.inf)
            if self.xray_data is not None:
                total = total + xray_log_like(
                    pars, self.xray_data, self.density, self.temperature,
                    self.Z_name)
            if sz.calc_integ:
                pp = self.pressure(pars, sz.r_press_kpc)
                cint = sz.integ_w @ pp
                total = total - 0.5 * ((cint - sz.integ_mu)
                                       / sz.integ_sig) ** 2
            return total

        profiles_b = jax.vmap(profiles_one)
        rest_b = jax.vmap(rest_one)

        def batch_ll(thetas):
            pp, t_all, cal = profiles_b(thetas)
            sz_ll = core(pp, t_all, cal)
            total = sz_ll + rest_b(thetas)
            return jnp.where(jnp.isnan(total), -jnp.inf, total)

        return batch_ll

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
        # spectral-line systematic nuisance: multiplies the metal-line
        # component of the count-rate table (rate = r_Z0 + s*Z*(r_Z1 -
        # r_Z0), exactly the line part since the tables are linear in Z).
        # Frozen at 1 by default; thaw (--line-systematic) to marginalize
        # the anchored ~25% line-emissivity spread of the fallback
        # spectral model (PARITY.md #1, tests/test_spectrum_anchors.py)
        # instead of carrying it as a documented caveat.  Supersedes the
        # reference's implicit trust in XSPEC APEC rates
        # (/root/reference/joxsz_funcs.py:652-681).
        ("line_scale", Param(1.0, 0.0, 2.5, frozen=True, prior="gauss",
                             prior_mu=1.0, prior_sigma=0.25)),
    ]))
    pars.update(pressure.default_params())
    pars.update(OrderedDict([
        ("backscale", gaussian_param(1.0, 1.0, 0.1)),
        ("calibration", gaussian_param(1.0, 1.0, 0.07)),
    ]))

    pars.freeze(r"\gamma", 3.0)
    pars["log(r_c)"].val = 2.0
    if edges_logkpc is not None:
        # reference bound tightening (joxsz_main.py:160-161).  On compact
        # instruments the tightened ceiling can fall below the generic
        # default VALUES, which would leave the init at -inf under the
        # box prior (found by the geometry-generalization sweep, r4) —
        # keep defaults strictly inside the box.  Runs after the val
        # resets above so they cannot re-escape the box.
        ceil = float(edges_logkpc[-2])
        for nm in ("log(r_c)", "log(r_s)"):
            pars[nm].maxval = ceil
            if pars[nm].val >= ceil:
                pars[nm].val = ceil - 0.05 * (ceil - pars[nm].minval)
        # The Vikhlinin shape prior requires r_c <= r_s
        # (models/density.py log_prior); the independent in-box nudges
        # above can INVERT the pair when the ceiling lands between the
        # two defaults (e.g. ceil in (2.0, 2.105]: r_c keeps 2.0, r_s
        # drops below it) — leaving every walker at -inf.  Restore the
        # ordering inside both boxes: pull r_c below r_s, and if r_s
        # was pushed below r_c's floor, lift r_s back above r_c (r_c's
        # value is strictly < ceil here, so the midpoint is in-box).
        rc, rs = pars["log(r_c)"], pars["log(r_s)"]
        if rc.val > rs.val:
            rc.val = max(rc.minval, rs.val - 0.05 * (ceil - rc.minval))
            if rc.val >= rs.val:
                rs.val = rc.val + 0.5 * (ceil - rc.val)
    pars[r"\epsilon"].maxval = 10.0
    pars.freeze(r"\alpha", 0.0)
    if "c" in pars:  # gNFW inner slope (absent for knot pressure)
        pars.freeze("c")
    if "log(T_X/T_{SZ})" in pars:  # UPP temperature only
        pars.thaw("log(T_X/T_{SZ})")

    # reorder the thawed list to the reference's sampling order
    # (density, Z, T-ratio, pressure, backscale, calibration):
    # ParamSet preserves insertion order; the assembly above already yields
    # [log(n_0), beta, log(r_c), log(r_s), eps, log(T_X/T_SZ), Z, P_0, a,
    #  b, r_p, backscale, calibration] — matching §2.4 up to the (Z,
    # T-ratio) adjacency, which is a labelling choice with no sampling
    # consequence.
    return pars
