"""Posterior-predictive model checking.

Bayesian p-values for the joint fit: for each posterior draw theta_s,
replicate the dataset through the likelihood's own noise model
(joxsz_tpu.simulate semantics — SZ Gaussian with the real per-point
errors, X-ray Poisson) and compare a discrepancy T(data, theta_s)
between the replicated and the observed data at the SAME theta_s:

    p = P[ T(data_rep, theta) >= T(data_obs, theta) | data_obs ]

p near 0 or 1 flags misfit the posterior cannot absorb (Gelman et al.,
"Bayesian Data Analysis" ch. 6).  Discrepancies are the likelihoods'
native ones:

* SZ: chi^2 = sum(((flux - G@prof)/err)^2) — exactly the quantity whose
  -1/2 is the SZ log-likelihood (models/sz.py:92-98);
* X-ray: the Poisson deviance 2*sum(m - d + d*ln(d/m)) over unmasked
  annuli — the saturated-model-referenced form of the Cash statistic
  (models/xray.py::cash_log_like), comparable across datasets because
  the data-only terms are included.

No reference equivalent (the reference's only model check is the
data-vs-model figure); this is the quantitative version of that figure.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PPCResult:
    """Per-probe Bayesian p-values and the discrepancy samples behind
    them (for histogram/scatter diagnostics)."""
    p_sz: float | None           # P(chi2_rep >= chi2_obs)
    p_xray: float | None         # P(dev_rep >= dev_obs)
    sz_obs: np.ndarray | None    # (S,) observed-data chi^2 at each draw
    sz_rep: np.ndarray | None    # (S,) replicated-data chi^2
    xray_obs: np.ndarray | None  # (S,) observed-data deviance
    xray_rep: np.ndarray | None  # (S,) replicated-data deviance


def _poisson_deviance(counts, pred, mask):
    """2*sum(m - d + d*ln(d/m)) with 0*ln(0) = 0, masked cells dropped."""
    d = counts
    with np.errstate(divide="ignore", invalid="ignore"):
        dlog = np.where(d > 0, d * np.log(np.where(d > 0, d, 1.0) / pred),
                        0.0)
    return 2.0 * np.sum(mask * (pred - d + dlog), axis=(-2, -1))


def posterior_predictive_pvalues(model, thetas, rng) -> PPCResult:
    """Compute posterior-predictive p-values from posterior draws.

    ``model``: JointModel with the OBSERVED data bound.  ``thetas``:
    (S, ndim) posterior sample (thinned to near-independence — e.g.
    ``FitResult`` chain thinned by the measured tau; S ~ a few hundred
    is plenty).  ``rng``: numpy Generator for the replicated draws (one
    replicated dataset per posterior draw, the standard PPC recipe).

    Draws with a non-positive predicted X-ray profile (outside the
    likelihood support — cannot happen for genuine posterior samples,
    the Cash veto zeroes them) raise, as in simulate_observation.
    """
    thetas = np.atleast_2d(np.asarray(thetas, dtype=float))
    S = thetas.shape[0]
    tj = jnp.asarray(thetas)

    p_sz = p_x = None
    sz_obs = sz_rep = xr_obs = xr_rep = None

    if model.sz_data is not None:
        sz = model.sz_data
        prof = np.asarray(jax.jit(jax.vmap(model.sz_profile))(tj))  # (S, np)
        mu = prof @ np.asarray(sz.G).T                              # (S, nd)
        err = np.asarray(sz.flux_err)
        flux = np.asarray(sz.flux)
        rep = mu + rng.normal(size=mu.shape) * err
        # the SZ likelihood's masking convention is NaN in flux
        # (models/sz.py nansum): the replicated chi^2 must drop the SAME
        # points, or every masked point adds a ~chi2(1) term to the
        # replicated side only and p_sz inflates (masks genuine misfit)
        valid = np.isfinite(flux) & np.isfinite(err)
        sz_obs = np.nansum(
            np.where(valid, ((flux - mu) / err) ** 2, 0.0), axis=1)
        sz_rep = np.nansum(
            np.where(valid, ((rep - mu) / err) ** 2, 0.0), axis=1)
        p_sz = float(np.mean(sz_rep >= sz_obs))

    if model.xray_data is not None:
        xr = model.xray_data
        pred = np.asarray(jax.jit(jax.vmap(model.xray_profiles))(tj))
        if np.any(pred <= 0):
            raise ValueError(
                "non-positive predicted X-ray counts at a supplied draw — "
                "these are not posterior samples of this model (the Cash "
                "positivity veto gives them zero likelihood)")
        mask = np.asarray(xr.counts_mask)
        counts = np.asarray(xr.counts_filled)
        rep = rng.poisson(pred).astype(float)
        xr_obs = _poisson_deviance(counts, pred, mask)
        xr_rep = _poisson_deviance(rep, pred, mask)
        p_x = float(np.mean(xr_rep >= xr_obs))

    return PPCResult(p_sz=p_sz, p_xray=p_x, sz_obs=sz_obs, sz_rep=sz_rep,
                     xray_obs=xr_obs, xray_rep=xr_rep)
