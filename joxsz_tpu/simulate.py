"""Synthetic-observation generation from known parameters.

First-class mock-data API (the reference has none — its only validation
is the published-fit comparison, SURVEY §4): draw a simulated dataset
from any parameter vector through the SAME forward models the
likelihood uses, with each probe's real noise model —

* SZ: Gaussian noise with the bundled per-point flux errors on the
  beam/TF-convolved model profile (the chi^2 likelihood's own model,
  models/sz.py);
* X-ray: Poisson counts around the predicted per-band annular profile
  (source + background terms, the Cash likelihood's own mean,
  models/xray.py).

Used for parameter-recovery/coverage tests (tests/test_recovery.py),
survey-scale multicluster demos, and posterior-predictive model
checking; injection-recovery on mock skies is the standard way to
validate a cluster-fitting pipeline end to end.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def _jitted_profile(model, name: str):
    """Jit-compile a model's profile method once per model instance.

    The mock loops call ``sz_profile``/``xray_profiles`` per cluster;
    eagerly each call dispatches hundreds of small ops — over the
    remote-TPU tunnel that is seconds per call (CLAUDE.md).  The jitted
    wrapper is cached ON the model object so its lifetime matches and
    repeat calls hit the compiled program."""
    attr = f"_jit_{name}"
    fn = getattr(model, attr, None)
    if fn is None:
        fn = jax.jit(getattr(model, name))
        setattr(model, attr, fn)
    return fn


@dataclasses.dataclass
class MockObservation:
    """A simulated dataset bound to a fit-ready model."""
    model: object                       # JointModel with mock data bound
    theta_true: np.ndarray              # generating parameter vector
    sz_flux: np.ndarray | None          # noisy mock flux (data radii)
    sz_flux_true: np.ndarray | None     # noiseless model flux
    xray_counts: np.ndarray | None      # noisy mock counts (band, annulus)
    xray_pred_true: np.ndarray | None   # noiseless predicted counts


def simulate_observation(model, theta, rng, *, sz_noise: bool = True,
                         xray_noise: bool = True) -> MockObservation:
    """Draw one mock observation of ``model`` at parameter vector
    ``theta`` and return a copy of the model with the mock data bound
    (ready to fit — same shapes, masks, exposures as the originals).

    ``rng``: numpy Generator (noise draws are host-side; simulation is
    a setup-time operation, not a hot path).  ``sz_noise=False`` /
    ``xray_noise=False`` bind the noiseless model prediction instead —
    useful for bias (not scatter) diagnostics.

    The parameter vector is NOT validated against the priors: simulating
    from outside the fitted prior support is a legitimate
    mis-specification test (the fit will then show the veto/prior pull).
    """
    theta = np.asarray(theta, dtype=float)
    theta_j = jnp.asarray(theta)
    replace = {}

    sz_flux = sz_true = None
    if model.sz_data is not None:
        sz = model.sz_data
        prof = np.asarray(_jitted_profile(model, "sz_profile")(theta_j))
        sz_true = np.asarray(sz.G) @ prof
        err = np.asarray(sz.flux_err)
        sz_flux = sz_true + (rng.normal(0.0, err) if sz_noise else 0.0)
        replace["sz_data"] = dataclasses.replace(
            sz, flux=jnp.asarray(sz_flux, dtype=sz.flux.dtype))

    xr_counts = xr_true = None
    if model.xray_data is not None:
        xr = model.xray_data
        xr_true = np.asarray(
            _jitted_profile(model, "xray_profiles")(theta_j))
        mask = np.asarray(xr.counts_mask) > 0
        # support guard over VALID cells: pred must be strictly
        # positive there or the generating theta itself is vetoed to
        # -inf by xray_log_like (pred == 0 and NaN both fail `> 0` —
        # the old `< 0` check let exact zeros and NaNs through, to die
        # later as an unrecoverable truth or an opaque poisson error)
        if not np.all(xr_true[mask] > 0):
            raise ValueError(
                "non-positive (or NaN) predicted X-ray counts in valid "
                "cells at theta — the vector is outside the "
                "likelihood's support; pick parameters with a physical "
                "(strictly positive) predicted profile")
        xr_counts = (rng.poisson(np.where(mask, xr_true, 0.0))
                     .astype(float) if xray_noise else
                     np.where(mask, xr_true, 0.0))
        # the ORIGINAL mask is kept ('same shapes, masks, exposures as
        # the originals'): forcing all-ones made mocks from datasets
        # with excluded annuli (exposure 0 -> pred 0 for every theta)
        # -inf everywhere
        replace["xray_data"] = dataclasses.replace(
            xr, counts=jnp.asarray(xr_counts, dtype=xr.counts.dtype),
            counts_filled=jnp.asarray(xr_counts, dtype=xr.counts.dtype))

    return MockObservation(
        model=dataclasses.replace(model, **replace),
        theta_true=theta,
        sz_flux=sz_flux, sz_flux_true=sz_true,
        xray_counts=xr_counts, xray_pred_true=xr_true,
    )


@dataclasses.dataclass
class MockSurvey:
    """C independent mock clusters stacked for the multicluster paths."""
    sz_stack: object | None             # stacked SZData (leading C axis)
    xray_stack: object | None           # stacked XrayData (leading C axis)
    mocks: list                         # per-cluster MockObservation
    thetas_true: np.ndarray             # (C, ndim) generating vectors


def simulate_survey(model, thetas, rng, *, sz_noise: bool = True,
                    xray_noise: bool = True) -> MockSurvey:
    """Simulate a survey: one mock observation per row of ``thetas``
    (shape (C, ndim)), all through ``model``'s instrument configuration,
    stacked ready for ``make_multicluster_log_like`` /
    ``make_multicluster_step_kernel``.

    Homogeneous-instrument assumption (same beam/TF/response/annuli for
    every cluster) — the same assumption the stacked likelihood itself
    makes; heterogeneous surveys need one model per cluster and the
    nested (flatten=False) path.
    """
    from joxsz_tpu.models.multicluster import stack_sz_data, stack_xray_data

    thetas = np.atleast_2d(np.asarray(thetas, dtype=float))
    mocks = [simulate_observation(model, t, rng, sz_noise=sz_noise,
                                  xray_noise=xray_noise) for t in thetas]
    sz_stack = (stack_sz_data([m.model.sz_data for m in mocks])
                if model.sz_data is not None else None)
    xr_stack = (stack_xray_data([m.model.xray_data for m in mocks])
                if model.xray_data is not None else None)
    return MockSurvey(sz_stack=sz_stack, xray_stack=xr_stack,
                      mocks=mocks, thetas_true=thetas)
