"""Laplace approximation: MAP + exact autodiff Hessian -> Gaussian
posterior summary and a closed-form evidence estimate.

Capability beyond the reference (its numpy/emcee stack has no autodiff;
SURVEY §2.3): ``jax.hessian`` gives the exact curvature of the joint
log-posterior at the MAP in one call, yielding

* instant covariance / error-bar estimates before any MCMC (seconds vs
  minutes — useful for survey triage and sampler initialization),
* a Laplace log-evidence
  log Z ~= log p(MAP) + D/2 log(2 pi) - 1/2 log det(-H)
  that cross-checks the stepping-stone ladder (sampling/evidence.py),
* the curvature scales HMC/NUTS mass-matrix adaptation starts from.

Normalization semantics: ``JointModel.log_like`` is the UNnormalized
posterior density (reference ``getLikelihood`` semantics — box priors
contribute 0 inside bounds), so ``log_z`` integrates that same measure.
The stepping-stone estimator is normalized w.r.t. the veto-restricted
prior by construction; ``model_laplace`` therefore subtracts the prior
log-normalization (sampling/priors.py) to report a directly comparable
``log_z_normalized``.

Boundary caveat, handled explicitly: a MAP pinned at a box bound or veto
edge makes -H indefinite/singular there. The eigenvalues of -H and a
per-parameter ``at_boundary`` mask are reported; ``ok`` is False when
the Gaussian is improper, in which case ``cov``/``log_z`` are NaN rather
than silently pseudo-inverted.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .mle import find_mle


@dataclasses.dataclass
class LaplaceResult:
    theta_map: np.ndarray          # (D,) posterior mode
    log_post_map: float            # unnormalized log-posterior at the mode
    hessian: np.ndarray            # (D, D) of the log-posterior at the mode
    eigenvalues: np.ndarray        # of -H, ascending (all > 0 iff proper)
    cov: np.ndarray                # (D, D) inv(-H); NaN if not ok
    sd: np.ndarray                 # (D,) sqrt(diag cov); NaN if not ok
    log_z: float                   # Laplace evidence, same measure as log_post
    ok: bool                       # -H positive definite
    at_boundary: np.ndarray        # (D,) bool: mode within rtol of a box bound
    sd_conditional: np.ndarray = None   # (D,) interior-subspace sd (boundary
    #   directions NaN): from inverting -H restricted to the non-boundary
    #   parameters, i.e. error bars conditional on the pinned values
    log_z_normalized: float | None = None   # vs the normalized prior
    prior_log_norm: float | None = None
    prior_log_norm_err: float | None = None

    @property
    def correlation(self) -> np.ndarray:
        d = np.sqrt(np.diag(self.cov))
        return self.cov / np.outer(d, d)


def laplace_approximation(log_post, theta_map, lo=None, hi=None,
                          boundary_rtol: float = 1e-4) -> LaplaceResult:
    """Laplace approximation around a known mode ``theta_map``.

    ``log_post``: differentiable scalar function of the flat parameter
    vector (for a JointModel, ``model.log_like``).  Run in float64
    (jax_enable_x64) — a second-derivative stencil through the full
    forward model is meaningless at f32 precision."""
    theta_map = jnp.asarray(theta_map)
    if theta_map.dtype != jnp.float64:
        import warnings

        warnings.warn("laplace_approximation on a non-float64 vector: "
                      "the Hessian of the full forward model loses most "
                      "of its digits below f64", stacklevel=2)
    D = theta_map.shape[0]
    lp_map = float(log_post(theta_map))
    if not np.isfinite(lp_map):
        raise ValueError("log_post(theta_map) is not finite — the mode "
                         "must lie inside the prior support")
    H = np.asarray(jax.hessian(log_post)(theta_map), dtype=float)
    H = 0.5 * (H + H.T)                       # symmetrize roundoff
    eigvals = np.linalg.eigvalsh(-H)          # ascending
    ok = bool(np.all(np.isfinite(eigvals)) and eigvals[0] > 0.0)

    if ok:
        cov = np.linalg.inv(-H)
        cov = 0.5 * (cov + cov.T)
        sd = np.sqrt(np.diag(cov))
        log_z = lp_map + 0.5 * D * np.log(2 * np.pi) \
            - 0.5 * float(np.sum(np.log(eigvals)))
    else:
        cov = np.full((D, D), np.nan)
        sd = np.full((D,), np.nan)
        log_z = float("nan")

    at_boundary = np.zeros((D,), dtype=bool)
    if lo is not None and hi is not None:
        lo = np.asarray(lo, float)
        hi = np.asarray(hi, float)
        tm = np.asarray(theta_map, float)
        span = np.where(np.isfinite(hi - lo), hi - lo,
                        np.maximum(np.abs(tm), 1.0))
        tol = boundary_rtol * span
        at_boundary = ((np.isfinite(lo) & (tm - lo < tol))
                       | (np.isfinite(hi) & (hi - tm < tol)))

    # conditional error bars on the interior subspace: a boundary-pinned
    # mode makes the FULL -H indefinite, but the curvature restricted to
    # the non-pinned directions (holding the pinned values fixed) is
    # typically proper and is exactly what a quick-look needs
    sd_cond = np.full((D,), np.nan)
    interior = ~at_boundary
    if ok:
        sd_cond = sd.copy()
    elif interior.any():
        Hi = -H[np.ix_(interior, interior)]
        ev = np.linalg.eigvalsh(Hi)
        if np.all(np.isfinite(ev)) and ev[0] > 0.0:
            sd_cond[interior] = np.sqrt(np.diag(np.linalg.inv(Hi)))

    return LaplaceResult(
        theta_map=np.asarray(theta_map, float), log_post_map=lp_map,
        hessian=H, eigenvalues=eigvals, cov=cov, sd=sd, log_z=log_z,
        ok=ok, at_boundary=at_boundary, sd_conditional=sd_cond)


def laplace_fit(log_post, theta0, lo, hi, verbose: bool = False,
                **mle_kwargs) -> LaplaceResult:
    """MAP search (sampling/mle.py simplex+L-BFGS strategy) followed by
    the Laplace approximation at the found mode.

    The MAP must be POLISHED here: the curvature classification (PD vs
    boundary vs indefinite) is evaluated at the found point, and the
    sampler-warm-start stall rule (restart_tol=0.3 ll units, r5) leaves
    the mode rough enough to flip interior directions non-PD — so this
    caller restores the tight stall unless overridden."""
    mle_kwargs.setdefault("restart_tol", 1e-4)
    theta_map, _ = find_mle(log_post, np.asarray(theta0, float),
                            np.asarray(lo, float), np.asarray(hi, float),
                            verbose=verbose, **mle_kwargs)
    return laplace_approximation(log_post, theta_map, lo=lo, hi=hi)


def model_laplace(model, theta0=None, n_prior_samples: int = 200_000,
                  seed: int = 0, verbose: bool = False,
                  **mle_kwargs) -> LaplaceResult:
    """Laplace approximation of a JointModel's posterior, with the prior
    log-normalization estimated by MC (sampling/priors.py) so
    ``log_z_normalized`` is directly comparable to
    ``model_evidence(model).log_z`` (both w.r.t. the normalized,
    veto-restricted prior)."""
    from .priors import prior_log_norm

    if theta0 is None:
        theta0 = model.params.thawed_values()
    res = laplace_fit(model.log_like, theta0, model.params.lo,
                      model.params.hi, verbose=verbose, **mle_kwargs)
    lpri = jax.jit(jax.vmap(model.log_prior_only))
    ln, ln_err = prior_log_norm(lpri, model.params, n_prior_samples,
                                np.random.default_rng(seed))
    res.prior_log_norm = ln
    res.prior_log_norm_err = ln_err
    res.log_z_normalized = res.log_z - ln
    return res
