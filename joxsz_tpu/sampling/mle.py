"""Maximum-likelihood warm start for the sampler.

Replaces the reference's ``fit.doFitting()`` (mbproj2's iterated
Nelder-Mead maximisation of the joint likelihood,
/root/reference/joxsz_main.py:191, SURVEY.md §3.2).  The jitted likelihood
makes each objective call ~0.1 ms, so a host-driven scipy optimisation is
effectively free; we run Nelder-Mead restarts (robust to the -inf veto
regions) followed by an L-BFGS-B polish using jax.grad where the
neighbourhood is finite.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from scipy import optimize


def find_mle(
    log_like,
    theta0: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    max_restarts: int = 5,
    xtol: float = 1e-6,
    ftol: float = 1e-6,
    verbose: bool = False,
) -> tuple[np.ndarray, float]:
    """Maximise ``log_like`` from ``theta0``; returns (theta_hat, ll_hat).

    Mirrors mbproj2's strategy of repeating simplex fits until the
    statistic stops improving, then adds a gradient polish."""
    ll_jit = jax.jit(log_like)
    grad_jit = jax.jit(jax.grad(log_like))

    def neg_ll(x):
        v = float(ll_jit(jnp.asarray(x)))
        return 1e30 if not np.isfinite(v) else -v

    best_x = np.asarray(theta0, dtype=float)
    best_f = neg_ll(best_x)
    if best_f >= 1e30:
        raise ValueError("starting point has non-finite likelihood")

    for it in range(max_restarts):
        res = optimize.minimize(
            neg_ll, best_x, method="Nelder-Mead",
            options={"xatol": xtol, "fatol": ftol, "maxiter": 4000,
                     "adaptive": True},
        )
        if verbose:
            print(f"  simplex restart {it}: -ll {res.fun:.4f}")
        if res.fun < best_f - 1e-4:
            best_f, best_x = res.fun, res.x
        else:
            if res.fun < best_f:
                best_f, best_x = res.fun, res.x
            break

    # gradient polish inside the box (guard against veto boundaries)
    def neg_ll_grad(x):
        xj = jnp.asarray(x)
        v = float(ll_jit(xj))
        if not np.isfinite(v):
            return 1e30, np.zeros_like(x)
        g = np.asarray(grad_jit(xj), dtype=float)
        if not np.all(np.isfinite(g)):
            return -v, np.zeros_like(x)
        return -v, -g

    eps = 1e-9
    bounds = [(l + eps, h - eps) for l, h in zip(lo, hi)]
    res = optimize.minimize(
        neg_ll_grad, np.clip(best_x, lo + eps, hi - eps), jac=True,
        method="L-BFGS-B", bounds=bounds,
        options={"maxiter": 500, "ftol": 1e-12},
    )
    if res.fun < best_f:
        best_f, best_x = res.fun, res.x
    if verbose:
        print(f"  MLE log-like: {-best_f:.4f}")
    return np.asarray(best_x), -best_f
