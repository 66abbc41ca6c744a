"""Prior-measure utilities: exact draws from the normalized joint prior
and a Monte-Carlo estimate of its log-normalization.

The framework's prior (models/params.py::ParamSet.log_prior plus the
structural vetoes folded into ``JointModel.log_prior_only`` — the
density's r_c <= r_s shape prior and the physical-mass monotonicity
veto, reference semantics /root/reference/joxsz_funcs.py:397-407 and
:522-525) is *unnormalized*: box parameters contribute 0 inside
[lo, hi], Gaussian-prior parameters contribute -0.5 z^2 without the
1/sqrt(2*pi*sigma^2) constant, and the vetoes are pure {0, -inf}
indicators coupling several parameters.

Two consumers need the normalized measure:

* **simulation-based calibration** (sampling/sbc.py): theta* ~ prior;
* **evidence cross-checks** (sampling/laplace.py): the Laplace evidence
  integrates the unnormalized density, while the stepping-stone ladder
  (sampling/evidence.py) is normalized by construction — comparing the
  two requires log of the prior's normalization constant.

Both are served exactly by one observation: with the product proposal
q(theta) = prod_box U(lo, hi) x prod_gauss N(mu, sigma), the ratio
exp(log_prior - log q) is CONSTANT wherever the prior is finite,

    exp(log_prior - log q) = prod_box (hi - lo)
                             * prod_gauss sqrt(2 pi) sigma
                             * 1{support},

because the Gaussian exponents cancel and the indicators are 0/-inf.
Hence rejection on support gives *exact* prior draws (no weighting), and
the normalization integral collapses to

    log Z_prior = sum_box log(hi - lo) + sum_gauss log(sqrt(2 pi) sigma)
                  + log E_q[1{support}],

i.e. the analytic product constant plus the log acceptance rate.
"""

from __future__ import annotations

import numpy as np


def _check_product_proposal(params) -> float:
    """Validate that the product proposal covers the prior and return
    its analytic log-constant (the support-free part of log Z_prior)."""
    lo, hi = np.asarray(params.lo, float), np.asarray(params.hi, float)
    is_g = np.asarray(params.is_gauss, bool)
    sigma = np.asarray(params.sigma, float)
    box = ~is_g
    if not (np.all(np.isfinite(lo[box])) and np.all(np.isfinite(hi[box]))):
        raise ValueError(
            "box-prior parameters must have finite bounds to sample the "
            "prior (an improper uniform prior has no normalization)")
    if np.any(hi[box] <= lo[box]):
        raise ValueError("box-prior parameter with hi <= lo")
    return float(np.sum(np.log(hi[box] - lo[box]))
                 + np.sum(np.log(np.sqrt(2 * np.pi) * sigma[is_g])))


def product_prior_draws(params, n: int, rng: np.random.Generator,
                        dtype=np.float64) -> np.ndarray:
    """(n, ndim) draws from the product proposal q: uniform on each box
    parameter, untruncated N(mu, sigma) on each Gaussian-prior parameter.
    These are NOT yet prior draws — the structural vetoes (and any box
    truncation of Gaussian parameters) still need rejection; use
    ``sample_prior`` for exact draws."""
    _check_product_proposal(params)
    lo, hi = np.asarray(params.lo, float), np.asarray(params.hi, float)
    is_g = np.asarray(params.is_gauss, bool)
    out = np.empty((n, params.ndim), dtype=dtype)
    box = ~is_g
    out[:, box] = rng.uniform(lo[box], hi[box], size=(n, int(box.sum())))
    out[:, is_g] = rng.normal(np.asarray(params.mu, float)[is_g],
                              np.asarray(params.sigma, float)[is_g],
                              size=(n, int(is_g.sum())))
    return out


def sample_prior(log_prior_batch, params, n: int,
                 rng: np.random.Generator, max_tries: int = 64,
                 batch: int | None = None, dtype=np.float64) -> np.ndarray:
    """(n, ndim) EXACT draws from the normalized (veto-restricted) prior.

    ``log_prior_batch``: (N, D) -> (N,) unnormalized log-prior including
    every support restriction — for a JointModel,
    ``jax.jit(jax.vmap(model.log_prior_only))``.  Rejection on finiteness
    is exact because the prior/proposal ratio is constant on support
    (module docstring)."""
    if n <= 0:
        raise ValueError(f"n ({n}) must be positive")
    _check_product_proposal(params)
    batch = max(n, 256) if batch is None else batch
    kept: list[np.ndarray] = []
    have = 0
    for _ in range(max_tries):
        cand = product_prior_draws(params, batch, rng, dtype=dtype)
        finite = np.isfinite(np.asarray(log_prior_batch(cand)))
        if finite.any():
            kept.append(cand[finite])
            have += int(finite.sum())
        if have >= n:
            return np.concatenate(kept, axis=0)[:n]
    raise RuntimeError(
        f"prior rejection sampling got {have}/{n} draws in {max_tries} "
        f"batches of {batch}: the vetoes leave a tiny support fraction — "
        "raise max_tries/batch or check the prior configuration")


def prior_log_norm(log_prior_batch, params, n_samples: int,
                   rng: np.random.Generator) -> tuple[float, float]:
    """Monte-Carlo estimate of log Z_prior = log integral of
    exp(log_prior) d theta, with its standard error (on the log).

    Returns (log_norm, log_norm_err).  The MC part is only the support
    acceptance rate under the product proposal; the rest is analytic
    (module docstring).  Error propagates the binomial rate:
    err(log p) = sqrt((1-p)/(n p))."""
    if n_samples <= 0:
        raise ValueError(f"n_samples ({n_samples}) must be positive")
    const = _check_product_proposal(params)
    cand = product_prior_draws(params, n_samples, rng)
    n_ok = int(np.isfinite(np.asarray(log_prior_batch(cand))).sum())
    if n_ok == 0:
        return float("-inf"), float("inf")
    p = n_ok / n_samples
    return const + float(np.log(p)), float(np.sqrt((1 - p) / n_ok))
