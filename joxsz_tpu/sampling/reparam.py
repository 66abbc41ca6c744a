"""Nonlinear sampling-space reparametrization (opt-in).

The Goodman-Weare stretch move is affine-invariant, so linear
correlations cost nothing — but the CL J1226 joint posterior's
worst-mixing direction is the CURVED (a, b, r_p) gNFW shape degeneracy
(docs/PERFORMANCE.md), which no affine move can straighten.  Sampling in
``u_i = log(theta_i)`` for the strictly-positive shape parameters bends
power-law-like ridges toward straight lines, which the affine move then
handles for free.

The transform targets the SAME posterior: the wrapped log-density is

    lp_u(u) = lp_theta(exp(u)) + sum_{i in mask} u_i

(the log-Jacobian of theta = exp(u)), and chains are mapped back to
theta-space before analysis, so summaries/plots are unchanged in
distribution.  This machinery has no reference analog (emcee samples the
raw vector; reference /root/reference/joxsz_funcs.py:548-635) — it is an
optional mixing accelerator, off by default for reference parity.

Pallas step kernels are specialised to theta-space likelihoods, so
reparametrized sampling runs through the XLA scan sampler.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# sensible default for the CL J1226 parameter set: the gNFW shape
# parameters spanning the curved degeneracy (all with strictly positive
# or zero lower bounds and posteriors away from 0)
DEFAULT_LOG_PARAMS = ("P_0", "a", "b", "r_p")


class LogReparam:
    """Elementwise exp/log bijection on a subset of parameters.

    ``names``: parameter names to log-transform.  Names absent from the
    thawed set are ignored (e.g. an SZ-only fit that froze some);
    transformed parameters must have a non-negative lower bound
    (theta = exp(u) > 0 always satisfies lo <= 0 vacuously, and the box
    prior inside the likelihood still enforces the exact bounds).
    """

    def __init__(self, params, names=DEFAULT_LOG_PARAMS):
        thawed = list(params.thawed)
        mask = np.zeros(len(thawed), dtype=bool)
        for i, n in enumerate(thawed):
            if n in names:
                if params.lo[i] < 0:
                    raise ValueError(
                        f"cannot log-transform {n!r}: lower bound "
                        f"{params.lo[i]} < 0")
                mask[i] = True
        if not mask.any():
            raise ValueError(f"none of {names} are thawed")
        self.names = tuple(n for n in thawed if n in names)
        self._mask = jnp.asarray(mask)

    def fwd(self, theta):
        """theta-space -> sampling space (log on masked coords).
        Masked coordinates at exactly 0 map to -inf; callers start from
        interior points (MLE/walker clouds), which are positive."""
        theta = jnp.asarray(theta)
        return jnp.where(self._mask, jnp.log(jnp.where(self._mask, theta,
                                                       1.0)), theta)

    def inv(self, u):
        u = jnp.asarray(u)
        return jnp.where(self._mask, jnp.exp(jnp.where(self._mask, u,
                                                       0.0)), u)

    def log_jacobian(self, u):
        """log |d theta / d u| = sum of masked u (theta = exp(u))."""
        u = jnp.asarray(u)
        return jnp.sum(jnp.where(self._mask, u, 0.0), axis=-1)

    def wrap_log_prob_batch(self, log_prob_batch):
        """Batched theta-space log-prob -> batched u-space log-prob
        targeting the same theta-posterior (Jacobian-corrected)."""

        def lp_u(U):
            return log_prob_batch(self.inv(U)) + self.log_jacobian(U)

        return lp_u

    def chain_to_theta(self, chain):
        """Map a (n_saved, W, D) u-space chain back to theta-space.

        Pure numpy on purpose: an elementwise exp on a few columns of a
        possibly-hundreds-of-MB recorded chain must not round-trip the
        array through the device (the remote tunnel moves ~20 MB/s)."""
        chain = np.asarray(chain)
        mask = np.asarray(self._mask)
        return np.where(mask, np.exp(np.where(mask, chain, 0.0)), chain)
