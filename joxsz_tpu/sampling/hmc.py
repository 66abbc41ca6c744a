"""Hamiltonian Monte Carlo on the joint posterior (device-resident).

The fused likelihood is differentiable end-to-end (matmuls, lerps,
elementwise physics; the -inf vetoes are flat outside their boundaries),
which enables gradient-based sampling — something the reference's
black-box scipy pipeline could never do.  This module provides vmapped
multi-chain HMC:

  * leapfrog integration with a diagonal mass matrix,
  * vetoed regions handled by rejection (a trajectory entering a -inf
    region has infinite energy error and is rejected; gradients at valid
    points are finite),
  * dual-averaging step-size adaptation (Hoffman & Gelman 2014) toward a
    target acceptance during warmup,
  * all chains advance as one batched lax.scan — chains play the role
    walkers play for the stretch sampler.

For heavily multimodal targets combine with tempering; HMC shines on the
smooth, correlated core of the posterior where the stretch move's
isotropic proposals mix slowly.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class HMCResult:
    chain: np.ndarray             # (n_saved, n_chains, ndim)
    log_prob: np.ndarray          # (n_saved, n_chains)
    acceptance_fraction: np.ndarray
    step_size: float
    final_state: tuple


def _leapfrog(grad_fn, x, p, eps, inv_mass, n_steps):
    """n_steps leapfrog steps; returns (x', p')."""

    def body(_, carry):
        x, p = carry
        p = p + 0.5 * eps * grad_fn(x)
        x = x + eps * inv_mass * p
        p = p + 0.5 * eps * grad_fn(x)
        return (x, p)

    return jax.lax.fori_loop(0, n_steps, body, (x, p))


def run_hmc(
    log_prob,                      # scalar theta -> log prob
    p0: jnp.ndarray,               # (n_chains, D)
    n_steps: int,
    key: jax.Array,
    n_warmup: int = 500,
    n_leapfrog: int = 16,
    target_accept: float = 0.8,
    init_step_size: float = 0.01,
    mass_diag: np.ndarray | None = None,
    adapt_mass: bool = False,
    thin: int = 1,
) -> HMCResult:
    """Batched HMC with dual-averaging warmup.

    ``mass_diag`` is the diagonal of the mass matrix (defaults to the
    inverse variance of the initial chain cloud).  With ``adapt_mass`` the
    warmup runs in two windows: after the first, the mass is re-estimated
    from the cross-chain position variance (the chains are independent, so
    their spread estimates the posterior covariance diagonal cheaply) and
    the step size is re-adapted in the second window."""
    p0 = jnp.asarray(p0)
    C, D = p0.shape
    dtype = p0.dtype
    from .stretch import validate_schedule

    validate_schedule(n_steps, thin)

    from .adapt import make_safe_lp_grad

    lp_b, grad_b = make_safe_lp_grad(log_prob)

    if mass_diag is None:
        var = jnp.var(p0, axis=0) + 1e-12
        mass_diag = 1.0 / var
    mass0 = jnp.asarray(mass_diag, dtype=dtype)

    def hmc_step(x, lp, eps, mass, k):
        inv_mass = 1.0 / mass
        kp, ku = jax.random.split(k)
        p = jax.random.normal(kp, x.shape, dtype=dtype) * jnp.sqrt(mass)
        x_new, p_new = _leapfrog(grad_b, x, p, eps, inv_mass, n_leapfrog)
        lp_new = lp_b(x_new)
        ke0 = 0.5 * jnp.sum(p * p * inv_mass, axis=-1)
        ke1 = 0.5 * jnp.sum(p_new * p_new * inv_mass, axis=-1)
        log_ratio = (lp_new - ke1) - (lp - ke0)
        log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
        u = jnp.log(jax.random.uniform(ku, (x.shape[0],), dtype=dtype))
        accept = u < log_ratio
        x = jnp.where(accept[:, None], x_new, x)
        lp = jnp.where(accept, lp_new, lp)
        a_prob = jnp.mean(jnp.minimum(jnp.exp(log_ratio), 1.0))
        return x, lp, accept, a_prob

    # --- sampling -----------------------------------------------------------
    @jax.jit
    def sample(x, lp, eps, mass, rkey):
        n_saved = n_steps // thin

        def outer(carry, k):
            x, lp, acc = carry

            def inner(c, kk):
                x, lp, acc = c
                x, lp, accepted, _ = hmc_step(x, lp, eps, mass, kk)
                return (x, lp, acc + accepted.astype(dtype)), None

            keys = jax.random.split(k, thin)
            (x, lp, acc), _ = jax.lax.scan(inner, (x, lp, acc), keys)
            return (x, lp, acc), (x, lp)

        keys = jax.random.split(rkey, n_saved)
        (x, lp, acc), saved = jax.lax.scan(
            outer, (x, lp, jnp.zeros(x.shape[0], dtype=dtype)), keys)
        return (x, lp, acc), saved

    # --- warmup: the shared dual-averaging + mass-window scaffold ----------
    from .adapt import dual_averaging_warmup

    def _warm_transition(x, lp, eps, mass, k):
        x, lp, _, a_prob = hmc_step(x, lp, eps, mass, k)
        return x, lp, a_prob

    k1, k1b, k2 = jax.random.split(key, 3)
    lp0 = lp_b(p0)
    x, lp, eps, mass = dual_averaging_warmup(
        _warm_transition, p0, lp0, mass0, (k1, k1b), n_warmup,
        init_step_size=init_step_size, target_accept=target_accept,
        adapt_mass=adapt_mass, dtype=dtype)
    (x, lp, acc), (chain, logp) = sample(x, lp, eps, mass, k2)
    return HMCResult(
        chain=np.asarray(chain),
        log_prob=np.asarray(logp),
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        step_size=float(eps),
        final_state=(x, lp),
    )
