"""Shared step-size adaptation: the Nesterov dual-averaging scheme of
Hoffman & Gelman 2014 (§3.2), used by both the HMC and NUTS warmups."""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 0.05
T0 = 10.0
KAPPA = 0.75


def dual_averaging_update(t, a_prob, h_bar, log_eps_bar, mu,
                          target_accept):
    """One dual-averaging update at (1-based) warmup step ``t`` given the
    step's mean acceptance statistic; returns the NEW
    (log_eps, log_eps_bar, h_bar)."""
    h_bar = ((1.0 - 1.0 / (t + T0)) * h_bar
             + (target_accept - a_prob) / (t + T0))
    log_eps = mu - jnp.sqrt(t) / GAMMA * h_bar
    w = t ** (-KAPPA)
    log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
    return log_eps, log_eps_bar, h_bar


def make_safe_lp_grad(log_prob):
    """Batched (vmapped) -inf-safe log-prob and gradient wrappers — the
    SINGLE implementation shared by HMC and NUTS (the pair had already
    diverged once: HMC gained a NaN guard NUTS lacked, r5 review)."""
    import jax

    def safe_lp(x):
        return jnp.where(jnp.isfinite(log_prob(x)), log_prob(x),
                         -jnp.inf)

    grad_one = jax.grad(lambda x: jnp.where(jnp.isfinite(log_prob(x)),
                                            log_prob(x), -1e12))
    return jax.vmap(safe_lp), jax.vmap(grad_one)


def dual_averaging_warmup(transition, p0, lp0, mass0, keys, n_warmup,
                          *, init_step_size, target_accept, adapt_mass,
                          dtype):
    """Dual-averaging step-size warmup with optional two-window diagonal
    mass adaptation — the shared HMC/NUTS scaffold.

    ``transition(x, lp, eps, mass, key) -> (x, lp, alpha)`` advances all
    chains one step and returns the acceptance statistic (scalar or
    per-chain; ``jnp.mean`` is applied).  ``keys`` is the (k1, k1b)
    pair (two windows, matching the callers' historical
    ``jax.random.split(key, 3)[:2]`` streams).  With ``adapt_mass`` and
    ``n_warmup >= 100`` the mass is re-estimated after the first half
    from the cross-chain position variance (the chains are independent,
    so their spread estimates the posterior covariance diagonal
    cheaply) and the step size is re-adapted in the second window.
    Returns ``(x, lp, eps, mass)``."""
    import jax
    from functools import partial

    mu = jnp.log(10.0 * init_step_size)

    @partial(jax.jit, static_argnums=(4,))
    def warmup(x, lp, mass, rkey, n):
        def body(carry, kt):
            x, lp, log_eps, log_eps_bar, h_bar = carry
            k, t = kt
            x, lp, alpha = transition(x, lp, jnp.exp(log_eps), mass, k)
            log_eps, log_eps_bar, h_bar = dual_averaging_update(
                t, jnp.mean(alpha), h_bar, log_eps_bar, mu,
                target_accept)
            return (x, lp, log_eps, log_eps_bar, h_bar), None

        ks = jax.random.split(rkey, n)
        ts = jnp.arange(1, n + 1, dtype=dtype)
        (x, lp, _, log_eps_bar, _), _ = jax.lax.scan(
            body, (x, lp, jnp.log(jnp.asarray(init_step_size, dtype)),
                   jnp.log(jnp.asarray(init_step_size, dtype)), 0.0),
            (ks, ts))
        return x, lp, jnp.exp(log_eps_bar)

    k1, k1b = keys
    mass = mass0
    if adapt_mass and n_warmup >= 100:
        n1 = n_warmup // 2
        x, lp, _ = warmup(p0, lp0, mass, k1, n1)
        mass = 1.0 / (jnp.var(x, axis=0) + 1e-12)
        x, lp, eps = warmup(x, lp, mass, k1b, n_warmup - n1)
    else:
        x, lp, eps = warmup(p0, lp0, mass, k1, n_warmup)
    return x, lp, eps, mass
