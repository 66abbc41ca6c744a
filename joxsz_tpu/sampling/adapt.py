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
