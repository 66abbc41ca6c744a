"""No-U-Turn sampler (NUTS) on the joint posterior, device-resident.

The differentiable fused likelihood enables gradient-based sampling (the
reference's black-box scipy pipeline could not); HMC (sampling/hmc.py)
requires hand-tuning the trajectory length, NUTS adapts it per
transition by doubling the trajectory until the path starts to turn back
on itself (Hoffman & Gelman 2014).

TPU-first formulation — the textbook recursion is replaced by the
ITERATIVE tree build (the checkpoint-stack scheme of Phan & Pradhan,
arXiv:1912.11554) so the whole transition compiles to static control
flow:

  * one `lax.while_loop` over doublings (exits when every chain is done),
  * one `lax.fori_loop` over the 2^depth leapfrogs of the new subtree,
  * U-turn checks of ALL balanced subtrees via a (max_depth+1)-slot
    checkpoint stack: leaf j stores into slot popcount(j) when j is even
    and checks slots [popcount(j)-t, popcount(j)-1] when j is odd
    (t = number of trailing one-bits of j) — an O(log) -memory exact
    equivalent of the recursive check,
  * progressive multinomial sampling within the subtree and biased
    progressive sampling across doublings (Betancourt 2017),
  * every chain advances in the same batched program; finished chains
    freeze behind masks (chains play the role walkers play for the
    stretch sampler).

Direction handling: a backward-integrated endpoint's momentum is the
true forward-time momentum at that point (backward leapfrog is the exact
inverse of forward leapfrog), so the global U-turn criterion uses
time-ordered endpoints with as-produced momenta, while within a subtree
the stream-order displacement is direction-adjusted (dx * s).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class NUTSResult:
    chain: np.ndarray             # (n_saved, n_chains, ndim)
    log_prob: np.ndarray          # (n_saved, n_chains)
    mean_accept_prob: float       # dual-averaging statistic over sampling
    mean_tree_depth: float
    step_size: float
    final_state: tuple


_DIVERGENCE = 1000.0              # energy-error threshold


def _nuts_transition(lp_b, grad_b, x, lp, eps, mass, key,
                     max_depth: int):
    """One batched NUTS transition: x (C, D), lp (C,) -> new (x, lp) plus
    (mean accept prob, tree depth) per chain."""
    C, D = x.shape
    dtype = x.dtype
    inv_mass = 1.0 / mass
    K = max_depth + 1

    kp, kloop = jax.random.split(key)
    p0 = jax.random.normal(kp, (C, D), dtype=dtype) * jnp.sqrt(mass)
    ke0 = 0.5 * jnp.sum(p0 * p0 * inv_mass, axis=-1)
    w0 = lp - ke0                                     # canonical logweight

    def vdot(a, b):
        return jnp.sum(a * inv_mass * b, axis=-1)

    def leapfrog1(xc, pc, eps_dir):
        pc = pc + 0.5 * eps_dir[:, None] * grad_b(xc)
        xc = xc + eps_dir[:, None] * inv_mass * pc
        pc = pc + 0.5 * eps_dir[:, None] * grad_b(xc)
        return xc, pc

    init = dict(
        xl=x, pl=p0, xr=x, pr=p0,
        xprop=x, lpprop=lp, wlog=w0,
        done=jnp.zeros(C, bool), depth=jnp.zeros((), jnp.int32),
        sum_alpha=jnp.zeros(C, dtype), n_alpha=jnp.zeros(C, dtype),
        depth_reached=jnp.zeros(C, jnp.int32),
    )

    def cond(st):
        return (st["depth"] < max_depth) & ~jnp.all(st["done"])

    def doubling(st):
        d = st["depth"]
        kdir, ksub = jax.random.split(jax.random.fold_in(kloop, d))
        s = jnp.where(jax.random.bernoulli(kdir, 0.5, (C,)), 1.0,
                      -1.0).astype(dtype)
        start_x = jnp.where((s > 0)[:, None], st["xr"], st["xl"])
        start_p = jnp.where((s > 0)[:, None], st["pr"], st["pl"])
        n_leaf = jnp.int32(1) << d

        sub = dict(
            cx=start_x, cp=start_p,                       # stream cursor
            sx=start_x, slp=st["lpprop"],                 # subtree proposal
            wsub=jnp.full((C,), -jnp.inf, dtype),
            turning=jnp.zeros(C, bool), diverged=jnp.zeros(C, bool),
            sum_alpha=jnp.zeros(C, dtype), n_alpha=jnp.zeros(C, dtype),
            ckpt_x=jnp.zeros((K, C, D), dtype),
            ckpt_p=jnp.zeros((K, C, D), dtype),
        )

        def leaf(j, sub):
            frozen = st["done"] | sub["turning"] | sub["diverged"]
            nx, np_ = leapfrog1(sub["cx"], sub["cp"], s * eps)
            nlp = lp_b(nx)
            w = nlp - 0.5 * jnp.sum(np_ * np_ * inv_mass, axis=-1)
            w = jnp.where(jnp.isnan(w), -jnp.inf, w)
            diverged = sub["diverged"] | (~frozen & (w0 - w > _DIVERGENCE))

            # progressive multinomial sampling within the subtree
            wnew = jnp.logaddexp(sub["wsub"], w)
            ku = jax.random.fold_in(ksub, j)
            take = (jnp.log(jax.random.uniform(ku, (C,), dtype=dtype))
                    < (w - wnew))
            take = take & ~frozen & ~diverged
            sx = jnp.where(take[:, None], nx, sub["sx"])
            slp = jnp.where(take, nlp, sub["slp"])
            wsub = jnp.where(frozen | diverged, sub["wsub"], wnew)

            # NaN guard mirroring hmc.py's log_ratio guard: a chain
            # started at lp = -inf has w0 = -inf, and w - w0 = NaN
            # would poison the CROSS-CHAIN mean(alpha) fed to the
            # shared dual-averaging step size — NaN-ing every chain
            ratio = w - w0
            alpha = jnp.minimum(
                jnp.exp(jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)),
                1.0)
            sum_alpha = sub["sum_alpha"] + jnp.where(frozen, 0.0, alpha)
            n_alpha = sub["n_alpha"] + jnp.where(frozen, 0.0, 1.0)

            # ---- checkpoint-stack U-turn checks -------------------------
            even = (j & 1) == 0
            slot = jax.lax.population_count(j)
            ckpt_x = jax.lax.cond(
                even,
                lambda: jax.lax.dynamic_update_slice(
                    sub["ckpt_x"], nx[None],
                    (slot, jnp.int32(0), jnp.int32(0))),
                lambda: sub["ckpt_x"])
            ckpt_p = jax.lax.cond(
                even,
                lambda: jax.lax.dynamic_update_slice(
                    sub["ckpt_p"], np_[None],
                    (slot, jnp.int32(0), jnp.int32(0))),
                lambda: sub["ckpt_p"])
            t = jax.lax.population_count(j & ~(j + 1))    # trailing ones
            pc = jax.lax.population_count(j)
            idx_min, idx_max = pc - t, pc - 1
            turning = sub["turning"]
            for k in range(K):
                active = (~even) & (k >= idx_min) & (k <= idx_max)
                # stream-order displacement carries ONE direction factor;
                # momenta stay as produced (they are forward-time momenta)
                dxs = (nx - ckpt_x[k]) * s[:, None]
                turn_k = ((vdot(dxs, ckpt_p[k]) < 0)
                          | (vdot(dxs, np_) < 0))
                turning = turning | (active & turn_k & ~frozen & ~diverged)

            keep = ~frozen
            out = dict(
                cx=jnp.where(keep[:, None], nx, sub["cx"]),
                cp=jnp.where(keep[:, None], np_, sub["cp"]),
                sx=sx, slp=slp, wsub=wsub,
                turning=turning, diverged=diverged,
                sum_alpha=sum_alpha, n_alpha=n_alpha,
                ckpt_x=ckpt_x, ckpt_p=ckpt_p,
            )
            return out

        sub = jax.lax.fori_loop(0, n_leaf, leaf, sub)

        invalid = sub["turning"] | sub["diverged"]
        newly_done = ~st["done"] & invalid
        merge = ~st["done"] & ~invalid

        # biased progressive sampling across doublings
        ka = jax.random.fold_in(kloop, 1000 + d)
        take = (jnp.log(jax.random.uniform(ka, (C,), dtype=dtype))
                < (sub["wsub"] - st["wlog"]))
        take = take & merge
        xprop = jnp.where(take[:, None], sub["sx"], st["xprop"])
        lpprop = jnp.where(take, sub["slp"], st["lpprop"])
        wlog = jnp.where(merge, jnp.logaddexp(st["wlog"], sub["wsub"]),
                         st["wlog"])

        # extend the time-ordered trajectory endpoints on side s
        fwd = (s > 0) & merge
        bwd = (s <= 0) & merge
        xr = jnp.where(fwd[:, None], sub["cx"], st["xr"])
        pr = jnp.where(fwd[:, None], sub["cp"], st["pr"])
        xl = jnp.where(bwd[:, None], sub["cx"], st["xl"])
        pl = jnp.where(bwd[:, None], sub["cp"], st["pl"])

        # global U-turn across the full trajectory (time-ordered, with
        # as-produced momenta — see module docstring)
        dx = xr - xl
        gturn = (vdot(dx, pl) < 0) | (vdot(dx, pr) < 0)
        done = st["done"] | newly_done | (merge & gturn)

        return dict(
            xl=xl, pl=pl, xr=xr, pr=pr,
            xprop=xprop, lpprop=lpprop, wlog=wlog,
            done=done, depth=d + 1,
            sum_alpha=st["sum_alpha"] + sub["sum_alpha"],
            n_alpha=st["n_alpha"] + sub["n_alpha"],
            depth_reached=st["depth_reached"]
            + (~st["done"]).astype(jnp.int32),
        )

    st = jax.lax.while_loop(cond, doubling, init)
    alpha = st["sum_alpha"] / jnp.maximum(st["n_alpha"], 1.0)
    return st["xprop"], st["lpprop"], alpha, st["depth_reached"]


def run_nuts(
    log_prob,                      # scalar theta -> log prob
    p0: jnp.ndarray,               # (n_chains, D)
    n_steps: int,
    key: jax.Array,
    n_warmup: int = 500,
    max_depth: int = 8,
    target_accept: float = 0.8,
    init_step_size: float = 0.01,
    mass_diag: np.ndarray | None = None,
    adapt_mass: bool = True,
    thin: int = 1,
) -> NUTSResult:
    """Batched NUTS with dual-averaging step-size warmup and (optional)
    windowed diagonal mass adaptation, mirroring sampling/hmc.py."""
    p0 = jnp.asarray(p0)
    C, D = p0.shape
    dtype = p0.dtype
    from .stretch import validate_schedule

    validate_schedule(n_steps, thin)

    from .adapt import make_safe_lp_grad

    lp_b, grad_b = make_safe_lp_grad(log_prob)

    if mass_diag is None:
        mass_diag = 1.0 / (jnp.var(p0, axis=0) + 1e-12)
    mass0 = jnp.asarray(mass_diag, dtype=dtype)

    transition = partial(_nuts_transition, lp_b, grad_b,
                         max_depth=max_depth)

    @jax.jit
    def sample(x, lp, eps, mass, rkey):
        n_saved = n_steps // thin

        def outer(carry, k):
            x, lp, asum, dsum = carry

            def inner(c, kk):
                x, lp, asum, dsum = c
                x, lp, alpha, depth = transition(x, lp, eps, mass, kk)
                return (x, lp, asum + jnp.mean(alpha),
                        dsum + jnp.mean(depth.astype(x.dtype))), None

            keys = jax.random.split(k, thin)
            (x, lp, asum, dsum), _ = jax.lax.scan(
                inner, (x, lp, asum, dsum), keys)
            return (x, lp, asum, dsum), (x, lp)

        keys = jax.random.split(rkey, n_saved)
        (x, lp, asum, dsum), saved = jax.lax.scan(
            outer, (x, lp, jnp.zeros((), dtype), jnp.zeros((), dtype)),
            keys)
        return (x, lp, asum, dsum), saved

    # --- warmup: the shared dual-averaging + mass-window scaffold ----------
    from .adapt import dual_averaging_warmup

    def _warm_transition(x, lp, eps, mass, k):
        x, lp, alpha, _ = transition(x, lp, eps, mass, k)
        return x, lp, alpha

    k1, k1b, k2 = jax.random.split(key, 3)
    lp0 = lp_b(p0)
    x, lp, eps, mass = dual_averaging_warmup(
        _warm_transition, p0, lp0, mass0, (k1, k1b), n_warmup,
        init_step_size=init_step_size, target_accept=target_accept,
        adapt_mass=adapt_mass, dtype=dtype)
    (x, lp, asum, dsum), (chain, logp) = sample(x, lp, eps, mass, k2)
    n_trans = max(n_steps, 1)
    return NUTSResult(
        chain=np.asarray(chain),
        log_prob=np.asarray(logp),
        mean_accept_prob=float(asum) / n_trans,
        mean_tree_depth=float(dsum) / n_trans,
        step_size=float(eps),
        final_state=(x, lp),
    )
