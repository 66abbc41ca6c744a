"""Batched independent stretch-move ensembles — C clusters x W walkers
in ONE jitted scan.

The general engine behind both simulation-based calibration
(``sampling.sbc``) and multi-cluster survey fits (``joxsz_tpu.survey``):
a (C, W, D) parameter block is advanced by C independent Goodman-Weare
ensembles whose likelihood is one batched callable
(C, W, D) -> (C, W) (see ``models.multicluster``), so every walker of
every cluster evaluates in a single device program.  The reference fits
one cluster per process (/root/reference/joxsz_main.py:93-246); this is
the TPU-native batch axis replacing that outer loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .stretch import stretch_half_update, validate_schedule


def batched_init(log_prob_batch_cluster, centers, n_walkers, key,
                 spread=0.05, max_tries=64, shrink_every=8):
    """(C, W, D) finite-likelihood init clouds around per-cluster
    centers — the batched generalisation of
    stretch.generate_init_positions (same additive floor for zero-valued
    coordinates).

    A center can sit arbitrarily close to a veto/box boundary where a
    fixed-spread cloud almost never lands in support, so unfinished
    clusters have their spread HALVED every ``shrink_every`` tries —
    the center itself is finite, so a small enough cloud always
    succeeds."""
    centers = jnp.asarray(centers)
    C, D = centers.shape
    scale0 = spread * jnp.maximum(jnp.abs(centers), 1e-2)   # (C, D)
    scale = scale0
    pos = jnp.zeros((C, n_walkers, D), dtype=centers.dtype)
    ok = jnp.zeros((C, n_walkers), dtype=bool)
    for t in range(max_tries):
        key, sub = jax.random.split(key)
        cand = centers[:, None, :] + scale[:, None, :] * jax.random.normal(
            sub, (C, n_walkers, D), dtype=centers.dtype)
        fine = jnp.isfinite(log_prob_batch_cluster(cand))
        take = fine & ~ok
        pos = jnp.where(take[..., None], cand, pos)
        ok = ok | fine
        if bool(jnp.all(ok)):
            return pos
        if (t + 1) % shrink_every == 0:
            done = jnp.all(ok, axis=1)                    # (C,)
            scale = jnp.where(done[:, None], scale, scale * 0.5)
    # which clusters could not be filled (host-side, for the error)
    missing = np.where(~np.asarray(ok).all(axis=1))[0]
    raise RuntimeError(
        f"could not initialise finite walkers for cluster(s) "
        f"{missing.tolist()} after {max_tries} tries; check the centers "
        "/ spread")


def run_batched_ensembles(log_prob_batch_cluster, p0, n_burn: int,
                          n_steps: int, key, thin: int = 1,
                          a: float = 2.0, record_log_prob: bool = False):
    """(C, W, D) independent stretch-move ensembles in one jitted scan,
    returning the thinned post-burn chains.

    Single-device batched counterpart of parallel.run_multi_cluster
    (which shards over a mesh but keeps only final positions); built on
    the same shared ``stretch_half_update`` primitive.  Returns
    (chain (n_saved, C, W, D), acceptance (C, W), final positions), or
    with ``record_log_prob=True`` (chain, lp_chain (n_saved, C, W),
    acceptance, final positions)."""
    p0 = jnp.asarray(p0)
    C, W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    if n_burn < 0:
        raise ValueError(f"n_burn ({n_burn}) must be >= 0")
    H = W // 2
    n_saved = n_steps // thin

    def step(state, k):
        x, lp, acc = state
        u = jax.random.uniform(k, (2, C, 3, H), dtype=x.dtype)

        def half(x, lp, acc, u3, sl_m, sl_f):
            xm, lm, accept = stretch_half_update(
                log_prob_batch_cluster, u3, x[:, sl_m], lp[:, sl_m],
                x[:, sl_f], a, D)
            x = x.at[:, sl_m].set(xm)
            lp = lp.at[:, sl_m].set(lm)
            acc = acc.at[:, sl_m].add(accept.astype(x.dtype))
            return x, lp, acc

        lo, hi = slice(None, H), slice(H, None)
        x, lp, acc = half(x, lp, acc, u[0], lo, hi)
        x, lp, acc = half(x, lp, acc, u[1], hi, lo)
        return (x, lp, acc), None

    @jax.jit
    def drive(p0, rkey):
        lp0 = log_prob_batch_cluster(p0)
        # float32 counters regardless of walker dtype (bf16 saturates
        # at 256)
        acc0 = jnp.zeros((C, W), dtype=jnp.float32)
        state = (p0, lp0, acc0)
        if n_burn:
            kb, rkey = jax.random.split(rkey)
            state, _ = jax.lax.scan(step, state, jax.random.split(kb, n_burn))
            x, lp, _ = state
            state = (x, lp, acc0)

        def outer(state, k):
            state, _ = jax.lax.scan(step, state, jax.random.split(k, thin))
            # the lp chain is emitted only when requested: stacking it
            # unconditionally allocated an (n_saved, C, W) HBM buffer
            # (hundreds of MB at survey scale) that was then thrown away
            return state, ((state[0], state[1]) if record_log_prob
                           else (state[0],))

        state, saved = jax.lax.scan(
            outer, state, jax.random.split(rkey, n_saved))
        return state, saved

    (x, lp, acc), saved = drive(p0, key)
    if record_log_prob:
        chain, lp_chain = saved
        return (np.asarray(chain), np.asarray(lp_chain),
                np.asarray(acc) / float(n_steps), np.asarray(x))
    (chain,) = saved
    return (np.asarray(chain), np.asarray(acc) / float(n_steps),
            np.asarray(x))
