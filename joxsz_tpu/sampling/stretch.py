"""TPU-resident affine-invariant ensemble sampler (Goodman-Weare 2010).

Replaces emcee's ``EnsembleSampler`` + ``multiprocessing.Pool`` stack
(reference: /root/reference/joxsz_main.py:203-208, joxsz_funcs.py:572-635;
SURVEY.md §2.2/§3.4).  The reference evaluates one likelihood per forked
worker per walker with pickled IPC; here the entire chain runs inside one
``lax.scan`` on device:

  * the ensemble is split into two fixed halves; each substep updates one
    half using stretch-move partners drawn from the complementary half
    (the exact emcee 'red-black' scheme, required for detailed balance);
  * the proposal scale z ~ g(z) prop. 1/sqrt(z) on [1/a, a] is sampled by
    inverse CDF: z = (1/sqrt(a) + u (sqrt(a) - 1/sqrt(a)))^2;
  * acceptance: log U < (ndim - 1) log z + logP(Y) - logP(X);
  * all walkers of a half evaluate the joint likelihood as ONE vmapped
    batch — on TPU the SZ/X-ray matvecs become MXU matmuls over the batch;
  * the chain is accumulated on device (thinned) and fetched to host once.

The same step function is shardable over a walker mesh axis for multi-chip
runs (see ``joxsz_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class EnsembleResult:
    chain: np.ndarray        # (n_saved, n_walkers, ndim)
    log_prob: np.ndarray     # (n_saved, n_walkers)
    acceptance_fraction: np.ndarray   # (n_walkers,)
    final_state: tuple       # (positions, log_probs, key) device arrays
    # raw sampler steps per saved frame.  None means the frames are
    # exactly ``thin`` steps apart (every regular sampler); the hybrid
    # coupled sampler records frames only inside its local windows so
    # its effective spacing is thin * sync_every / (sync_every - 1) —
    # carrying it here (and into the HDF5 'frame_spacing' attr) makes
    # downstream tau/R-hat step arithmetic self-correcting instead of
    # footnote-dependent.
    frame_spacing: float | None = None
    # multi-process (jax.distributed) runs of the coupled/hybrid sharded
    # samplers return only THIS process's walker block (chains never
    # cross hosts): the global walker index of each local chain column.
    # None for single-process results (chain covers all walkers).
    walker_indices: np.ndarray | None = None


def _z_from_uniform(u, a: float, dtype):
    """Inverse-CDF transform of g(z) prop. 1/sqrt(z) on [1/a, a]."""
    sa = jnp.sqrt(jnp.asarray(a, dtype=dtype))
    return (1.0 / sa + u * (sa - 1.0 / sa)) ** 2


def _sample_z(key, shape, a: float, dtype):
    return _z_from_uniform(jax.random.uniform(key, shape, dtype=dtype),
                           a, dtype)


def stretch_half_update(lp_fn, u3, x_move, lp_move, x_fixed, a, ndim,
                        beta=None, has_aux=False, aux_move=None):
    """Stretch-move update of one half-ensemble against the fixed
    complementary half — the SINGLE implementation shared by the plain,
    tempered, multi-cluster, and evidence samplers.

    Shapes support arbitrary leading batch axes (temperature rungs,
    clusters): x_move (..., H, D), x_fixed (..., Hf, D), u3 (..., 3, H).
    ``lp_fn`` maps the proposal block (..., H, D) -> (..., H) UNtempered
    log-probs; ``beta`` (broadcastable to (..., H)) scales the log-prob
    difference for tempered rungs.

    ``has_aux``: ``lp_fn`` returns ``(lp, aux)`` where aux is a pytree of
    per-walker (..., H)-shaped values carried alongside the state (the
    evidence ladder tracks the prior/likelihood decomposition this way);
    ``aux_move`` holds the current values and the accepted proposals'
    aux is merged elementwise.  Returns ``(x, lp, aux, accept)`` with
    aux, else ``(x, lp, accept)``."""
    dtype = x_move.dtype
    z = _z_from_uniform(u3[..., 0, :], a, dtype)          # (..., H)
    Hf = x_fixed.shape[-2]
    # uniform partner index from a uniform draw (exact up to float
    # quantisation ~2^-24, negligible vs Hf)
    pidx = jnp.minimum((u3[..., 1, :] * Hf).astype(jnp.int32), Hf - 1)
    xp = jnp.take_along_axis(x_fixed, pidx[..., None], axis=-2)
    y = xp + z[..., None] * (x_move - xp)
    if has_aux:
        lp_y, aux_y = lp_fn(y)
    else:
        lp_y = lp_fn(y)
    dlp = lp_y - lp_move
    if beta is not None:
        dlp = beta * dlp
    log_ratio = (ndim - 1.0) * jnp.log(z) + dlp
    accept = jnp.log(u3[..., 2, :]) < log_ratio
    x_new = jnp.where(accept[..., None], y, x_move)
    lp_new = jnp.where(accept, lp_y, lp_move)
    if has_aux:
        aux_new = jax.tree.map(lambda n, o: jnp.where(accept, n, o),
                               aux_y, aux_move)
        return x_new, lp_new, aux_new, accept
    return x_new, lp_new, accept


def _half_update(log_prob_batch, u3, x_move, lp_move, x_fixed, a, ndim):
    return stretch_half_update(log_prob_batch, u3, x_move, lp_move,
                               x_fixed, a, ndim)


def de_half_update(lp_fn, u3, g1, x_move, lp_move, x_fixed, gamma0,
                   sigma, beta=None):
    """Differential-evolution update of one half-ensemble (DE-MC,
    ter Braak 2006; emcee's ``DEMove`` with the Nelson et al. 2013
    gamma jitter): ``y = x + gamma (x_a - x_b)`` with a distinct pair
    (a, b) drawn from the fixed complementary half and
    ``gamma = gamma0 (1 + sigma N(0,1))`` per walker.  The proposal is
    symmetric, so acceptance is plain Metropolis: ``log U < lp_y - lp_x``
    (no stretch-move ``(d-1) log z`` Jacobian).

    ``u3`` (..., 3, H) uniforms: pair draw a, pair draw b, accept;
    ``g1`` (..., H) standard normals for the gamma jitter.  Shapes/
    ``beta`` follow :func:`stretch_half_update` (arbitrary leading batch
    axes; beta scales the log-prob difference for tempered rungs)."""
    dtype = x_move.dtype
    Hf = x_fixed.shape[-2]
    ia = jnp.minimum((u3[..., 0, :] * Hf).astype(jnp.int32), Hf - 1)
    # b uniform over the Hf-1 indices != a: draw from [0, Hf-1) and skip a
    ib = jnp.minimum((u3[..., 1, :] * (Hf - 1)).astype(jnp.int32), Hf - 2)
    ib = ib + (ib >= ia).astype(jnp.int32)
    xa = jnp.take_along_axis(x_fixed, ia[..., None], axis=-2)
    xb = jnp.take_along_axis(x_fixed, ib[..., None], axis=-2)
    gamma = jnp.asarray(gamma0, dtype) * (1.0 + jnp.asarray(sigma, dtype) * g1)
    y = x_move + gamma[..., None] * (xa - xb)
    lp_y = lp_fn(y)
    dlp = lp_y - lp_move
    if beta is not None:
        dlp = beta * dlp
    accept = jnp.log(u3[..., 2, :]) < dlp
    x_new = jnp.where(accept[..., None], y, x_move)
    lp_new = jnp.where(accept, lp_y, lp_move)
    return x_new, lp_new, accept


def de_gamma0(ndim: int) -> float:
    """ter Braak's optimal-scaling default, emcee's ``gamma0=None``."""
    return 2.38 / float(np.sqrt(2.0 * ndim))


def _distinct3(u3, Hf):
    """Three distinct uniform indices in [0, Hf) from three uniforms,
    via the skip construction (exact joint uniformity over ordered
    distinct triples)."""
    i0 = jnp.minimum((u3[..., 0, :] * Hf).astype(jnp.int32), Hf - 1)
    i1 = jnp.minimum((u3[..., 1, :] * (Hf - 1)).astype(jnp.int32), Hf - 2)
    i1 = i1 + (i1 >= i0).astype(jnp.int32)
    i2 = jnp.minimum((u3[..., 2, :] * (Hf - 2)).astype(jnp.int32), Hf - 3)
    lo = jnp.minimum(i0, i1)
    hi = jnp.maximum(i0, i1)
    i2 = i2 + (i2 >= lo).astype(jnp.int32)
    i2 = i2 + (i2 >= hi).astype(jnp.int32)
    return i0, i1, i2


def snooker_half_update(lp_fn, u4, x_move, lp_move, x_fixed, ndim,
                        gamma_s=1.7, beta=None):
    """Snooker update of one half-ensemble (ter Braak & Vrugt 2008;
    emcee's ``DESnookerMove``): walk along the line through x and an
    anchor z from the complementary half, stepping by the difference of
    two other walkers' projections onto that line:

        y = x + u (gamma_s (u.z1 - u.z2)),   u = (x - z)/|x - z|

    The proposal is not symmetric; detailed balance needs the
    dimension-Jacobian factor (|y - z|/|x - z|)^(ndim-1).  Since
    y - z = u (|x - z| + s), the ratio is |1 + s/|x - z||.

    ``u4`` (..., 4, H) uniforms: three distinct anchor/projection draws
    and the accept draw."""
    dtype = x_move.dtype
    Hf = x_fixed.shape[-2]
    iz, i1, i2 = _distinct3(u4, Hf)
    z = jnp.take_along_axis(x_fixed, iz[..., None], axis=-2)
    z1 = jnp.take_along_axis(x_fixed, i1[..., None], axis=-2)
    z2 = jnp.take_along_axis(x_fixed, i2[..., None], axis=-2)
    delta = x_move - z
    norm = jnp.sqrt(jnp.sum(delta * delta, axis=-1))          # (..., H)
    ok = norm > 0.0        # coincident x==z: reject (measure-zero case)
    safe = jnp.where(ok, norm, 1.0)
    u_hat = delta / safe[..., None]
    s = jnp.asarray(gamma_s, dtype) * jnp.sum(u_hat * (z1 - z2), axis=-1)
    y = x_move + u_hat * s[..., None]
    lp_y = lp_fn(y)
    dlp = lp_y - lp_move
    if beta is not None:
        dlp = beta * dlp
    ratio = jnp.abs(1.0 + s / safe)
    log_jac = (ndim - 1.0) * jnp.log(jnp.maximum(ratio, 1e-30))
    accept = ok & (jnp.log(u4[..., 3, :]) < log_jac + dlp)
    x_new = jnp.where(accept[..., None], y, x_move)
    lp_new = jnp.where(accept, lp_y, lp_move)
    return x_new, lp_new, accept


def make_step(log_prob_batch, ndim: int, a: float = 2.0,
              move: str = "stretch", de_sigma: float = 1.0e-5,
              de_gamma: float | None = None):
    """One full ensemble step (both half-updates).  ``log_prob_batch`` maps
    (H, D) -> (H,) and must be vmap-compatible.  All per-step randomness
    comes from ONE PRNG call (a (2, 3, H) uniform block, plus a (2, H)
    normal block for the DE gamma jitter) — threefry is a measurable
    fraction of the step cost on TPU.

    ``move``: 'stretch' (Goodman-Weare, the reference's emcee default),
    'de' (differential evolution — emcee's ``DEMove``), or 'snooker'
    (emcee's ``DESnookerMove``); the DE-family moves come from the emcee
    move zoo and can mix better on some curved degeneracies."""
    if move not in ("stretch", "de", "snooker"):
        raise ValueError(f"unknown move {move!r}: expected 'stretch', "
                         "'de', or 'snooker'")
    if move == "de":
        g0 = de_gamma0(ndim) if de_gamma is None else float(de_gamma)
    if move == "snooker":
        gs = 1.7 if de_gamma is None else float(de_gamma)

    def step(state, key):
        x, lp, acc = state
        W = x.shape[0]
        H = W // 2
        # DE needs a distinct pair, snooker a distinct triple, from the
        # fixed half — below these floors the skip construction in
        # de_half_update/_distinct3 wraps an index to -1 and silently
        # duplicates a partner, biasing the proposal.  Shapes are static,
        # so this raises at trace time (i.e. on the first call).
        if move == "de" and H < 2:
            raise ValueError(f"DE move needs >= 4 walkers (got {W}): "
                             "each half must hold a distinct pair")
        if move == "snooker" and H < 3:
            raise ValueError(f"snooker move needs >= 6 walkers (got {W}): "
                             "each half must hold a distinct triple")
        dtype = x.dtype
        if move == "de":
            ku, kg = jax.random.split(key)
            u = jax.random.uniform(ku, (2, 3, H), dtype=dtype)
            g = jax.random.normal(kg, (2, H), dtype=dtype)
        elif move == "snooker":
            u = jax.random.uniform(key, (2, 4, H), dtype=dtype)
        else:
            u = jax.random.uniform(key, (2, 3, H), dtype=dtype)
        x0, x1 = x[:H], x[H:]
        lp0, lp1 = lp[:H], lp[H:]
        if move == "de":
            x0, lp0, a0 = de_half_update(log_prob_batch, u[0], g[0],
                                         x0, lp0, x1, g0, de_sigma)
            x1, lp1, a1 = de_half_update(log_prob_batch, u[1], g[1],
                                         x1, lp1, x0, g0, de_sigma)
        elif move == "snooker":
            x0, lp0, a0 = snooker_half_update(log_prob_batch, u[0],
                                              x0, lp0, x1, ndim, gs)
            x1, lp1, a1 = snooker_half_update(log_prob_batch, u[1],
                                              x1, lp1, x0, ndim, gs)
        else:
            x0, lp0, a0 = _half_update(log_prob_batch, u[0], x0, lp0,
                                       x1, a, ndim)
            x1, lp1, a1 = _half_update(log_prob_batch, u[1], x1, lp1,
                                       x0, a, ndim)
        x = jnp.concatenate([x0, x1])
        lp = jnp.concatenate([lp0, lp1])
        acc = acc + jnp.concatenate([a0, a1]).astype(acc.dtype)
        return (x, lp, acc), None

    return step


# compiled drivers are cached per (log-prob fn, schedule, shapes) — without
# this every run_ensemble call re-jits (and on this host reloads) the whole
# scan program, which dwarfs the actual device time for short phases.
# Bounded LRU (keyed by the function OBJECT, not id(), so entries cannot
# alias after garbage collection); old entries drop off so long-lived
# sessions scanning many models don't pin compiled programs forever.
from collections import OrderedDict

_DRIVE_CACHE: OrderedDict = OrderedDict()
_DRIVE_CACHE_MAX = 32


def _get_drive(log_prob_batch, n_saved: int, thin: int, a: float,
               store_chain: bool, unroll_inner: int, W: int, D: int, dtype,
               move: str = "stretch", de_gamma: float | None = None):
    key = (log_prob_batch, n_saved, thin, a, store_chain, unroll_inner,
           W, D, str(dtype), move, de_gamma)
    drive = _DRIVE_CACHE.get(key)
    if drive is not None:
        _DRIVE_CACHE.move_to_end(key)
        return drive
    step = make_step(log_prob_batch, D, a, move=move, de_gamma=de_gamma)

    @jax.jit
    def drive(p0, lp0, acc0, rkey):
        def outer(state, k):
            keys = jax.random.split(k, thin)
            state, _ = jax.lax.scan(step, state, keys, unroll=unroll_inner)
            x, lp, acc = state
            out = (x, lp) if store_chain else None
            return state, out

        keys = jax.random.split(rkey, n_saved)
        state, saved = jax.lax.scan(outer, (p0, lp0, acc0), keys)
        return state, saved

    _DRIVE_CACHE[key] = drive
    if len(_DRIVE_CACHE) > _DRIVE_CACHE_MAX:
        _DRIVE_CACHE.popitem(last=False)
    return drive


def validate_schedule(n_steps: int, thin: int, n_walkers: int | None = None):
    """Shared sampling-schedule validation: every driver that scans
    (n_steps // thin) x thin must reject a non-dividing thin up front —
    silently running ``max(n_steps // thin, 1) * thin`` steps would skew
    acceptance/throughput normalisation (and n_steps=0 would still run
    ``thin`` steps then divide rates by zero)."""
    if n_walkers is not None and n_walkers % 2:
        raise ValueError("need an even number of walkers")
    if n_steps <= 0:
        raise ValueError(f"n_steps ({n_steps}) must be positive")
    if thin <= 0:
        raise ValueError(f"thin ({thin}) must be positive")
    if n_steps % thin:
        # emcee v3 semantics: iterations must divide by thin
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")


def run_ensemble(
    log_prob_batch,
    p0: jnp.ndarray,
    n_steps: int,
    key: jax.Array,
    thin: int = 1,
    a: float = 2.0,
    store_chain: bool = True,
    unroll_inner: int = 1,
    keep_walkers: int | None = None,
    move: str = "stretch",
    de_gamma: float | None = None,
) -> EnsembleResult:
    """Run ``n_steps`` ensemble steps, saving every ``thin``-th state.

    The whole loop is one jitted scan: (n_saved outer) x (thin inner)
    steps.  Matches the reference's sampling semantics with thinning
    (/root/reference/joxsz_funcs.py:621-623).

    ``keep_walkers``: fetch only the first k walkers of the saved chain
    / log-prob to the host (the sampling itself always runs the full
    ensemble).  Device->host transfer on this infrastructure runs at
    ~20 MB/s, so tau benches that only need a walker slice should ask
    for the slice instead of discarding host-side."""
    W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    n_saved = n_steps // thin

    lp0 = log_prob_batch(p0)
    # acceptance counters stay float32 regardless of the walker dtype:
    # a bf16 counter saturates at 256 (257 rounds back down), silently
    # under-reporting acceptance on long low-precision runs
    acc0 = jnp.zeros((W,), dtype=jnp.float32)
    drive = _get_drive(log_prob_batch, n_saved, thin, a, store_chain,
                       unroll_inner, W, D, p0.dtype, move, de_gamma)
    state, saved = drive(p0, lp0, acc0, key)
    x, lp, acc = state
    if store_chain:
        if keep_walkers is not None:
            # slice on device; np.asarray then moves only the slice
            chain = np.asarray(saved[0][:, :keep_walkers, :])
            logp = np.asarray(saved[1][:, :keep_walkers])
        else:
            chain = np.asarray(saved[0])
            logp = np.asarray(saved[1])
    else:
        chain = np.empty((0, W, D))
        logp = np.empty((0, W))
    return EnsembleResult(
        chain=chain,
        log_prob=logp,
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        final_state=(x, lp, key),
    )


def generate_init_positions(
    log_prob_batch, theta0: np.ndarray, n_walkers: int, key: jax.Array,
    spread: float = 0.1, max_tries: int = 64,
) -> jnp.ndarray:
    """Multiplicative-Gaussian perturbations of a centre point, rejection-
    resampled until every walker has finite log-probability (the
    reference's `_generateInitPars`, /root/reference/joxsz_funcs.py:548-570).

    One deliberate deviation from the reference's pure-multiplicative
    scheme: a coordinate whose centre value is exactly 0 (e.g. the
    default log(T_X/T_{SZ})) would make EVERY walker identical there,
    and an affine-invariant ensemble can never develop diversity in a
    degenerate direction — the stretch move preserves it forever.  A
    small additive floor (spread * max(|theta_i|, 1e-2)) keeps every
    coordinate non-degenerate; affine invariance then grows the cloud
    to the posterior width during burn-in.

    Implemented as a batched resampling loop: draw a full batch, keep
    finite rows, redraw only the rest — O(few) batched likelihood calls
    instead of one call per walker."""
    theta0 = jnp.asarray(theta0)
    D = theta0.shape[0]
    scale = spread * jnp.maximum(jnp.abs(theta0), 1e-2)
    pos = jnp.zeros((n_walkers, D), dtype=theta0.dtype)
    ok = jnp.zeros((n_walkers,), dtype=bool)
    for _ in range(max_tries):
        key, sub = jax.random.split(key)
        cand = theta0 + scale * jax.random.normal(
            sub, (n_walkers, D), dtype=theta0.dtype)
        lp = log_prob_batch(cand)
        fine = jnp.isfinite(lp)
        take = fine & ~ok
        pos = jnp.where(take[:, None], cand, pos)
        ok = ok | fine
        if bool(jnp.all(ok)):
            return pos
    raise RuntimeError(
        f"could not find {n_walkers} finite-likelihood walkers; "
        "check the starting point / priors")
