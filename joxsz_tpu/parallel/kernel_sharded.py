"""Multi-chip production sampling through the fused Pallas step kernel.

``parallel/sharded.py`` scales ONE walker-sharded ensemble (XLA inserts
an ICI all-gather of the complementary half's positions per substep).
This module is the multi-chip path for the *production kernel sampler*
(ops/pallas_joint.make_step_kernel): under ``jax.shard_map`` every chip
runs an INDEPENDENT Goodman–Weare ensemble, fully chip-resident, with
its own hardware-PRNG seed — zero inter-chip communication during
sampling.  Independent ensembles target the same posterior, so the
concatenated chains are valid samples (this is exactly the reference's
statistical content — emcee ensembles carry no cross-ensemble coupling
either, /root/reference/joxsz_main.py:203-208 only parallelises
likelihood evaluations *within* one ensemble).

Why per-chip ensembles instead of one sharded ensemble: the stretch
move's partner gather is chip-local here; sharding a single ensemble
through the kernel would need a remote-DMA all-gather inside the
kernel every substep.  MEASURED equivalence
(scripts/tpu_ensemble_equiv_bench.py, docs/PERFORMANCE.md): splitting
one equilibrated 2048-walker cloud into 8x256 / 32x64 independent
ensembles changes the integrated autocorrelation time by <= 3%
(within estimator noise), so there is no statistical cost — only
linear throughput scaling.  Below ~2*ndim+2 walkers per chip the move
cannot span the parameter space; `_guard_per_device_walkers` enforces
that floor.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.pallas_joint import make_step_kernel
from ..sampling.stretch import EnsembleResult


def _chunk_schedule(n_steps: int, thin: int, w_loc: int, dp: int,
                    chain_space: str):
    """Per-device chunk sizes; the budget logic lives in ONE place
    (sampling.kernel.chain_chunk_schedule) shared with the
    single-device sampler."""
    from ..sampling.kernel import chain_chunk_schedule

    return chain_chunk_schedule(n_steps, thin, w_loc, dp, chain_space)


def _multiprocess() -> bool:
    """True inside a jax.distributed job spanning processes: inputs must
    then be placed as GLOBAL arrays from host-replicated values, and
    results fetched as this process's local blocks (chains never cross
    hosts) — ``np.asarray`` of a non-addressable array would throw."""
    import jax

    return jax.process_count() > 1


def _guard_per_device_walkers(w_loc: int, ndim: int,
                              allow_small: bool = False):
    """Independent per-chip ensembles are statistically equivalent to
    one big ensemble only when each chip's ensemble is itself healthy.
    Goodman-Weare needs W >> ndim (the move proposes along directions
    spanned by the complementary half); measured equivalence numbers
    for this posterior are in docs/PERFORMANCE.md.  Hard-error below
    2*ndim+2 (the move's span degenerates), warn below 64 where mixing
    per walker measurably degrades.  ``allow_small`` skips the guard
    for mechanics tests / dry runs that verify plumbing, not
    statistics."""
    if allow_small:
        return
    from ..sampling.kernel import min_walkers_per_device

    floor = min_walkers_per_device(ndim)
    if w_loc < floor:
        raise ValueError(
            f"walkers per device ({w_loc}) < 2*ndim+2 = {floor}: "
            f"a per-chip Goodman-Weare ensemble this small cannot span "
            f"the parameter space — use fewer devices or more walkers "
            f"(pass allow_small=True only for plumbing tests)")
    if w_loc < 64:
        import warnings
        warnings.warn(
            f"only {w_loc} walkers per device: small independent "
            f"ensembles mix measurably worse per walker (see "
            f"docs/PERFORMANCE.md); prefer >= 64 per device, or use "
            f"run_hybrid_coupled_ensemble — cross-chip mixing at "
            f"near-fused cost, validated at 32 walkers/chip "
            f"(docs/PERFORMANCE.md A.11)",
            stacklevel=3)


# built window drivers are cached in the _COUPLED_CACHE style (see its
# comment below): every call would otherwise rebuild the Pallas kernel
# and a fresh jax.jit wrapper, and even a persistent-cache hit reloads
# the whole program (seconds through the remote tunnel).  Measured
# before the cache: run_hybrid_coupled_ensemble's per-call rebuild
# dominated its wall (results/tpu_hybrid_cost.json).
_WINDOW_CACHE: "OrderedDict" = OrderedDict()
_WINDOW_CACHE_MAX = 8


def _cache_get(cache: OrderedDict, key, sess):
    """Driver-cache lookup.  Keys carry id(sess) (FitSession is an
    eq-dataclass, unhashable); a dead session's id can be REUSED, so a
    hit is honoured only when the stored strong reference IS the caller's
    session — the identity guard every driver cache in this module must
    share."""
    hit = cache.get(key)
    if hit is not None and hit[0] is sess:
        cache.move_to_end(key)
        return hit[1:]
    return None


def _cache_put(cache: OrderedDict, max_size: int, key, sess, *value):
    """Store (sess, *value) and evict the LRU entry past ``max_size``.
    The strong session ref in the value keeps cached ids live for
    :func:`_cache_get`'s identity check.  Overwriting an existing key
    (the id-reuse miss path) must also move it to the fresh end —
    OrderedDict assignment alone leaves it at the stale entry's LRU
    position, where the next insert would evict the just-built driver."""
    cache[key] = (sess,) + value
    cache.move_to_end(key)
    if len(cache) > max_size:
        cache.popitem(last=False)


def make_sharded_kernel_step(sess, mesh, n_inner: int,
                             walkers_per_device: int, thin=None,
                             a: float = 2.0, interpret: bool = False,
                             chain_space: str = "hbm",
                             axis: str = "walker"):
    """One fused kernel invocation per device under shard_map.

    Returns ``fn(x (W, D), lp (W,), acc (W,), seeds (n_dev,)) ->
    (x, lp, acc[, chain (n_keep, W, D), chain_lp (n_keep, W)])`` with
    ``W = n_dev * walkers_per_device`` sharded over ``axis``, or None
    when the session doesn't match the kernel specialisation.  Each
    device advances its walker block as an independent ensemble seeded
    by its entry of ``seeds``.  Drivers are cached per (session, mesh,
    schedule) so repeat calls skip the rebuild.
    """
    key = (id(sess), n_inner, walkers_per_device, thin, a, interpret,
           chain_space, axis, tuple(mesh.shape.items()),
           tuple(d.id for d in mesh.devices.flat))
    hit = _cache_get(_WINDOW_CACHE, key, sess)
    if hit is not None:
        return hit[0]
    step = make_step_kernel(sess, n_inner=n_inner,
                            n_walkers=walkers_per_device, a=a,
                            interpret=interpret, thin=thin,
                            chain_space=chain_space)
    if step is None:
        return None

    def local(seeds, x, lp, acc):
        return step(x, lp, acc, seeds[0])

    in_specs = (P(axis), P(axis), P(axis), P(axis))
    if thin is None:
        out_specs = (P(axis), P(axis), P(axis))
    else:
        out_specs = (P(axis), P(axis), P(axis),
                     P(None, axis), P(None, axis))
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    wrapped = jax.jit(lambda x, lp, acc, seeds: fn(seeds, x, lp, acc))
    _cache_put(_WINDOW_CACHE, _WINDOW_CACHE_MAX, key, sess, wrapped)
    return wrapped


def make_sharded_tempered_step(sess, betas, mesh, n_inner: int,
                               walkers_per_device: int, thin=None,
                               a: float = 2.0, interpret: bool = False,
                               chain_space: str = "hbm",
                               axis: str = "walker"):
    """Tempered analogue of :func:`make_sharded_kernel_step`: each device
    runs an independent K-rung tempered ensemble (stretch moves + swap
    sweeps fully chip-local) on its walker block.

    Returns ``fn(x (K, W, D), lp (K, W), acc (K, W), seeds (n_dev,)) ->
    (x, lp, acc, sacc (n_dev, K-1)[, cold chain (n_keep, W, D),
    cold chain_lp (n_keep, W)])`` with ``W = n_dev *
    walkers_per_device`` sharded over ``axis`` (swap counts come back
    per device; sum them for the global rate), or None when the
    configuration doesn't match.  Drivers are cached like
    :func:`make_sharded_kernel_step`'s."""
    from ..ops.pallas_joint import make_tempered_step_kernel

    key = ("temper", id(sess), tuple(float(b) for b in betas), n_inner,
           walkers_per_device, thin, a, interpret, chain_space, axis,
           tuple(mesh.shape.items()),
           tuple(d.id for d in mesh.devices.flat))
    hit = _cache_get(_WINDOW_CACHE, key, sess)
    if hit is not None:
        return hit[0]
    step = make_tempered_step_kernel(
        sess, betas, n_inner=n_inner, n_walkers=walkers_per_device, a=a,
        interpret=interpret, thin=thin, chain_space=chain_space)
    if step is None:
        return None

    def local(seeds, x, lp, acc):
        outs = step(x, lp, acc, seeds[0])
        # sacc (K-1,) -> (1, K-1) so the device axis is explicit
        return (outs[0], outs[1], outs[2],
                outs[3][None, :]) + tuple(outs[4:])

    in_specs = (P(axis), P(None, axis), P(None, axis), P(None, axis))
    out_specs = (P(None, axis), P(None, axis), P(None, axis),
                 P(axis, None))
    if thin is not None:
        out_specs = out_specs + (P(None, axis), P(None, axis))
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    wrapped = jax.jit(lambda x, lp, acc, seeds: fn(seeds, x, lp, acc))
    _cache_put(_WINDOW_CACHE, _WINDOW_CACHE_MAX, key, sess, wrapped)
    return wrapped


def run_sharded_kernel_ensembles(sess, p0, n_steps: int, key, mesh,
                                 thin: int = 1, a: float = 2.0,
                                 interpret: bool = False,
                                 chain_space: str = "hbm",
                                 axis: str = "walker",
                                 core=None,
                                 allow_small: bool = False,
                                 ) -> EnsembleResult | None:
    """Device-parallel kernel sampling mirroring ``KernelSampler.run``:
    ``p0`` is (W, D) with W divisible by the mesh's ``axis`` size and an
    even per-device share.  The chain is (n_steps//thin, W, D) with each
    device's ensemble occupying its walker block.  Returns None when the
    configuration doesn't match the kernel specialisation."""
    from ..ops.pallas_joint import make_joint_core

    W, D = p0.shape
    n_dev = mesh.shape[axis]
    if W % n_dev:
        raise ValueError(f"walkers ({W}) must divide over {n_dev} devices")
    w_loc = W // n_dev
    if w_loc % 2:
        raise ValueError(f"walkers per device ({w_loc}) must be even")
    _guard_per_device_walkers(w_loc, D, allow_small)
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")

    if core is None:
        core = make_joint_core(sess, interpret=interpret)
    if core is None:
        return None
    xsh = NamedSharding(mesh, P(axis))
    x = jax.device_put(jnp.asarray(p0, jnp.float32), xsh)
    lp = core(x)
    acc = jnp.zeros(W, jnp.float32)

    from ..ops.pallas_kernels import _round_up

    if n_steps == 0:
        return EnsembleResult(
            chain=np.empty((0, W, D)), log_prob=np.empty((0, W)),
            acceptance_fraction=np.zeros(W), final_state=(x, lp, key))
    dp = _round_up(D, 128)
    chunks = _chunk_schedule(n_steps, thin, w_loc, dp, chain_space)
    steps = {}
    for n_inner in set(chunks):
        st = make_sharded_kernel_step(sess, mesh, n_inner=n_inner,
                                      walkers_per_device=w_loc,
                                      thin=thin, a=a,
                                      interpret=interpret,
                                      chain_space=chain_space, axis=axis)
        if st is None:
            return None
        steps[n_inner] = st
    seeds = jax.random.randint(key, (len(chunks), n_dev), 0,
                               np.iinfo(np.int32).max, dtype=jnp.int32)
    xs, lps = [], []
    for i, n_inner in enumerate(chunks):
        x, lp, acc, chain, chain_lp = steps[n_inner](x, lp, acc,
                                                     seeds[i])
        for arr in (chain, chain_lp):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        xs.append(chain)
        lps.append(chain_lp)
    return EnsembleResult(
        chain=np.concatenate([np.asarray(c) for c in xs]),
        log_prob=np.concatenate([np.asarray(c) for c in lps]),
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        final_state=(x, lp, key),
    )


def run_sharded_tempered_ensembles(sess, p0, betas, n_steps: int, key,
                                   mesh, thin: int = 1, a: float = 2.0,
                                   interpret: bool = False,
                                   chain_space: str = "hbm",
                                   axis: str = "walker", core=None,
                                   allow_small: bool = False):
    """Device-parallel tempered sampling: independent K-rung tempered
    ensembles per chip.  ``p0`` is (K, W, D) or (W, D) replicated across
    rungs; W must split evenly over the mesh with an even per-device
    share.  Returns a ``TemperedResult`` (cold-rung chain over the full
    W) or None when the configuration doesn't match."""
    from ..ops.pallas_joint import make_joint_core
    from ..sampling.tempered import TemperedResult

    betas = np.asarray(betas, dtype=float)
    K = betas.size
    p0 = jnp.asarray(p0, jnp.float32)
    if p0.ndim == 2:
        p0 = jnp.broadcast_to(p0[None], (K,) + p0.shape)
    if p0.shape[0] != K:
        raise ValueError(f"p0 has {p0.shape[0]} rungs but "
                         f"{K} betas were given")
    _, W, D = p0.shape
    n_dev = mesh.shape[axis]
    if W % n_dev:
        raise ValueError(f"walkers ({W}) must divide over {n_dev} devices")
    w_loc = W // n_dev
    if w_loc % 2:
        raise ValueError(f"walkers per device ({w_loc}) must be even")
    _guard_per_device_walkers(w_loc, D, allow_small)
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")

    if core is None:
        core = make_joint_core(sess, interpret=interpret)
    if core is None:
        return None
    xsh = NamedSharding(mesh, P(None, axis))
    x = jax.device_put(p0, xsh)
    lp = jnp.stack([core(x[k]) for k in range(K)])
    acc = jnp.zeros((K, W), jnp.float32)

    from ..ops.pallas_kernels import _round_up

    if n_steps == 0:
        return TemperedResult(
            chain=np.empty((0, W, D)), log_prob=np.empty((0, W)),
            acceptance_fraction=np.zeros((K, W)),
            swap_acceptance=np.zeros(K - 1), final_state=(x, lp))
    dp = _round_up(D, 128)
    chunks = _chunk_schedule(n_steps, thin, w_loc, dp, chain_space)
    steps = {}
    for n_inner in set(chunks):
        st = make_sharded_tempered_step(
            sess, betas, mesh, n_inner=n_inner,
            walkers_per_device=w_loc, thin=thin, a=a,
            interpret=interpret, chain_space=chain_space, axis=axis)
        if st is None:
            return None
        steps[n_inner] = st
    seeds = jax.random.randint(key, (len(chunks), n_dev), 0,
                               np.iinfo(np.int32).max, dtype=jnp.int32)
    xs, lps = [], []
    sacc_tot = np.zeros(K - 1)
    for i, n_inner in enumerate(chunks):
        x, lp, acc, sacc, chain, chain_lp = steps[n_inner](
            x, lp, acc, seeds[i])
        sacc_tot = sacc_tot + np.asarray(sacc).sum(axis=0)
        for arr in (chain, chain_lp):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        xs.append(chain)
        lps.append(chain_lp)
    return TemperedResult(
        chain=np.concatenate([np.asarray(c) for c in xs]),
        log_prob=np.concatenate([np.asarray(c) for c in lps]),
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        swap_acceptance=sacc_tot / float(n_steps * W),
        final_state=(x, lp),
    )


# compiled coupled drivers are cached: every run_coupled_sharded_ensemble
# call would otherwise rebuild a fresh jax.jit wrapper, and on this host
# even a persistent-cache hit reloads the whole scan program (seconds
# through the remote tunnel), dwarfing short runs.  Identity-guard
# semantics live in _cache_get/_cache_put.
_COUPLED_CACHE: OrderedDict = OrderedDict()
_COUPLED_CACHE_MAX = 8


def _get_coupled_driver(sess, W, n_steps, thin, a, interpret, axis,
                        partner, mesh, core=None):
    from ..ops.pallas_joint import make_coupled_half_kernel, make_joint_core

    n_dev = mesh.shape[axis]
    key = (id(sess), W, n_dev, n_steps, thin, a, interpret, axis,
           partner, tuple(mesh.shape.items()),
           tuple(d.id for d in mesh.devices.flat))
    hit = _cache_get(_COUPLED_CACHE, key, sess)
    if hit is not None:
        return hit
    half = make_coupled_half_kernel(sess, W, n_dev, a=a,
                                    interpret=interpret, partner=partner)
    if half is None:
        return None
    # the initial-lp core is cached WITH the driver: make_joint_core
    # pays the full _build_spec table-operator construction, noticeable
    # per call on this 1-core host — callers holding a prebuilt core
    # (KernelSampler) pass it in instead of paying a second build
    if core is None:
        core = make_joint_core(sess, interpret=interpret)
    if core is None:
        return None
    H_loc = half.H_loc
    jitted = half._jitted
    n_keep = n_steps // thin
    n_consts = len(half._consts)

    def local(seed_a, xA, xB, *consts_in):
        off = jax.lax.axis_index(axis) * H_loc
        sd = seed_a[0]

        def one_step(carry, i):
            xA, xB = carry
            xBf = jax.lax.all_gather(xB, axis, axis=0, tiled=True)
            xA = jitted(xA, xBf, sd, i, 0, off, tuple(consts_in))
            xAf = jax.lax.all_gather(xA, axis, axis=0, tiled=True)
            xB = jitted(xB, xAf, sd, i, 1, off, tuple(consts_in))
            return (xA, xB), None

        def one_frame(carry, k):
            carry, _ = jax.lax.scan(one_step, carry,
                                    k * thin + jnp.arange(thin))
            xA, xB = carry
            # keep halves as their own axis: sharding the concatenated
            # blocks over `axis` would interleave [A_d; B_d] per device
            # instead of the global [A_all; B_all] walker order
            return carry, jnp.stack([xA, xB])

        (xA, xB), frames = jax.lax.scan(one_frame, (xA, xB),
                                        jnp.arange(n_keep))
        return xA, xB, frames

    in_specs = ((P(), P(axis), P(axis))
                + tuple(P() for _ in range(n_consts)))
    out_specs = (P(axis), P(axis), P(None, None, axis))
    fn = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False))
    _cache_put(_COUPLED_CACHE, _COUPLED_CACHE_MAX, key, sess, fn, half,
               core)
    return fn, half, core


def run_coupled_sharded_ensemble(sess, p0, n_steps: int, seed: int, mesh,
                                 thin: int = 1, a: float = 2.0,
                                 interpret: bool = False,
                                 axis: str = "walker",
                                 partner: str = "onehot",
                                 core=None,
                                 ) -> EnsembleResult | None:
    """ONE W-total Goodman-Weare ensemble spanning the mesh's chips on
    the kernel path (the single-ensemble analogue of
    ``run_sharded_kernel_ensembles``'s independent-per-chip layout).

    Each full step all-gathers the complementary half across the mesh
    (``jax.lax.all_gather`` over ICI), then every chip advances its row
    block through ONE fused half-substep kernel
    (``ops.pallas_joint.make_coupled_half_kernel``) — so each walker's
    partner is drawn from the FULL complementary half, exactly the
    single-device move.  BIT-EXACT across shard counts (n_dev in
    {1, 2, 4, 8} measured identical); vs ``make_step_kernel`` at equal
    total W and seed the trajectories match with log-probs to float32
    ULPs (different XLA programs contract the same likelihood math
    into different FMA forms — see the kernel docstring; pinned by
    ``test_coupled_sharded_bitmatches_single_device``).

    When to use: only when walkers-per-chip must drop below the
    measured independent-ensemble equivalence floor (~64;
    docs/PERFORMANCE.md A.5) — the per-substep kernel invocation +
    all-gather costs ~2 dispatches/step where the independent layout
    amortises one dispatch over 500 steps.  Above the floor, use
    ``run_sharded_kernel_ensembles``.

    ``p0``: (W, D); H = W/2 must divide over the mesh.  Returns an
    ``EnsembleResult`` (chain (n_steps//thin, W, D)) or None outside
    the kernel specialisation."""
    W, D = np.asarray(p0).shape
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    n_dev = mesh.shape[axis]
    if H % n_dev:
        raise ValueError(f"half-ensemble ({H}) must divide over "
                         f"{n_dev} devices")
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")
    built = _get_coupled_driver(sess, W, n_steps, thin, a, interpret,
                                axis, partner, mesh, core=core)
    if built is None:
        return None
    fn, half, core = built
    Dp = half.Dp
    DL, DA = Dp - 2, Dp - 1
    f32 = jnp.float32

    mp = _multiprocess()
    # host-side packed state (make_step_kernel layout: positions +
    # lp/acc lanes) placed as GLOBAL walker-sharded arrays: numpy input
    # is host-replicated, so device_put materialises only this
    # process's shards — the same call is the single-process path too
    x0h = np.asarray(p0, np.float32)
    lp0 = np.asarray(core(jnp.asarray(x0h)), np.float32)
    xph = np.zeros((W, Dp), np.float32)
    xph[:, :D] = x0h
    xph[:, DL] = lp0
    xsh = NamedSharding(mesh, P(axis))
    xA0 = jax.device_put(xph[:H], xsh)
    xB0 = jax.device_put(xph[H:], xsh)
    # device-resident consts are process-local arrays: a multi-process
    # jit only accepts global jax.Arrays or host values, so hand the
    # host copies over in that mode (they enter replicated per in_specs)
    consts = (half._consts if not mp
              else tuple(np.asarray(c) for c in half._consts))
    n_keep = n_steps // thin
    seed_a = np.asarray([seed], np.int32)
    xA, xB, frames = fn(seed_a, xA0, xB0, *consts)
    if mp:
        from .multihost import local_block

        # this process's contiguous half-row block, in global indices;
        # frames are (n_keep, 2, H, Dp) sharded along the H axis
        h0, h1, fr_loc = local_block(frames, axis=2)
        _, _, xA_loc = local_block(xA)
        _, _, xB_loc = local_block(xB)
        fr_loc = np.concatenate([fr_loc[:, 0], fr_loc[:, 1]], axis=1)
        widx = np.concatenate([np.arange(h0, h1),
                               H + np.arange(h0, h1)])
        xfin = np.concatenate([xA_loc, xB_loc])
        return EnsembleResult(
            chain=fr_loc[:, :, :D],
            log_prob=fr_loc[:, :, DL],
            acceptance_fraction=xfin[:, DA] / float(n_steps),
            final_state=(jnp.asarray(xfin[:, :D]),
                         jnp.asarray(xfin[:, DL]), seed),
            walker_indices=widx,
        )
    # frames: (n_keep, 2, H, Dp) packed -> (n_keep, W, Dp)
    frames = np.asarray(frames).reshape(n_keep, W, Dp)
    xfin = np.concatenate([np.asarray(xA), np.asarray(xB)])
    return EnsembleResult(
        chain=frames[:, :, :D],
        log_prob=frames[:, :, DL],
        acceptance_fraction=xfin[:, DA] / float(n_steps),
        final_state=(jnp.asarray(xfin[:, :D]),
                     jnp.asarray(xfin[:, DL]), seed),
    )


def run_hybrid_coupled_ensemble(sess, p0, n_windows: int, sync_every: int,
                                seed: int, mesh, thin: int = 1,
                                a: float = 2.0, interpret: bool = False,
                                axis: str = "walker",
                                partner: str = "onehot",
                                allow_small: bool = False,
                                chain_space: str = "hbm",
                                core=None,
                                ) -> EnsembleResult | None:
    """Amortized multi-chip single-ensemble sampling (VERDICT r3 task 4).

    The fully coupled sampler (:func:`run_coupled_sharded_ensemble`)
    pays two kernel launches + two all-gathers EVERY step (measured ~4x
    the fused per-step cost at W=256, warm) because nothing amortises.
    This
    hybrid amortises: each window runs ``sync_every - 1`` steps with
    every chip advancing its walker block as an independent chip-local
    ensemble in ONE fused kernel launch (the
    :func:`make_sharded_kernel_step` path — zero inter-chip traffic),
    then ONE globally coupled Goodman-Weare step (both halves, partners
    from the full cross-chip complementary half) re-mixes the ensemble
    across chips.

    Statistical validity: every move is a stretch move leaving the
    posterior invariant (chip-local partner restriction changes the
    proposal distribution, not the target), so any composition is a
    valid sampler; the question is MIXING when walkers-per-chip is
    below the independent-ensemble equivalence floor (~64).  Measured
    on hardware (scripts/tpu_hybrid_mixing_bench.py, single-chip
    group emulation of the identical move law): see
    docs/PERFORMANCE.md "Multi-chip walker sharding".

    Per-window cost on a mesh: one sharded fused dispatch (amortising
    ``sync_every - 1`` steps) + one coupled step (2 launches + 2
    gathers) — at sync_every=100 the coupled overhead is ~1% of the
    pure-coupled cost.

    Chain layout: thinned frames from the local windows only (the
    single coupled step per window is recorded when ``sync_every %
    thin == 0`` would align; for simplicity the coupled step is NOT
    recorded — with thin >= 2 this drops <= 1/sync_every of frames).
    Total steps = n_windows * sync_every.  Returns None outside the
    kernel specialisation.

    The per-device walker guard applies exactly as in the other sharded
    runners (hard error below 2*ndim+2, warning below 64; pass
    ``allow_small=True`` only for plumbing tests).  Hybrid mixing at 32
    walkers/chip is hardware-validated (docs/PERFORMANCE.md A.11), so
    the sub-64 warning is advisory in this sampler's intended regime —
    but the 2*ndim+2 floor is where the stretch move itself degenerates
    and stays a hard error."""
    W, D = np.asarray(p0).shape
    n_dev = mesh.shape[axis]
    if n_windows < 1:
        raise ValueError(f"n_windows ({n_windows}) must be >= 1")
    if sync_every < 2:
        raise ValueError("sync_every must be >= 2 (use "
                         "run_coupled_sharded_ensemble for every-step "
                         "coupling)")
    if W % (2 * n_dev) or (W // n_dev) % 2:
        raise ValueError(f"walkers ({W}) must give an even per-device "
                         f"share over {n_dev} devices")
    w_loc = W // n_dev
    _guard_per_device_walkers(w_loc, D, allow_small)
    n_win_steps = sync_every - 1
    if n_win_steps % thin:
        raise ValueError(f"sync_every - 1 ({n_win_steps}) must be a "
                         f"multiple of thin ({thin})")
    window = make_sharded_kernel_step(sess, mesh, n_inner=n_win_steps,
                                      walkers_per_device=w_loc, thin=thin,
                                      a=a, interpret=interpret,
                                      chain_space=chain_space, axis=axis)
    built = _get_coupled_driver(sess, W, 1, 1, a, interpret, axis,
                                partner, mesh, core=core)
    if window is None or built is None:
        return None
    coupled_fn, half, core = built
    Dp = half.Dp
    DL, DA = Dp - 2, Dp - 1
    H = W // 2
    f32 = jnp.float32

    xsh = NamedSharding(mesh, P(axis))

    # the per-window coupled step + its pack/unpack glue run as ONE
    # jitted program: issued as separate ops the epilogue cost ~5-10
    # dispatches/window over the ~10 ms-latency tunnel — the dominant
    # steady cost of the sampler it was built to amortize (r4
    # self-review #2).  Cached like the drivers it composes.
    ekey = ("hybrid_epi", id(sess), W, n_dev, a, interpret, axis,
            partner, tuple(mesh.shape.items()),
            tuple(d.id for d in mesh.devices.flat))
    hit = _cache_get(_WINDOW_CACHE, ekey, sess)
    if hit is not None:
        epilogue = hit[0]
    else:
        def _epilogue(seed_a, x, lp, acc, *consts):
            xp = jnp.zeros((W, Dp), f32).at[:, :D].set(x)
            xp = xp.at[:, DL].set(lp.astype(f32))
            xA, xB, _ = coupled_fn(seed_a, xp[:H], xp[H:], *consts)
            xf = jnp.concatenate([xA, xB])
            xo = jax.lax.with_sharding_constraint(xf[:, :D], xsh)
            return xo, xf[:, DL], acc + xf[:, DA]

        epilogue = jax.jit(_epilogue)
        _cache_put(_WINDOW_CACHE, _WINDOW_CACHE_MAX, ekey, sess, epilogue)

    mp = _multiprocess()
    # numpy input: host-replicated, so this works identically in a
    # multi-process job (only local shards materialise) and single-proc
    x = jax.device_put(np.asarray(p0, np.float32), xsh)
    lp = core(x)
    acc = jax.device_put(np.zeros(W, np.float32), xsh)
    if mp:
        # pre-place the constants ONCE as replicated GLOBAL arrays: the
        # epilogue runs every window, and raw numpy consts would be
        # re-uploaded host->device per call (MBs of tables over a
        # ~20 MB/s link) — the exact per-window overhead this sampler
        # exists to amortise
        rep = NamedSharding(mesh, P())
        econsts = tuple(jax.device_put(np.asarray(c), rep)
                        for c in half._consts)
    else:
        econsts = half._consts
    rng = np.random.default_rng(seed)
    frames, frame_lps = [], []
    for w in range(n_windows):
        seeds = np.asarray(
            rng.integers(0, np.iinfo(np.int32).max, size=n_dev),
            np.int32)
        x, lp, acc, chain, chain_lp = window(x, lp, acc, seeds)
        if not mp:
            # start the device->host transfer now: the ~20 MB/s tunnel
            # overlaps with the next window's compute instead of
            # serialising all frames behind the sampling loop at return
            # (multi-process arrays are only partially addressable —
            # fetched as local blocks below instead)
            chain.copy_to_host_async()
            chain_lp.copy_to_host_async()
        frames.append(chain)
        frame_lps.append(chain_lp)
        # one globally coupled step (pack -> both halves -> unpack, one
        # dispatch)
        seed_a = np.asarray(
            [rng.integers(0, np.iinfo(np.int32).max)], np.int32)
        x, lp, acc = epilogue(seed_a, x, lp, acc, *econsts)
    if mp:
        from .multihost import local_block

        ch_blocks, lp_blocks = [], []
        w0 = w1 = None
        for c, clp in zip(frames, frame_lps):
            w0, w1, cb = local_block(c, axis=1)
            _, _, lb = local_block(clp, axis=1)
            ch_blocks.append(cb)
            lp_blocks.append(lb)
        _, _, acc_loc = local_block(acc)
        return EnsembleResult(
            chain=np.concatenate(ch_blocks),
            log_prob=np.concatenate(lp_blocks),
            acceptance_fraction=acc_loc / float(n_windows * sync_every),
            final_state=(x, lp, seed),
            frame_spacing=thin * sync_every / (sync_every - 1),
            walker_indices=np.arange(w0, w1),
        )
    return EnsembleResult(
        chain=np.concatenate([np.asarray(c) for c in frames]),
        log_prob=np.concatenate([np.asarray(c) for c in frame_lps]),
        acceptance_fraction=np.asarray(acc)
        / float(n_windows * sync_every),
        final_state=(x, lp, seed),
        # frames come only from the (sync_every - 1)-step local windows,
        # so n_windows * sync_every realised steps are spread over
        # n_windows * (sync_every - 1)/thin frames: the effective
        # spacing is slightly above thin.  Carried on the result (and
        # into the HDF5 'frame_spacing' attr by run_fit) so consumers'
        # saved-frame -> raw-step conversions self-correct.
        frame_spacing=thin * sync_every / (sync_every - 1),
    )


def make_sharded_multicluster_step(sess, sz_stack, xr_stack, mesh,
                                   n_inner: int, n_walkers: int,
                                   thin=None, a: float = 2.0,
                                   interpret: bool = False,
                                   chain_space: str = "hbm",
                                   axis: str = "cluster",
                                   consts=None, spec=None):
    """Survey production path over a mesh: the cluster-grid kernel
    (ops.make_multicluster_step_kernel) sharded over the CLUSTER axis —
    each chip advances its block of C/n_dev clusters' ensembles fully
    chip-resident (grid dimension = local cluster), zero inter-chip
    communication during sampling.  Clusters are independent posteriors,
    so this is exact parallelism, not an independent-ensemble
    approximation.

    The kernels take their constant stacks as jit ARGUMENTS (see
    make_multicluster_step_kernel), so the per-device constants ride in
    as shard_map operands: ONE compiled per-device program serves every
    cluster block and every dataset of the same shape.

    Returns ``fn(x (C, W, D), lp (C, W), acc (C, W), seeds (n_dev,))``
    -> same layout as the single-device kernel (chain (C, n_keep, W, D)
    etc. when ``thin`` is given), or None outside the kernel
    specialisation.  Per-cluster PRNG streams are (device seed, local
    grid index) pairs — distinct across devices for distinct seeds.
    """
    from ..ops.pallas_joint import (make_multicluster_consts,
                                    make_multicluster_step_kernel)

    C = int(np.asarray(sz_stack.L).shape[0])
    n_dev = mesh.shape[axis]
    if C % n_dev:
        raise ValueError(f"clusters ({C}) must divide over the mesh's "
                         f"{n_dev} '{axis}' devices")
    c_loc = C // n_dev
    if consts is None:
        consts = make_multicluster_consts(sess, sz_stack, xr_stack,
                                          spec=spec)
        if consts is None:
            return None

    # build the per-device kernel at the LOCAL cluster count; its
    # constants enter per call, so the local slice here only fixes shapes
    local_stack = jax.tree_util.tree_map(lambda v: v[:c_loc], sz_stack)
    local_xr = (None if xr_stack is None else
                jax.tree_util.tree_map(lambda v: v[:c_loc], xr_stack))
    step = make_multicluster_step_kernel(
        sess, local_stack, local_xr, n_inner=n_inner,
        n_walkers=n_walkers, thin=thin, a=a, interpret=interpret,
        chain_space=chain_space, spec=spec,
        consts=tuple(v[:c_loc] for v in consts))
    if step is None:
        return None
    jitted = step._jitted

    def local(seeds, x, lp, acc, *consts_loc):
        return jitted(x, lp, acc, seeds[0], tuple(consts_loc))

    n_outs = 3 if thin is None else 5
    in_specs = ((P(axis), P(axis), P(axis), P(axis))
                + (P(axis),) * len(consts))
    out_specs = (P(axis),) * n_outs
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)

    @jax.jit
    def stepfn(x, lp, acc, seeds, consts_all):
        return fn(seeds, x, lp, acc, *consts_all)

    def run(x, lp, acc, seeds, consts_override=None):
        # consts_override: pre-placed (e.g. globally sharded multi-host)
        # constant stacks — same pytree as `consts` (parallel.multihost)
        return stepfn(x, lp, acc, seeds,
                      consts if consts_override is None else consts_override)

    return run
