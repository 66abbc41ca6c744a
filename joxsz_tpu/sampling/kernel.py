"""Production driver for the fused Pallas step-loop sampler.

Wraps ``ops.pallas_joint.make_step_kernel`` — the stretch-move ensemble
sampler that runs entire MCMC step sequences (proposal + joint likelihood
+ accept, hardware PRNG) inside single ``pallas_call`` invocations — in
the ``run_ensemble`` interface so the high-level fit driver
(sampling/driver.py) can swap it in for the XLA scan sampler.

Chains are recorded VMEM-resident every ``thin`` steps inside the kernel,
so the ~0.7 ms per-invocation overhead of this backend is amortised over
hundreds of steps rather than paid per saved sample.

Sampling semantics match the XLA sampler exactly (same red-black stretch
move, reference /root/reference/joxsz_funcs.py:572-635); the random
stream is the TPU hardware PRNG seeded per invocation (posterior
agreement vs the threefry XLA sampler validated on hardware —
scripts/tpu_step_kernel_bench.py).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from .stretch import EnsembleResult
from ..ops.pallas_joint import (make_joint_core, make_step_kernel,
                                make_tempered_step_kernel)

# VMEM budget for the in-kernel chain buffer: n_keep * W * (Dp + 1) * 4 B.
# 26 MB (100 frames at W=512) is hardware-proven; a 53 MB buffer crashed
# the Mosaic compiler even under a 96 MB vmem_limit, so stay at the
# proven size.  Applies only to chain_space="vmem"; the default HBM chain
# (frames DMAed out of VMEM as they are recorded) is bounded only by the
# per-invocation HBM budget below.
_CHAIN_VMEM_BYTES = 26 * 1024 * 1024
_CHAIN_HBM_BYTES = 256 * 1024 * 1024
_PLAIN_CHUNK = 1000          # steps per invocation when no chain is kept


def chain_chunk_schedule(n_steps: int, thin: int, n_walkers: int, dp: int,
                         chain_space: str = "hbm") -> list[int]:
    """Per-invocation chunk sizes (steps, multiples of ``thin``) whose
    chain buffers respect the budgets — the ONE schedule used by both
    the single-device sampler (KernelSampler.run) and the sharded
    runner (parallel/kernel_sharded.py), so the budget constants can't
    drift between them.

    A chain frame costs n_walkers * (dp + 1) * 4 bytes in the chain
    buffer (HBM by default, VMEM under chain_space="vmem"); the lp
    chain stays a VMEM output even in HBM mode, so its
    n_keep * n_walkers * 4 bytes are capped against the
    hardware-proven ~26 MB VMEM limit in both modes (a 53 MB VMEM
    output crashed Mosaic).  Prefers a chunk size that divides the
    schedule: one kernel shape instead of main + remainder halves the
    Mosaic compile cost."""
    n_saved = n_steps // thin
    if n_saved == 0:
        return []
    if chain_space == "hbm":
        cap = min(1024, _CHAIN_HBM_BYTES // (n_walkers * (dp + 1) * 4),
                  _CHAIN_VMEM_BYTES // (n_walkers * 4))
    else:
        cap = min(256, _CHAIN_VMEM_BYTES // (n_walkers * (dp + 1) * 4))
    cap = max(1, cap)
    keep = min(n_saved, cap)
    for cand in range(min(n_saved, cap), cap // 2, -1):
        if n_saved % cand == 0:
            keep = cand
            break
    full, rem = divmod(n_saved, keep)
    return [keep * thin] * full + ([rem * thin] if rem else [])


def min_walkers_per_device(ndim: int) -> int:
    """Statistical floor for an independent per-chip Goodman-Weare
    ensemble: below 2*ndim+2 walkers the complementary half cannot span
    the parameter space and the move degenerates.  The ONE constant used
    by both the sampler's fallback predicate (_sharded_layout_ok) and
    the sharded runner's hard guard (parallel/kernel_sharded.py), so
    they can't drift apart."""
    return 2 * ndim + 2


class KernelSampler:
    """Factory-validated wrapper; build with :func:`make_kernel_sampler`."""

    def __init__(self, sess, core, dp: int, a: float = 2.0,
                 interpret: bool = False, chain_space: str = "hbm"):
        self._sess = sess
        self._core = core
        self._dp = dp                 # padded parameter width of the kernel
        self._a = a
        self._interpret = interpret
        self._chain_space = chain_space
        self._kernels: dict = {}
        # sticky sub-64 routing decisions per (W, n_dev, thin): one
        # chunked run must not interleave hybrid and independent-
        # ensemble chunks (see run_sharded).  Scoped to a LOGICAL RUN:
        # ``new_run()`` clears it, so a KernelSampler reused across
        # independent fits (the recommended driver-cache reuse pattern)
        # does not inherit the first fit's routing — a short first run
        # would otherwise pin every later long run of the same shape to
        # the statistically-worse independent-ensemble path.
        self._hybrid_routes: dict = {}

    def new_run(self):
        """Start a new logical run: reset per-run sticky decisions
        (currently the sub-64 hybrid-routing choice).  Call between
        independent fits when reusing one sampler for its compiled
        kernel cache; ``run_fit`` does this automatically.  Chunked
        continuation WITHIN a run must NOT call this — stickiness is
        what keeps a remainder chunk on the same sampling law."""
        self._hybrid_routes.clear()

    def _kernel(self, n_inner: int, W: int, thin=None):
        k = (n_inner, W, thin)
        fn = self._kernels.get(k)
        if fn is None:
            fn = make_step_kernel(self._sess, n_inner=n_inner, n_walkers=W,
                                  a=self._a, interpret=self._interpret,
                                  thin=thin, chain_space=self._chain_space)
            self._kernels[k] = fn
        return fn

    def log_prob_batch(self, thetas):
        return self._core(thetas)

    def _sharded_layout_ok(self, W, n_steps, thin, mesh, axis="walker"):
        """Cheap pre-checks mirroring the runner's argument validation —
        done HERE so a mismatch falls back to the XLA mesh sampler while
        genuine runtime errors in the sharded path still propagate
        (a broad except would mask real bugs as a silent fallback).
        Includes the small-per-chip-ensemble guard: below 2*ndim+2
        walkers per device the independent-ensemble path is
        statistically unsound, so the caller should fall back to the
        XLA mesh sampler (ONE properly sized sharded ensemble)."""
        n_dev = mesh.shape[axis]
        if not (W % n_dev == 0 and (W // n_dev) % 2 == 0
                and n_steps % thin == 0):
            return False
        ndim = len(self._sess.params.thawed)
        floor = min_walkers_per_device(ndim)
        if W // n_dev < floor:
            import warnings
            warnings.warn(
                f"{W // n_dev} walkers per device is below 2*ndim+2 = "
                f"{floor}: falling back to the XLA mesh sampler "
                f"(one walker-sharded ensemble) instead of independent "
                f"per-chip kernel ensembles", stacklevel=3)
            return False
        return True

    def run_sharded(self, p0, n_steps: int, key, mesh, thin: int = 1,
                    verbose: bool = False):
        """Multi-chip sampling: independent per-device ensembles through
        the fused kernel under shard_map (parallel/kernel_sharded.py).
        Returns None when the walker count doesn't split evenly over the
        mesh or the configuration doesn't match the kernel.

        Below 64 walkers per device — where independent per-chip
        ensembles mix measurably worse (docs/PERFORMANCE.md A.5) — the
        run is routed to the hybrid coupled sampler instead
        (``run_hybrid_coupled_ensemble``: windows of chip-local fused
        steps + one globally coupled stretch step per window;
        mixing validated at 32 walkers/chip, near-fused cost — A.11),
        provided the first call of the run is long enough to amortise
        whole windows — the decision is STICKY per (W, n_dev, thin), so
        a chunked/checkpointed run cannot silently interleave hybrid
        and independent-ensemble chunks in one chain (a short remainder
        chunk follows whatever law the first chunk chose).
        The hybrid records frames only from the local windows, so the
        realised step count is n_windows * sync_every ≈ n_steps (within
        half a window) and the chain carries (sync_every-1)/thin frames
        per window — callers deriving step counts from frames * thin
        underestimate by ~1/sync_every, in the conservative direction
        for stopping rules."""
        from ..parallel.kernel_sharded import (
            run_hybrid_coupled_ensemble, run_sharded_kernel_ensembles)

        W = p0.shape[0]
        if not self._sharded_layout_ok(W, n_steps, thin, mesh):
            return None
        n_dev = mesh.shape["walker"]
        w_loc = W // n_dev
        if w_loc < 64:
            # sync_every must be ≡ 1 (mod thin); aim near the validated
            # sync_every=100 operating point (A.11)
            sync_every = thin * max(1, round(99 / thin)) + 1
            rkey = (W, n_dev, thin)
            use_hybrid = self._hybrid_routes.get(rkey)
            if use_hybrid is None:
                use_hybrid = n_steps >= 4 * sync_every
                self._hybrid_routes[rkey] = use_hybrid
                if use_hybrid and verbose:
                    # gated like driver.py's _mesh_note: non-verbose /
                    # JSON-consuming callers must not get stray stdout
                    print(f"note: {w_loc} walkers/device < 64 — using "
                          f"the hybrid coupled sampler "
                          f"(sync_every={sync_every}; "
                          f"docs/PERFORMANCE.md A.11)")
            if use_hybrid:
                # _sharded_layout_ok enforced the 2*ndim+2 floor above;
                # assert it here because allow_small=True below disables
                # the runner's own hard guard
                assert w_loc >= min_walkers_per_device(
                    len(self._sess.params.thawed))
                n_windows = max(1, round(n_steps / sync_every))
                seed = int(jax.random.randint(key, (), 0,
                                              np.iinfo(np.int32).max))
                return run_hybrid_coupled_ensemble(
                    self._sess, p0, n_windows, sync_every, seed, mesh,
                    thin=thin, a=self._a, interpret=self._interpret,
                    chain_space=self._chain_space, allow_small=True,
                    core=self._core)
        return run_sharded_kernel_ensembles(
            self._sess, p0, n_steps, key, mesh, thin=thin, a=self._a,
            interpret=self._interpret, chain_space=self._chain_space,
            core=self._core)

    def run_tempered_sharded(self, p0, betas, n_steps: int, key, mesh,
                             thin: int = 1):
        """Multi-chip tempered sampling: independent K-rung tempered
        ensembles per device (parallel/kernel_sharded.py).  Returns None
        when walkers don't split evenly or the configuration doesn't
        match the kernel."""
        from ..parallel.kernel_sharded import run_sharded_tempered_ensembles

        p0 = jnp.asarray(p0)
        W = p0.shape[0] if p0.ndim == 2 else p0.shape[1]
        if not self._sharded_layout_ok(W, n_steps, thin, mesh):
            return None
        return run_sharded_tempered_ensembles(
            self._sess, p0, betas, n_steps, key, mesh, thin=thin,
            a=self._a, interpret=self._interpret,
            chain_space=self._chain_space, core=self._core)

    def run_tempered(self, p0, betas, n_steps: int, key, thin: int = 1):
        """Parallel-tempered sampling through the fused kernel (see
        :func:`run_tempered_kernel`); reuses this sampler's compiled
        joint core and kernel cache."""
        return run_tempered_kernel(self._sess, p0, betas, n_steps, key,
                                   thin=thin, a=self._a,
                                   interpret=self._interpret,
                                   core=self._core,
                                   kernel_cache=self._kernels,
                                   dp=self._dp,
                                   chain_space=self._chain_space)

    def run(self, p0, n_steps: int, key, thin: int = 1,
            store_chain: bool = True) -> EnsembleResult:
        W, D = p0.shape
        if W % 2:
            raise ValueError("need an even number of walkers")
        if n_steps % thin:
            raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                             f"thin ({thin})")
        x = jnp.asarray(p0, jnp.float32)
        lp = self._core(x)
        acc = jnp.zeros(W, jnp.float32)
        if n_steps == 0:
            # degenerate but reachable (run_fit rounds nsteps down to a
            # multiple of thin); mirror run_ensemble's empty result
            return EnsembleResult(
                chain=np.empty((0, W, D)), log_prob=np.empty((0, W)),
                acceptance_fraction=np.zeros(W),
                final_state=(x, lp, key),
            )

        chunks: list[tuple[int, int | None]] = []   # (n_inner, thin or None)
        if store_chain:
            chunks = [(n, thin) for n in chain_chunk_schedule(
                n_steps, thin, W, self._dp, self._chain_space)]
        else:
            full, rem = divmod(n_steps, _PLAIN_CHUNK)
            chunks += [(_PLAIN_CHUNK, None)] * full
            if rem:
                chunks.append((rem, None))

        seeds = np.asarray(jax.random.randint(
            key, (len(chunks),), 0, np.iinfo(np.int32).max, dtype=jnp.int32))
        xs, lps = [], []
        for (n_inner, th), seed in zip(chunks, seeds):
            step = self._kernel(n_inner, W, th)
            if th is None:
                x, lp, acc = step(x, lp, acc, int(seed))
            else:
                x, lp, acc, ch, chlp = step(x, lp, acc, int(seed))
                # start the device->host copy immediately so the transfer
                # overlaps the next chunk's compute (the chain is the bulk
                # of the traffic; synchronous fetches would serialise it
                # behind every chunk)
                for arr in (ch, chlp):
                    try:
                        arr.copy_to_host_async()
                    except Exception:
                        pass
                xs.append(ch)
                lps.append(chlp)
        if store_chain:
            chain = np.concatenate([np.asarray(c) for c in xs])
            logp = np.concatenate([np.asarray(c) for c in lps])
        else:
            chain = np.empty((0, W, D))
            logp = np.empty((0, W))
        return EnsembleResult(
            chain=chain,
            log_prob=logp,
            acceptance_fraction=np.asarray(acc) / float(n_steps),
            final_state=(x, lp, key),
        )


def run_tempered_kernel(sess, p0, betas, n_steps: int, key, thin: int = 1,
                        a: float = 2.0, chunk_steps: int = 100,
                        interpret: bool = False, core=None,
                        kernel_cache: dict | None = None, dp: int = 128,
                        chain_space: str = "hbm"):
    """Tempered sampling through the fused kernel
    (ops.pallas_joint.make_tempered_step_kernel): K replica ensembles +
    swap sweeps fully on-chip, the cold-rung chain recorded host-side
    every ``thin`` steps per chunk.  p0 is (K, W, D) or (W, D)
    replicated.  Pass ``core``/``kernel_cache`` (KernelSampler does) to
    reuse compiled programs across calls.  Returns None when the
    configuration doesn't match."""
    from .tempered import TemperedResult

    betas = np.asarray(betas, dtype=float)
    K = betas.size
    p0 = jnp.asarray(p0, jnp.float32)
    if p0.ndim == 2:
        p0 = jnp.broadcast_to(p0[None], (K,) + p0.shape)
    _, W, D = p0.shape
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")
    if core is None:
        core = make_joint_core(sess, block_b=256, interpret=interpret)
    if core is None:
        return None
    x = p0
    lp = jnp.stack([core(x[k]) for k in range(K)])
    if n_steps == 0:
        # degenerate but reachable (run_fit rounds nsteps down to a
        # multiple of thin)
        return TemperedResult(
            chain=np.empty((0, W, D)), log_prob=np.empty((0, W)),
            acceptance_fraction=np.zeros((K, W)),
            swap_acceptance=np.zeros(K - 1),
            final_state=(x, lp),
        )

    def build(n_inner):
        ck = ("temper", tuple(betas), n_inner, W, thin, a, chain_space)
        fn = kernel_cache.get(ck) if kernel_cache is not None else None
        if fn is None:
            fn = make_tempered_step_kernel(sess, betas, n_inner=n_inner,
                                           n_walkers=W, a=a, thin=thin,
                                           interpret=interpret,
                                           chain_space=chain_space)
            if kernel_cache is not None and fn is not None:
                kernel_cache[ck] = fn
        return fn

    # chunk = a multiple of thin near chunk_steps, with the per-chunk
    # cold-chain buffer held under the buffer budget (HBM by default;
    # the hardware-proven VMEM cap under chain_space="vmem")
    budget = (_CHAIN_HBM_BYTES if chain_space == "hbm"
              else _CHAIN_VMEM_BYTES)
    max_keep = max(1, budget // (W * (dp + 1) * 4))
    chunk = max(thin, min(chunk_steps // thin, max_keep) * thin)
    step = build(chunk)
    if step is None:
        return None
    full, rem = divmod(n_steps, chunk)
    tail = build(rem) if rem else None

    acc = jnp.zeros((K, W), jnp.float32)
    sacc_tot = np.zeros(K - 1)
    n_calls = full + (1 if rem else 0)
    seeds = np.asarray(jax.random.randint(
        key, (n_calls,), 0, np.iinfo(np.int32).max, dtype=jnp.int32))
    xs, lps = [], []
    for i in range(n_calls):
        fn = tail if (rem and i == full) else step
        x, lp, acc, sacc, ch, chlp = fn(x, lp, acc, int(seeds[i]))
        sacc_tot += np.asarray(sacc)
        for arr in (ch, chlp):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        xs.append(ch)
        lps.append(chlp)
    return TemperedResult(
        chain=np.concatenate([np.asarray(c) for c in xs]),
        log_prob=np.concatenate([np.asarray(c) for c in lps]),
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        swap_acceptance=sacc_tot / float(n_steps * W),
        final_state=(x, lp),
    )


def make_kernel_sampler(sess, a: float = 2.0, interpret: bool = False,
                        chain_space: str = "hbm") -> KernelSampler | None:
    """Returns a :class:`KernelSampler` for the flagship configuration, or
    None when the session does not match the kernel specialisation (the
    caller should fall back to the XLA sampler)."""
    from ..ops.pallas_joint import _build_spec

    spec = _build_spec(sess)
    if spec is None:
        return None
    core = make_joint_core(sess, block_b=256, interpret=interpret,
                           spec=spec)
    return KernelSampler(sess, core, dp=spec["Dp"], a=a,
                         interpret=interpret, chain_space=chain_space)
