"""Multi-process (multi-host) survey parallelism.

The reference's only concurrency is a single-host ``multiprocessing.Pool``
(``joxsz_main.py:203-208``; SURVEY.md §5.8).  Its TPU-native multi-host
equivalent, per the survey: *"multi-host / multi-slice: batch multi-cluster
fits over DCN; no gradient traffic exists, so DCN bandwidth is irrelevant —
only control-plane sync."*  Cluster fits are independent posteriors, so a
survey batch shards its cluster axis over EVERY process's devices inside
one ``jax.distributed`` job spanning hosts/slices:

  * every process holds the (small) survey inputs host-side and
    materialises only the device shards it owns
    (``replicated_to_global``);
  * sampling runs as one SPMD program over the global mesh — for the
    cluster axis there is ZERO inter-device communication, so nothing
    rides DCN during the run except the jax.distributed control plane;
  * each process retrieves only its own cluster block
    (``local_block``) — chains never cross hosts.

On a real TPU pod, ``initialize`` defers to the TPU runtime for topology.
For testing (and the bundled demo) it supports a virtual mode: N local
processes x K virtual CPU devices each with gloo collectives — real
multi-process SPMD, exercised by ``tests/test_multihost.py`` and
``scripts/multihost_survey_demo.py`` (which checks the multi-process
posterior against the identical single-process mesh run).
"""

from __future__ import annotations

import os
import dataclasses
from functools import partial

import numpy as np

__all__ = [
    "MultihostInfo", "initialize", "global_mesh", "replicated_to_global",
    "local_block", "run_multihost_multi_cluster",
    "make_multihost_multicluster_step", "place_multicluster_consts",
]


@dataclasses.dataclass(frozen=True)
class MultihostInfo:
    process_id: int
    num_processes: int
    local_devices: int
    global_devices: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, *, cpu_devices: int | None = None
               ) -> MultihostInfo:
    """Join a multi-process JAX job.  Call before ANY backend/device use.

    On a TPU pod leave ``cpu_devices=None``: ``jax.distributed`` reads the
    topology from the TPU runtime.  ``cpu_devices=K`` is the virtual test
    mode — K virtual CPU devices per process with gloo collectives.  The
    platform must be forced via ``jax.config`` (this image's interpreter
    boot overrides the ``JAX_PLATFORMS`` env var — see tests/conftest.py),
    and the XLA flag must land before the backend initialises, which is
    why this helper insists on running first.
    """
    import re

    import jax

    if cpu_devices is not None:
        flag = f"--xla_force_host_platform_device_count={cpu_devices}"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" in flags:
            # replace, never keep a stale count: a silently different
            # device total breaks the job's sharding layout downstream
            flags = re.sub(
                r"--xla_force_host_platform_device_count=\d+", flag, flags)
        else:
            flags = f"{flags} {flag}"
        os.environ["XLA_FLAGS"] = flags.strip()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return MultihostInfo(process_id=process_id,
                         num_processes=num_processes,
                         local_devices=len(jax.local_devices()),
                         global_devices=len(jax.devices()))


def global_mesh(axis_names: tuple[str, ...] = ("cluster",),
                shape: tuple[int, ...] | None = None):
    """Mesh over ALL processes' devices (``jax.devices()`` is the global
    list inside a jax.distributed job)."""
    from .mesh import make_mesh
    return make_mesh(None, axis_names=axis_names, shape=shape)


def replicated_to_global(x, mesh, spec=None):
    """Global jax.Array from host data that every process holds
    identically; only this process's shards are materialised."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    arr = np.asarray(x)
    sharding = NamedSharding(mesh, P() if spec is None else spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _span(sl: slice, dim: int) -> tuple[int, int]:
    return (0 if sl.start is None else sl.start,
            dim if sl.stop is None else sl.stop)


def local_block(arr, axis: int = 0):
    """This process's contiguous block of a global array sharded along
    ``axis``: returns ``(start, stop, np.ndarray)`` in global indices.

    Shards split along OTHER axes (e.g. a ('cluster', 'walker') mesh) are
    reassembled, but must tile those axes completely — a process owns
    whole clusters, possibly spread over its walker-axis devices.  Raises
    if another axis is only partially covered or the ``axis`` blocks are
    not contiguous (replicated copies are deduplicated)."""
    shards: dict[tuple[int, ...], np.ndarray] = {}
    for s in arr.addressable_shards:
        key = tuple(_span(sl, arr.shape[d])[0]
                    for d, sl in enumerate(s.index))
        if key not in shards:
            shards[key] = np.asarray(s.data)
    starts_by_axis = [sorted({k[d] for k in shards})
                      for d in range(arr.ndim)]

    def _size(d: int, st: int) -> int:
        k = next(k for k in shards if k[d] == st)
        return shards[k].shape[d]

    for d, starts in enumerate(starts_by_axis):
        stop = starts[0] if d == axis else 0
        for st in starts:
            if st != stop:
                raise ValueError(
                    f"local shards not contiguous along axis {d}: "
                    f"gap before index {st}")
            stop = st + _size(d, st)
        if d != axis and stop != arr.shape[d]:
            raise ValueError(
                f"local_block(axis={axis}): axis {d} only partially "
                f"covered locally ([0, {stop}) of {arr.shape[d]})")

    def _build(d: int, prefix: tuple[int, ...]):
        if d == arr.ndim:
            if prefix not in shards:
                raise ValueError(
                    f"local shard grid incomplete: missing block at "
                    f"global start {prefix}")
            return shards[prefix]
        return np.concatenate([_build(d + 1, prefix + (st,))
                               for st in starts_by_axis[d]], axis=d)

    starts = starts_by_axis[axis]
    stop = starts[-1] + _size(axis, starts[-1])
    return starts[0], stop, _build(0, ())


def _cluster_specs(mesh):
    from jax.sharding import PartitionSpec as P

    if "cluster" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'cluster' axis")
    axes = tuple(ax for ax in ("cluster", "walker") if ax in mesh.axis_names)
    return P(*axes)


_MH_DRIVE_CACHE: dict = {}


def run_multihost_multi_cluster(log_prob_batch_cluster, p0, n_steps, key,
                                mesh, thin: int = 1, a: float = 2.0,
                                n_burn: int = 0, record: bool = False):
    """Multi-host counterpart of ``parallel.run_multi_cluster``: ``p0`` and
    ``key`` are host values identical on every process; the sampler runs
    as one SPMD program over the global mesh, and the return carries only
    THIS process's cluster block plus its global ``[start, stop)`` range.

    ``n_burn`` prepends unrecorded burn-in steps (acceptance reset
    afterwards) inside the SAME jitted program — no intermediate host
    gather between phases.  ``record=True`` adds the thinned sampling
    chain ``(n_saved, C_local, W, D)`` + its log-probs to the return;
    chain blocks stay process-local (nothing rides DCN but the control
    plane).

    Launched in a single process over the same mesh it reproduces the
    multi-process run exactly (same partitioned per-device program) —
    that equivalence is asserted by ``scripts/multihost_survey_demo.py``.
    Compiled drivers are cached per (fn, schedule, shapes) like
    ``run_multi_cluster`` — repeat schedules reuse the program.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..sampling.stretch import validate_schedule
    from .sharded import make_multicluster_step

    C, W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    if jax.dtypes.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)   # new-style typed PRNG keys
    cache_key = (log_prob_batch_cluster, n_steps, thin, a, C, W, D, mesh,
                 n_burn, record)
    drive = _MH_DRIVE_CACHE.get(cache_key)
    spec = _cluster_specs(mesh)
    if drive is None:
        sh = NamedSharding(mesh, spec)
        rep = NamedSharding(mesh, P())
        chain_spec = P(None, *spec)      # (n_saved, C[, W]) leading time
        sh_chain = NamedSharding(mesh, chain_spec)
        step_all = make_multicluster_step(log_prob_batch_cluster, C, W, D, a)
        n_saved = n_steps // thin
        outs = ((sh, sh, sh) + ((sh_chain, sh_chain) if record else ()))

        @partial(jax.jit, in_shardings=(sh, rep), out_shardings=outs)
        def drive(x, key):
            lp = log_prob_batch_cluster(x)
            # float32 counters regardless of walker dtype (bf16
            # saturates at 256 — same hardening as sampling/stretch.py)
            acc = jnp.zeros((C, W), dtype=jnp.float32)
            # n_burn=0 keeps the exact run_multi_cluster PRNG schedule
            # (bit-equivalence pinned by tests/test_multihost.py)
            ks = jnp.asarray(key)
            if n_burn:
                kb, ks = jax.random.split(ks)
                keys = jax.random.split(kb, n_burn)
                (x, lp, _), _ = jax.lax.scan(step_all, (x, lp, acc), keys)

            def outer(state, k):
                keys = jax.random.split(k, thin)
                state, _ = jax.lax.scan(step_all, state, keys)
                return state, ((state[0], state[1]) if record else None)

            keys = jax.random.split(ks, n_saved)
            (x, lp, acc), saved = jax.lax.scan(outer, (x, lp, acc), keys)
            return (x, lp, acc) + (saved if record else ())

        _MH_DRIVE_CACHE[cache_key] = drive
        if len(_MH_DRIVE_CACHE) > 16:
            _MH_DRIVE_CACHE.pop(next(iter(_MH_DRIVE_CACHE)))

    xg = replicated_to_global(p0, mesh, spec)
    kg = replicated_to_global(key, mesh)
    out_arrays = drive(xg, kg)
    x, lp, acc = out_arrays[:3]
    c0, c1, x_loc = local_block(x)
    _, _, lp_loc = local_block(lp)
    _, _, acc_loc = local_block(acc)
    out = {
        "cluster_range": (c0, c1),
        "positions": x_loc,
        "log_prob": lp_loc,
        "acceptance_fraction": acc_loc / float(n_steps),
    }
    if record:
        _, _, chain_loc = local_block(out_arrays[3], axis=1)
        _, _, chain_lp_loc = local_block(out_arrays[4], axis=1)
        out["chain"] = chain_loc
        out["chain_log_prob"] = chain_lp_loc
    return out


def place_multicluster_consts(consts_host, mesh):
    """Place host constant stacks (make_multicluster_consts
    ``device=False``) as cluster-sharded global arrays, each process
    materialising only its own blocks.  Build once and pass to every
    ``make_multihost_multicluster_step`` call over the same survey."""
    from jax.sharding import PartitionSpec as P

    return tuple(replicated_to_global(v, mesh, P("cluster"))
                 for v in consts_host)


def make_multihost_multicluster_step(sess, sz_stack, xr_stack, mesh,
                                     n_inner: int, n_walkers: int,
                                     thin=None, a: float = 2.0,
                                     interpret: bool = False,
                                     chain_space: str = "hbm",
                                     spec=None, consts_host=None,
                                     consts_global=None):
    """Production kernel path across processes: the cluster-grid Pallas
    step kernel sharded over the global mesh's 'cluster' axis (same
    per-device program as ``make_sharded_multicluster_step`` — enabled by
    the consts-as-jit-arguments design), with the constant stacks
    pre-placed as GLOBAL arrays so every process materialises only its
    own cluster blocks.

    Returns ``fn(x, lp, acc, seeds)`` taking host arrays replicated on
    every process and returning globally-sharded jax.Arrays (use
    ``local_block`` to extract this process's clusters), or None outside
    the kernel specialisation.
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_joint import _build_spec, make_multicluster_consts
    from .kernel_sharded import make_sharded_multicluster_step

    if spec is None:
        spec = _build_spec(sess)   # build ONCE; reused by both calls below
        if spec is None:
            return None
    # host stacks serve as the per-device kernel's shape template inside
    # make_sharded_multicluster_step; the call-time override below feeds
    # the SAME stacks pre-placed as global arrays so each process only
    # materialises its own cluster blocks (no local device round-trip).
    # Pass consts_host to share one assembly across burn/sampling builders.
    if consts_host is None:
        consts_host = make_multicluster_consts(sess, sz_stack, xr_stack,
                                               spec=spec, device=False)
    if consts_host is None:
        return None
    # consts_global: pre-placed global stacks (place_multicluster_consts)
    # shared across burn/sampling builders — the dominant device buffers
    # (SZ operators, count-rate tables) are then held in HBM ONCE
    consts_g = (consts_global if consts_global is not None else
                place_multicluster_consts(consts_host, mesh))
    step = make_sharded_multicluster_step(
        sess, sz_stack, xr_stack, mesh, n_inner=n_inner,
        n_walkers=n_walkers, thin=thin, a=a, interpret=interpret,
        chain_space=chain_space, consts=consts_host, spec=spec)
    if step is None:
        return None

    n_dev = mesh.shape["cluster"]

    def _as_global(v, spec_):
        # jax.Arrays already on THIS mesh (a previous phase's output,
        # e.g. burn -> sampling chaining) pass straight through — incl.
        # replicated/1-device layouts, jit reshards as needed; host
        # values replicated on every process get placed shard-by-shard
        import jax

        if isinstance(v, jax.Array):
            if getattr(v.sharding, "mesh", None) == mesh:
                return v
            if not v.is_fully_addressable:
                raise ValueError(
                    "array is sharded over a different mesh than this "
                    f"step's ({mesh.axis_names} {dict(mesh.shape)})")
        return replicated_to_global(v, mesh, spec_)

    def fn(x, lp, acc, seeds):
        xg = _as_global(x, P("cluster"))
        lpg = _as_global(lp, P("cluster"))
        accg = _as_global(acc, P("cluster"))
        seeds = np.asarray(seeds)
        if seeds.shape != (n_dev,):
            raise ValueError(f"seeds must be ({n_dev},), got {seeds.shape}")
        sg = replicated_to_global(seeds, mesh, P("cluster"))
        return step(xg, lpg, accg, sg, consts_override=consts_g)

    return fn
