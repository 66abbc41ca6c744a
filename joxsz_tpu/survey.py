"""Multi-cluster survey fitting — CLI + library.

The reference fits one cluster per process invocation
(/root/reference/joxsz_main.py:93-246); a survey means running it C
times.  Here C clusters fit SIMULTANEOUSLY: their data containers stack
into one pytree with a leading cluster axis (models/multicluster.py)
and C independent walker ensembles advance in one jitted scan
(sampling/batched.py) — the TPU's natural batch axis, measured at
22M evals/s for C=4 x W=1024 on one chip (docs/PERFORMANCE.md).

Two modes:

* ``--spec survey.json`` — real data: one ``JoXSZConfig`` JSON per
  cluster.  Heterogeneous surveys are handled automatically: clusters
  are GROUPED by model family (the thawed parameter vector) and stack
  signature (map geometry + every data-leaf shape, the
  rectangular-stacking requirement), one batched fit runs per group
  (each on the fused kernel path where its group qualifies — the kernel
  specialises per family, so a gnfw group and a knots group each get
  their own kernel instead of tripping StackMismatch into the ~10x
  slower XLA fallback), and same-family groups merge back into ONE
  survey result in spec order — the user never sees a
  shape/StackMismatch error or has to split the spec by hand::

      {"clusters": [{"name": "cl1", "config": "cl1.json"},
                    {"name": "cl2", "config": "cl2.json"}]}

* ``--mock C`` — injection-recovery demo: C clusters simulated from the
  bundled CL J1226.9+3332 configuration at distinct true parameters
  through the likelihood's own forward + noise models
  (joxsz_tpu.simulate), fit jointly, recovered medians compared against
  the injected truths.

Usage:
    python -m joxsz_tpu.survey --mock 4 --cpu --quick
    python -m joxsz_tpu.survey --spec survey.json --walkers 256
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import time

import numpy as np


@dataclasses.dataclass
class SurveyResult:
    cluster_names: list[str]
    param_names: list[str]
    chain: np.ndarray            # (n_saved, C, W, D) thinned post-burn
    log_prob: np.ndarray         # (n_saved, C, W)
    acceptance: np.ndarray       # (C, W)
    medians: np.ndarray          # (C, D)
    sds: np.ndarray              # (C, D)
    truths: np.ndarray | None = None    # (C, D) mock mode only
    timings: dict | None = None  # kernel path: setup vs sampling wall (s)

    def flat_chain(self, c: int) -> np.ndarray:
        """((n_saved*W), D) posterior sample of cluster ``c``."""
        n_saved, C, W, D = self.chain.shape
        return self.chain[:, c].reshape(-1, D)

    def to_dict(self) -> dict:
        out = {
            "param_names": self.param_names,
            "clusters": [
                {
                    "name": self.cluster_names[c],
                    "acceptance": float(self.acceptance[c].mean()),
                    "median": dict(zip(self.param_names,
                                       self.medians[c].tolist())),
                    "sd": dict(zip(self.param_names,
                                   self.sds[c].tolist())),
                }
                for c in range(len(self.cluster_names))
            ],
        }
        if self.truths is not None:
            for c, row in enumerate(out["clusters"]):
                row["truth"] = dict(zip(self.param_names,
                                        self.truths[c].tolist()))
        return out


def fit_survey(model, sz_stack, xray_stack, centers, *,
               cluster_names=None, n_walkers=64, n_burn=500, n_steps=500,
               thin=5, seed=0, init_spread=0.05, flatten=True,
               truths=None, session=None, step_kernel=False,
               kernel_interpret=False, mesh=None) -> SurveyResult:
    """Fit C stacked clusters jointly; returns per-cluster posteriors.

    ``model``: a single-cluster JointModel providing components/priors
    (every cluster must thaw the same parameter vector — same model
    family); ``sz_stack``/``xray_stack``: stacked data pytrees
    (models.multicluster.stack_*); ``centers``: (C, D) per-cluster
    walker-init centers (config defaults, per-cluster MLEs, or truths).

    ``step_kernel=True`` (needs ``session``) runs burn and sampling
    through the fused cluster-grid Pallas kernel
    (ops.make_multicluster_step_kernel — whole MCMC steps on-chip, the
    TPU production path); configurations outside the kernel
    specialisation fall back to the XLA scan with a warning.  With a
    ``mesh`` carrying a 'cluster' axis, the kernel path shards the
    cluster grid over the devices (parallel.kernel_sharded.
    make_sharded_multicluster_step — exact parallelism over independent
    posteriors, bit-identical to the single-device kernel)."""
    import jax

    from .models.multicluster import make_multicluster_log_like
    from .sampling.batched import batched_init, run_batched_ensembles

    centers = np.atleast_2d(np.asarray(centers))
    C, D = centers.shape
    names = list(model.params.thawed)
    if D != len(names):
        raise ValueError(f"centers have {D} columns but the model thaws "
                         f"{len(names)} parameters {names}")
    dtype = (np.float64 if jax.config.jax_enable_x64 else np.float32)

    chain = None
    timings = None
    if step_kernel:
        if session is None:
            raise ValueError("step_kernel=True needs the FitSession "
                             "(pass session=)")
        out = _fit_survey_kernel(
            session, sz_stack, xray_stack, centers, n_walkers=n_walkers,
            n_burn=n_burn, n_steps=n_steps, thin=thin, seed=seed,
            init_spread=init_spread, interpret=kernel_interpret,
            mesh=mesh)
        if out is None:
            import warnings

            warnings.warn("configuration outside the multicluster "
                          "step-kernel specialisation; falling back to "
                          "the XLA scan sampler"
                          + (" (the 'cluster' mesh request is IGNORED "
                             "on this path)" if mesh is not None else ""),
                          stacklevel=2)
        else:
            chain, lp_chain, acc, timings = out

    if chain is None:
        batched_ll = jax.jit(make_multicluster_log_like(
            model, sz_stack, xray_stack, flatten=flatten))
        k_init, k_run = jax.random.split(jax.random.PRNGKey(seed))
        p0 = batched_init(batched_ll, centers.astype(dtype), n_walkers,
                          k_init, spread=init_spread)
        chain, lp_chain, acc, _ = run_batched_ensembles(
            batched_ll, p0, n_burn, n_steps, k_run, thin=thin,
            record_log_prob=True)
    flat = np.transpose(chain, (1, 0, 2, 3)).reshape(C, -1, D)
    return SurveyResult(
        cluster_names=(list(cluster_names) if cluster_names is not None
                       else [f"cluster{c}" for c in range(C)]),
        param_names=names,
        chain=chain,
        log_prob=lp_chain,
        acceptance=acc,
        medians=np.median(flat, axis=1),
        sds=np.std(flat, axis=1),
        truths=None if truths is None else np.asarray(truths),
        timings=timings,
    )


def _fit_survey_kernel(session, sz_stack, xray_stack, centers, *,
                       n_walkers, n_burn, n_steps, thin, seed,
                       init_spread, interpret=False, mesh=None):
    """Kernel path: whole stretch-move steps fused on-chip, one grid
    step per cluster (ops/pallas_joint.py); with a 'cluster' mesh axis,
    one cluster block per device (parallel/kernel_sharded.py).  Returns
    (chain (n_saved, C, W, D), lp_chain, acceptance, timings) or None
    when the session/stack is outside the kernel specialisation."""
    import jax
    import jax.numpy as jnp

    from .models.multicluster import make_multicluster_log_like
    from .ops.pallas_joint import (_build_spec, make_multicluster_consts,
                                   make_multicluster_step_kernel)
    from .sampling.batched import batched_init

    t0 = time.time()
    # ONE spec assembly (full table-operator construction) shared by the
    # consts stack, the burn/sampling kernel builders, and the init/lp0
    # likelihood core below — each would otherwise rebuild it.
    spec = _build_spec(session)
    if spec is None:
        return None
    consts = make_multicluster_consts(session, sz_stack, xray_stack,
                                      spec=spec)
    if consts is None:
        return None
    n_dev = (mesh.shape.get("cluster", 1) if mesh is not None else 1)
    if n_dev > 1:
        from .parallel.kernel_sharded import make_sharded_multicluster_step

        def build(n_inner, thin_=None):
            fn = make_sharded_multicluster_step(
                session, sz_stack, xray_stack, mesh, n_inner=n_inner,
                n_walkers=n_walkers, thin=thin_, interpret=interpret,
                consts=consts, spec=spec)
            if fn is None:
                return None
            # per-device seed vector derived from the scalar call seed
            return lambda x, lp, acc, s: fn(
                x, lp, acc,
                jnp.int32(s) * n_dev + jnp.arange(n_dev, dtype=jnp.int32))
    else:
        def build(n_inner, thin_=None):
            return make_multicluster_step_kernel(
                session, sz_stack, xray_stack, n_inner=n_inner,
                n_walkers=n_walkers, thin=thin_, interpret=interpret,
                consts=consts, spec=spec)

    samp = build(n_steps, thin)
    if samp is None:
        return None
    burn = build(n_burn) if n_burn else None
    if n_burn and burn is None:
        return None

    # Init/lp0 through the fused LIKELIHOOD kernel, one dispatch per
    # cluster with that cluster's constants as arguments: the compiled
    # program is data-independent (cached across surveys) and lp0 is
    # computed by the same ll_body the step kernel uses internally.
    # Fallback: the flat widened-GEMM XLA likelihood (exact here — the
    # step-kernel builder just validated the homogeneous-stack
    # requirement, which is the flat path's exactness condition).
    from .ops.pallas_joint import make_joint_core

    C = centers.shape[0]
    core = make_joint_core(session, block_b=min(256, n_walkers),
                           interpret=interpret, spec=spec)
    if core is not None:
        per_c = [tuple(v[c] for v in consts) for c in range(C)]

        def batched_ll(x):
            return jnp.stack([core._jitted(x[c], per_c[c])
                              for c in range(C)])
    else:       # pragma: no cover — same spec gate as the step kernel
        batched_ll = jax.jit(make_multicluster_log_like(
            session.model, sz_stack, xray_stack, flatten=True))
    p0 = batched_init(batched_ll, jnp.asarray(centers, jnp.float32),
                      n_walkers, jax.random.PRNGKey(seed),
                      spread=init_spread)
    x = jnp.asarray(p0, jnp.float32)
    lp = jnp.asarray(batched_ll(x), jnp.float32)
    acc = jnp.zeros((C, n_walkers), jnp.float32)
    jax.block_until_ready((x, lp))
    t_setup = time.time() - t0

    t0 = time.time()
    if burn is not None:
        x, lp, acc = burn(x, lp, acc, 2 * seed + 1)
        acc = jnp.zeros_like(acc)
    x, lp, acc, chain, chain_lp = samp(x, lp, acc, 2 * seed + 2)
    jax.block_until_ready((x, lp, acc))
    t_sampling = time.time() - t0
    return (np.transpose(np.asarray(chain), (1, 0, 2, 3)),
            np.transpose(np.asarray(chain_lp), (1, 0, 2)),
            np.asarray(acc) / float(n_steps),
            {"setup_s": t_setup, "sampling_s": t_sampling})


def _stack_signature(sess) -> tuple:
    """Hashable stack signature of one cluster: the map-geometry static
    (sep) plus the SHAPE of every SZ/X-ray data leaf — exactly the
    rectangular-stacking requirement of ``models.multicluster.stack_*``.
    Clusters sharing a signature batch into one fit; value-level
    heterogeneity inside a group (e.g. different redshifts on equal
    grids) is already handled downstream (the flat path falls back to
    nested vmap, the Pallas kernel declines via StackMismatch)."""
    import jax

    def shapes(tree):
        if tree is None:
            return ("none",)
        return tuple(tuple(np.shape(leaf))
                     for leaf in jax.tree_util.tree_leaves(tree))

    sz = sess.model.sz_data
    # static flags that change the pytree STRUCTURE (not any leaf shape)
    # must key the group too, or mixed specs die inside stack_sz_data
    # with an error the docstring promises the user never sees
    statics = (int(sz.sep), bool(getattr(sz, "calc_integ", False)))
    return (statics + shapes(sz) + shapes(sess.model.xray_data)
            + _model_fingerprint(sess))


def _model_fingerprint(sess) -> tuple:
    """Model-level settings a batched group SHARES from its
    representative session: the prior boxes/Gaussians and the
    physicality-veto flag.  Two clusters with identical shapes and
    family but e.g. different prior bounds or exclude_unphysical_mass
    must NOT batch — the group fit would silently apply the first
    cluster's model to all (r5 review)."""
    p = sess.params
    return (bool(getattr(sess.model, "exclude_unphysical_mass", True)),
            tuple(np.asarray(p.lo, float)),
            tuple(np.asarray(p.hi, float)),
            tuple(bool(g) for g in np.asarray(p.is_gauss)),
            tuple(np.asarray(p.mu, float)),
            tuple(np.asarray(p.sigma, float)))


def _merge_survey_results(results: list[SurveyResult],
                          orders: list[list[int]], C: int) -> SurveyResult:
    """Merge per-group SurveyResults into ONE result in original spec
    order.  Chains concatenate along the cluster axis (every group runs
    the same schedule, so (n_saved, W, D) match); per-group kernel
    timings are kept as a list."""
    n_saved, _, W, D = results[0].chain.shape
    names = [None] * C
    chain = np.empty((n_saved, C, W, D), results[0].chain.dtype)
    log_prob = np.empty((n_saved, C, W), results[0].log_prob.dtype)
    acceptance = np.empty((C, W), results[0].acceptance.dtype)
    medians = np.empty((C, D))
    sds = np.empty((C, D))
    truths = (np.full((C, D), np.nan)
              if any(r.truths is not None for r in results) else None)
    for res, idxs in zip(results, orders):
        if res.chain.shape[0] != n_saved or res.chain.shape[2] != W:
            raise ValueError("survey groups ran different schedules")
        chain[:, idxs] = res.chain
        log_prob[:, idxs] = res.log_prob
        acceptance[idxs] = res.acceptance
        medians[idxs] = res.medians
        sds[idxs] = res.sds
        for i, c in enumerate(idxs):
            names[c] = res.cluster_names[i]
            if truths is not None:
                # a group without truths leaves NaN rows rather than
                # failing the whole merge (spec surveys carry no truths;
                # only mock surveys do, and those are single-group)
                truths[c] = (res.truths[i] if res.truths is not None
                             else np.nan)
    timings = None
    if any(r.timings is not None for r in results):
        timings = {"groups": [r.timings for r in results]}
    return SurveyResult(
        cluster_names=names, param_names=results[0].param_names,
        chain=chain, log_prob=log_prob, acceptance=acceptance,
        medians=medians, sds=sds, truths=truths, timings=timings)


def _build_spec_survey(spec_path, args):
    """--spec: one session per per-cluster config; clusters grouped by
    stack signature, data stacked per group.  Returns a list of groups
    ``(session, sz_stack, xray_stack, centers, names, truths,
    orig_indices)`` — one batched fit runs per group and the results
    merge back in spec order (heterogeneous surveys end-to-end; the
    reference workflow is one cluster per process invocation,
    /root/reference/joxsz_main.py:93-246)."""
    from .config import JoXSZConfig
    from .build import build_session
    from .models.multicluster import stack_sz_data, stack_xray_data
    from .sampling.mle import find_mle

    spec = json.loads(pathlib.Path(spec_path).read_text())
    entries = spec.get("clusters")
    if not entries:
        raise SystemExit(f"{spec_path}: no 'clusters' list")
    names, sessions = [], []
    for e in entries:
        cfgp = pathlib.Path(e["config"])
        if not cfgp.is_absolute():
            cfgp = pathlib.Path(spec_path).parent / cfgp
        cfg = JoXSZConfig.from_json(cfgp.read_text())
        _set_dtype(cfg)
        names.append(e.get("name", cfg.name))
        sessions.append(build_session(cfg, sz_only=args.sz_only))
    xr = [s.model.xray_data for s in sessions]
    if any(x is None for x in xr) and not all(x is None for x in xr):
        raise SystemExit("mixed SZ-only and joint clusters in one survey")

    # per-cluster init centers as a LIST: mixed model families thaw
    # different-length parameter vectors, so no (C, D) stack exists
    # across families — each group stacks its own below
    centers = [np.asarray(s.params.thawed_values()) for s in sessions]
    if args.mle:
        for c, s in enumerate(sessions):
            theta, ll = find_mle(s.log_like, centers[c],
                                 s.params.lo, s.params.hi)
            print(f"  {names[c]}: MLE log-like {ll:.2f}")
            centers[c] = np.asarray(theta)

    # group by (model family, stack signature): clusters batch into one
    # fit only when they thaw the SAME parameter vector AND stack
    # rectangularly.  Mixed-family specs split into per-family groups
    # that each reach their own fused kernel (the kernel specialises per
    # family, ops/pallas_joint._detect_family) instead of tripping
    # StackMismatch into the ~10x slower XLA fallback — or, worse,
    # failing outright as the pre-r5 hard error did.
    by_sig: dict[tuple, list[int]] = {}
    for i, s in enumerate(sessions):
        by_sig.setdefault(
            (tuple(s.params.thawed), _stack_signature(s)), []).append(i)
    groups = []
    for idxs in by_sig.values():
        sz_stack = stack_sz_data([sessions[i].model.sz_data
                                  for i in idxs])
        xray_stack = (None if xr[idxs[0]] is None
                      else stack_xray_data([xr[i] for i in idxs]))
        groups.append((sessions[idxs[0]], sz_stack, xray_stack,
                       np.stack([centers[i] for i in idxs]),
                       [names[i] for i in idxs], None,
                       idxs))
    return groups


def _build_mock_survey(C, args):
    """--mock C: simulate C clusters from the bundled configuration."""
    from .config import JoXSZConfig
    from .build import build_session
    from .simulate import simulate_survey

    cfg = JoXSZConfig.cl1226(args.data_dir)
    _set_dtype(cfg)
    sess = build_session(cfg, sz_only=args.sz_only)
    theta0 = np.asarray(sess.params.thawed_values())
    names = list(sess.params.thawed)
    rng = np.random.default_rng(args.seed)
    truths = np.tile(theta0, (C, 1))
    truths[:, names.index("P_0")] *= np.linspace(0.7, 1.3, C)
    if "\\beta" in names:
        truths[:, names.index("\\beta")] += np.linspace(-0.03, 0.03, C)
    survey = simulate_survey(sess.model, truths, rng)
    cl_names = [f"mock{c}" for c in range(C)]
    return (sess, survey.sz_stack, survey.xray_stack, truths,
            cl_names, truths)


def _set_dtype(cfg):
    import jax

    if jax.default_backend() == "cpu":
        cfg.dtype = "float64"
        jax.config.update("jax_enable_x64", True)
    else:
        cfg.dtype = "float32"


def _run_multihost_survey(args, sess, sz_stack, xray_stack, centers,
                          names, truths, info):
    """Worker body of the multihost survey: one SPMD fit over the global
    'cluster' mesh; each process keeps only its own cluster blocks
    (chains written locally), then tiny per-cluster summaries are
    allgathered so the coordinator prints and writes the full survey."""
    import jax
    from jax.experimental import multihost_utils

    from .models.multicluster import make_multicluster_log_like
    from .parallel.multihost import (global_mesh,
                                     run_multihost_multi_cluster)
    from .sampling.batched import batched_init

    C, D = centers.shape
    mesh = global_mesh(axis_names=("cluster",))
    n_dev = info.global_devices
    print(f"process {info.process_id}/{info.num_processes}: global mesh "
          f"of {n_dev} devices")
    if C % n_dev:
        raise SystemExit(f"clusters ({C}) must divide over the job's "
                         f"{n_dev} devices")

    dtype = (np.float64 if jax.config.jax_enable_x64 else np.float32)
    k_init, k_run = jax.random.split(jax.random.PRNGKey(args.seed))
    t0 = time.time()

    _flat_cache: list = []

    def flat_ll():
        # built LAZILY: with --step-kernel the flat XLA program (the
        # documented ~10x-slower path, with a costly compile on this
        # slow-compile host) is only needed if the kernel declines
        if not _flat_cache:
            _flat_cache.append(jax.jit(make_multicluster_log_like(
                sess.model, sz_stack, xray_stack, flatten=True)))
        return _flat_cache[0]

    # identical on every process: same program, same seed.  With
    # --step-kernel the init runs through the kernel's own joint core
    # (mirroring the single-host _fit_survey_kernel) so init finiteness
    # is judged by the SAME likelihood the kernel samples with and the
    # flat XLA path is never compiled just for init
    p0 = None
    if args.step_kernel:
        import jax.numpy as jnp

        from .ops.pallas_joint import (_build_spec, make_joint_core,
                                       make_multicluster_consts)

        spec = _build_spec(sess)
        consts = (make_multicluster_consts(sess, sz_stack, xray_stack,
                                           spec=spec, device=False)
                  if spec is not None else None)
        core = (make_joint_core(sess, block_b=min(256, args.walkers),
                                interpret=args.kernel_interpret,
                                spec=spec)
                if consts is not None else None)
        if core is not None:
            per_c = [tuple(v[c] for v in consts) for c in range(C)]

            def core_ll(x):
                return jnp.stack([core._jitted(x[c], per_c[c])
                                  for c in range(C)])

            p0 = np.asarray(batched_init(
                core_ll, jnp.asarray(centers, jnp.float32),
                args.walkers, k_init))
    if p0 is None:
        p0 = np.asarray(batched_init(flat_ll(), centers.astype(dtype),
                                     args.walkers, k_init))
    out = None
    if args.step_kernel:
        out = _multihost_kernel_fit(args, sess, sz_stack, xray_stack,
                                    p0, flat_ll, mesh)
        if out is None:
            if info.is_coordinator:
                print("note: configuration outside the multicluster "
                      "step-kernel specialisation; falling back to the "
                      "XLA sampler")
        elif info.is_coordinator:
            print("kernel path: cluster-grid Pallas step sharded over "
                  f"the {n_dev}-device global mesh")
    if out is None:
        out = run_multihost_multi_cluster(
            flat_ll(), p0, args.steps, k_run, mesh, thin=args.thin,
            n_burn=args.burn, record=True)
    wall = time.time() - t0
    c0, c1 = out["cluster_range"]
    evals = C * args.walkers * (args.burn + args.steps)
    print(f"process {info.process_id}: clusters [{c0}, {c1}) sampled in "
          f"{wall:.1f}s ({evals/wall:.0f} global evals/s); acceptance "
          f"{out['acceptance_fraction'].mean():.3f}")

    # local (n_saved, C_loc, W, D) -> per-cluster flat posteriors
    chain = out["chain"]
    flat = np.transpose(chain, (1, 0, 2, 3)).reshape(c1 - c0, -1, D)
    med_loc = np.median(flat, axis=1)
    sd_loc = np.std(flat, axis=1)
    acc_loc = out["acceptance_fraction"].mean(axis=1)

    if args.save_chains:
        from .io.checkpoint import save_chain_hdf5

        outdir = pathlib.Path(args.out).parent
        for i, c in enumerate(range(c0, c1)):
            p = outdir / f"{names[c]}_chain.hdf5"
            save_chain_hdf5(str(p), chain[:, i],
                            out["chain_log_prob"][:, i],
                            out["acceptance_fraction"][i],
                            list(sess.params.thawed),
                            nburn=args.burn, nthin=args.thin)
            print(f"process {info.process_id}: written {p}")

    # tiny summaries ride the control plane; blocks are reassembled by
    # their gathered [c0, c1) ranges, not by process order
    ranges = multihost_utils.process_allgather(
        np.array([c0, c1], np.int64))
    med_all = multihost_utils.process_allgather(med_loc)
    sd_all = multihost_utils.process_allgather(sd_loc)
    acc_all = multihost_utils.process_allgather(acc_loc)
    medians = np.empty((C, D))
    sds = np.empty((C, D))
    acc = np.empty(C)
    covered = np.zeros(C, bool)
    for p in range(info.num_processes):
        lo, hi = (int(v) for v in ranges[p])
        medians[lo:hi] = med_all[p]
        sds[lo:hi] = sd_all[p]
        acc[lo:hi] = acc_all[p]
        covered[lo:hi] = True
    if not covered.all():
        raise SystemExit(f"cluster coverage gap: {np.flatnonzero(~covered)}")

    if info.is_coordinator:
        pnames = list(sess.params.thawed)
        for c in range(C):
            print(f"--- {names[c]} ---")
            for i, n in enumerate(pnames):
                line = (f"  {n:>18} | {medians[c, i]:9.3f} "
                        f"+- {sds[c, i]:7.3f}")
                if truths is not None:
                    pull = ((medians[c, i] - truths[c, i])
                            / max(sds[c, i], 1e-12))
                    line += (f"   truth {truths[c, i]:9.3f} "
                             f"(pull {pull:+.1f} sd)")
                print(line)
        summary = {
            "param_names": pnames,
            "multihost": {"num_processes": info.num_processes,
                          "global_devices": n_dev,
                          "ranges": ranges.tolist()},
            "clusters": [
                {"name": names[c],
                 "acceptance": float(acc[c]),
                 "median": dict(zip(pnames, medians[c].tolist())),
                 "sd": dict(zip(pnames, sds[c].tolist())),
                 **({"truth": dict(zip(pnames, truths[c].tolist()))}
                    if truths is not None else {})}
                for c in range(C)
            ],
        }
        outp = pathlib.Path(args.out)
        outp.write_text(json.dumps(summary, indent=2))
        print(f"written {outp}")
    return {"cluster_range": (c0, c1), "medians": medians, "sds": sds}


def _multihost_kernel_fit(args, sess, sz_stack, xray_stack, p0,
                          flat_ll, mesh):
    """Multihost production path: the cluster-grid Pallas step kernel
    sharded over the global 'cluster' mesh axis across processes
    (parallel.multihost.make_multihost_multicluster_step), burn then
    thinned-chain sampling; returns the same dict layout as
    run_multihost_multi_cluster(record=True) or None outside the kernel
    specialisation."""
    import jax

    from .ops.pallas_joint import _build_spec, make_multicluster_consts
    from .parallel.multihost import (local_block,
                                     make_multihost_multicluster_step)

    spec = _build_spec(sess)
    if spec is None:
        return None
    consts_host = make_multicluster_consts(sess, sz_stack, xray_stack,
                                           spec=spec, device=False)
    if consts_host is None:
        return None
    from .parallel.multihost import place_multicluster_consts

    consts_g = place_multicluster_consts(consts_host, mesh)
    kw = dict(mesh=mesh, n_walkers=args.walkers,
              interpret=args.kernel_interpret, spec=spec,
              consts_host=consts_host, consts_global=consts_g)
    samp = make_multihost_multicluster_step(
        sess, sz_stack, xray_stack, n_inner=args.steps, thin=args.thin,
        **kw)
    if samp is None:
        return None
    burn = (make_multihost_multicluster_step(
        sess, sz_stack, xray_stack, n_inner=args.burn, **kw)
        if args.burn else None)
    if args.burn and burn is None:
        return None

    C, W, _ = p0.shape
    n_dev = mesh.shape["cluster"]
    x = np.asarray(p0, np.float32)
    # lp0 through the fused likelihood core — the SAME ll_body the step
    # kernel evaluates internally (the XLA flat path differs by ~0.01 in
    # log-like on the TPU MXU, which would skew first accept tests);
    # mirrors the single-host _fit_survey_kernel init
    from .ops.pallas_joint import make_joint_core

    core = make_joint_core(sess, block_b=min(256, W),
                           interpret=args.kernel_interpret, spec=spec)
    if core is not None:
        lp = np.stack([np.asarray(core._jitted(x[c],
                                               tuple(v[c] for v in
                                                     consts_host)))
                       for c in range(C)]).astype(np.float32)
    else:       # pragma: no cover — same spec gate as the step kernel
        lp = np.asarray(flat_ll()(x), np.float32)
    acc = np.zeros((C, W), np.float32)
    base = 2 * args.seed * n_dev
    seeds = base + np.arange(n_dev, dtype=np.int32)
    if burn is not None:
        x, lp, _ = burn(x, lp, acc, seeds)
    x, lp, acc_g, chain, chain_lp = samp(
        x, lp, acc, seeds + n_dev)
    jax.block_until_ready((x, lp))
    c0, c1, x_loc = local_block(x)
    _, _, lp_loc = local_block(lp)
    _, _, acc_loc = local_block(acc_g)
    _, _, chain_loc = local_block(chain)          # (C_loc, n_keep, W, D)
    _, _, chain_lp_loc = local_block(chain_lp)
    return {
        "cluster_range": (c0, c1),
        "positions": x_loc,
        "log_prob": lp_loc,
        "acceptance_fraction": acc_loc / float(args.steps),
        "chain": np.transpose(chain_loc, (1, 0, 2, 3)),
        "chain_log_prob": np.transpose(chain_lp_loc, (1, 0, 2)),
    }


def _multihost_launch(args):
    """Spawn N local worker processes running this survey as one
    jax.distributed job (virtual-CPU test/single-host mode).  Workers
    are polled so one crashing fails the job fast instead of leaving its
    peers on the distributed barrier."""
    import socket
    import subprocess
    import sys
    import tempfile

    if args.population:
        raise SystemExit(
            "--population needs every cluster's chain in one process; "
            "run it offline from --save-chains output")
    n = args.multihost_launch
    k = args.cpu_devices or 1
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    base = [sys.executable, "-u", "-m", "joxsz_tpu.survey",
            "--multihost", coord, "--nprocs", str(n),
            "--cpu-devices", str(k),
            "--data-dir", args.data_dir,
            "--walkers", str(args.walkers), "--burn", str(args.burn),
            "--steps", str(args.steps), "--thin", str(args.thin),
            "--seed", str(args.seed), "--out", args.out]
    if args.spec:
        base += ["--spec", args.spec]
    else:
        base += ["--mock", str(args.mock)]
    for flag in ("sz_only", "quick", "mle", "save_chains",
                 "step_kernel", "kernel_interpret"):
        if getattr(args, flag):
            base.append("--" + flag.replace("_", "-"))

    with tempfile.TemporaryDirectory(prefix="joxsz_mh_") as td:
        td = pathlib.Path(td)
        procs = []
        try:
            for i in range(n):
                log = open(td / f"w{i}.log", "w")
                procs.append((subprocess.Popen(
                    base + ["--procid", str(i)], stdout=log,
                    stderr=subprocess.STDOUT), log))
            deadline = time.monotonic() + 1800
            fail = False
            live = dict(enumerate(procs))
            while live and not fail:
                for i in list(live):
                    rc = live[i][0].poll()
                    if rc is None:
                        continue
                    del live[i]
                    if rc:
                        fail = True
                        print(f"worker {i} FAILED (rc={rc}):")
                        print((td / f"w{i}.log").read_text()[-3000:])
                if time.monotonic() > deadline:
                    fail = True
                    print(f"TIMEOUT: workers {sorted(live)} still "
                          f"running after 1800s")
                if live and not fail:
                    time.sleep(0.25)
        finally:
            for p, log in procs:
                if p.poll() is None:
                    p.terminate()
                    try:
                        p.wait(timeout=10)
                    except subprocess.TimeoutExpired:
                        p.kill()
                        p.wait()
                log.close()
        if fail:
            raise SystemExit(1)
        # surface the coordinator's output (summary table, file paths)
        print((td / "w0.log").read_text(), end="")
    return None


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="JoXSZ-TPU multi-cluster survey fit")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--spec", metavar="SURVEY_JSON",
                   help="survey spec: {'clusters': [{'name', 'config'}]}")
    g.add_argument("--mock", type=int, metavar="C",
                   help="injection-recovery demo with C simulated "
                        "clusters from the bundled configuration")
    ap.add_argument("--data-dir", default="/root/reference/data")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sz-only", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="short schedule for smoke testing")
    ap.add_argument("--walkers", type=int, default=64)
    ap.add_argument("--burn", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--thin", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mle", action="store_true",
                    help="per-cluster MLE warm starts (spec mode)")
    ap.add_argument("--step-kernel", action="store_true",
                    help="run burn+sampling through the fused cluster-"
                         "grid Pallas kernel (TPU only; falls back to "
                         "the XLA scan outside its specialisation)")
    ap.add_argument("--mesh", type=int, metavar="N",
                    help="shard the cluster grid over an N-device "
                         "'cluster' mesh (kernel path only — use with "
                         "--step-kernel): one block of C/N clusters "
                         "per chip, bit-identical per block at "
                         "matching per-device seeds; N must divide C")
    ap.add_argument("--population", metavar="PARAM[:FAMILY]",
                    help="stage-2 hierarchical population inference on "
                         "one fitted parameter (family 'lognormal' "
                         "[default] or 'gaussian'): posterior of the "
                         "population mean and intrinsic scatter via the "
                         "importance-reweighting hyper-likelihood "
                         "(sampling/population.py); e.g. 'P_0' or "
                         "'\\beta:gaussian'")
    ap.add_argument("--out", default="survey_summary.json")
    ap.add_argument("--save-chains", action="store_true",
                    help="write one emcee-layout HDF5 chain per cluster "
                         "(usable with run.py --postprocess)")
    mh = ap.add_argument_group(
        "multi-host", "one jax.distributed job spanning processes/hosts: "
        "the cluster axis shards over every process's devices; chains "
        "never cross hosts (parallel/multihost.py). On a TPU pod run one "
        "process per host with --multihost/--nprocs/--procid; "
        "--multihost-launch N spawns N local virtual-CPU workers (test/"
        "single-host mode).")
    mh.add_argument("--multihost", metavar="HOST:PORT",
                    help="join the job at this coordinator address")
    mh.add_argument("--nprocs", type=int, default=None,
                    help="total processes in the job")
    mh.add_argument("--procid", type=int, default=None,
                    help="this process's id (0..nprocs-1)")
    mh.add_argument("--cpu-devices", type=int, default=None,
                    help="virtual CPU devices per process (test mode; "
                         "omit on a real TPU pod)")
    mh.add_argument("--multihost-launch", type=int, metavar="N",
                    help="spawn N local worker processes running this "
                         "same survey as one distributed job "
                         "(--cpu-devices defaults to 1)")
    mh.add_argument("--kernel-interpret", action="store_true",
                    help=argparse.SUPPRESS)  # CPU interpret-mode kernel
                                             # (tests/demos only)
    args = ap.parse_args(argv)

    if args.multihost_launch:
        return _multihost_launch(args)

    mh_info = None
    if args.multihost:
        if args.nprocs is None or args.procid is None:
            raise SystemExit("--multihost needs --nprocs and --procid")
        if args.population:
            raise SystemExit(
                "--population needs every cluster's chain in one "
                "process; run it offline from --save-chains output "
                "(chains never cross hosts in multihost mode)")
        from .parallel.multihost import initialize

        # must run before ANY jax backend/device use
        mh_info = initialize(args.multihost, args.nprocs, args.procid,
                             cpu_devices=args.cpu_devices)

    import jax
    if args.cpu and mh_info is None:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if args.quick:
        args.walkers, args.burn, args.steps, args.thin = 32, 150, 150, 5

    t0 = time.time()
    if args.spec:
        groups = _build_spec_survey(args.spec, args)
    else:
        sess, sz_stack, xray_stack, centers, names, truths = \
            _build_mock_survey(args.mock, args)
        groups = [(sess, sz_stack, xray_stack, centers, names, truths,
                   list(range(len(names))))]
    C = sum(len(g[6]) for g in groups)
    names = [None] * C
    for g in groups:
        for i, c in enumerate(g[6]):
            names[c] = g[4][i]
    xray_any = any(g[2] is not None for g in groups)
    print(f"survey of {C} clusters built in {time.time()-t0:.1f}s "
          f"({'joint SZ+X' if xray_any else 'SZ-only'}; "
          f"{len(groups)} stack group(s); "
          f"backend {jax.default_backend()})")

    if mh_info is not None:
        if len(groups) > 1:
            raise SystemExit(
                "--multihost needs a homogeneous survey (one stack "
                f"group; this spec has {len(groups)}): split the spec "
                "by instrument configuration for multihost runs")
        sess, sz_stack, xray_stack, centers, _, truths, _ = groups[0]
        if (args.step_kernel and jax.default_backend() == "cpu"
                and not args.kernel_interpret):
            print("note: --step-kernel needs the TPU hardware PRNG; "
                  "falling back to the XLA sampler on CPU")
            args.step_kernel = False
        return _run_multihost_survey(args, sess, sz_stack, xray_stack,
                                     centers, names, truths, mh_info)

    use_kernel = args.step_kernel
    if (use_kernel and jax.default_backend() == "cpu"
            and not args.kernel_interpret):
        print("note: --step-kernel needs the TPU hardware PRNG; "
              "falling back to the XLA sampler on CPU")
        use_kernel = False

    mesh = None
    if args.mesh:
        if not use_kernel:
            print("note: --mesh shards the cluster-grid KERNEL path "
                  "only; without --step-kernel (or on CPU) the XLA "
                  "sampler runs single-device — ignoring --mesh")
        elif args.mesh > jax.device_count():
            raise SystemExit(f"--mesh {args.mesh} needs {args.mesh} "
                             f"devices, have {jax.device_count()}")
        else:
            from .parallel import make_mesh

            mesh = make_mesh(args.mesh, axis_names=("cluster",))

    t0 = time.time()
    results, orders = [], []
    for gi, (gsess, sz_stack, xray_stack, centers, gnames, truths,
             idxs) in enumerate(groups):
        if len(groups) > 1:
            print(f"group {gi + 1}/{len(groups)}: "
                  f"{len(idxs)} cluster(s) {gnames}")
        # per-group mesh gate: an auto-grouped heterogeneous spec can
        # split into groups whose cluster count doesn't divide over the
        # mesh — run those single-device with a note instead of dying
        # mid-run in make_sharded_multicluster_step and losing every
        # group already fit
        gmesh = mesh
        if mesh is not None and len(idxs) % args.mesh != 0:
            print(f"  note: {len(idxs)} cluster(s) don't divide over "
                  f"the {args.mesh}-device mesh — this group runs "
                  "single-device")
            gmesh = None
        results.append(fit_survey(
            gsess.model, sz_stack, xray_stack, centers,
            cluster_names=gnames, n_walkers=args.walkers,
            n_burn=args.burn, n_steps=args.steps,
            thin=args.thin, seed=args.seed + gi, truths=truths,
            session=gsess, step_kernel=use_kernel,
            kernel_interpret=args.kernel_interpret, mesh=gmesh))
        orders.append(idxs)
    # merge per MODEL FAMILY: groups sharing one thawed parameter
    # vector merge into a rectangular result exactly as before; a
    # mixed-family spec yields one merged result PER family (chains of
    # different families have different widths — there is no single
    # rectangular chain to merge them into)
    byfam: dict[tuple, list[int]] = {}
    for gi, r in enumerate(results):
        byfam.setdefault(tuple(r.param_names), []).append(gi)
    fam_bundles = []      # (merged SurveyResult, spec indices in row order)
    for gis in byfam.values():
        rs = [results[gi] for gi in gis]
        if len(rs) == 1:
            fam_bundles.append((rs[0], list(orders[gis[0]])))
        else:
            specs = sorted(i for gi in gis for i in orders[gi])
            pos = {s: k for k, s in enumerate(specs)}
            fam_bundles.append((_merge_survey_results(
                rs, [[pos[i] for i in orders[gi]] for gi in gis],
                len(specs)), specs))
    single_family = len(fam_bundles) == 1
    res = fam_bundles[0][0]
    # spec-order lookup: cluster c -> (its family's result, local row)
    where = {}
    for fres, specs in fam_bundles:
        for local, spec_i in enumerate(specs):
            where[spec_i] = (fres, local)

    evals = C * args.walkers * (args.burn + args.steps)
    wall = time.time() - t0
    acc_by_cluster = np.array([where[c][0].acceptance[where[c][1]].mean()
                               for c in range(C)])
    print(f"fit {C} x {args.walkers} walkers x "
          f"{args.burn}+{args.steps} steps in {wall:.1f}s "
          f"({evals/wall:.0f} evals/s); acceptance "
          f"{np.round(acc_by_cluster, 3)}")
    for fres, specs in fam_bundles:
        if fres.timings is not None and "setup_s" in fres.timings:
            ts, tk = fres.timings["setup_s"], fres.timings["sampling_s"]
            # evals for THIS family's clusters only — dividing the
            # whole survey's count by one family's wall would inflate
            # every mixed-family line
            evals_f = len(specs) * args.walkers * (args.burn + args.steps)
            print(f"  kernel path: {ts:.1f}s one-time setup "
                  f"(builders/init) + {tk:.1f}s burn+sampling (incl. "
                  f"first-call compile; {evals_f/tk:.0f} evals/s)")

    for c in range(C):
        fres, local = where[c]
        print(f"--- {names[c]} ---")
        for i, n in enumerate(fres.param_names):
            line = (f"  {n:>18} | {fres.medians[local, i]:9.3f} "
                    f"+- {fres.sds[local, i]:7.3f}")
            if fres.truths is not None:
                pull = ((fres.medians[local, i] - fres.truths[local, i])
                        / max(fres.sds[local, i], 1e-12))
                line += (f"   truth {fres.truths[local, i]:9.3f} "
                         f"(pull {pull:+.1f} sd)")
            print(line)

    if single_family:
        summary = res.to_dict()
    else:
        # per-cluster rows in spec order (each row's median/sd dicts
        # carry its own family's parameter names); the flat
        # 'param_names' key is meaningless across families, so it is
        # None and 'families' lists each family's vector
        clusters = [None] * C
        fam_names = []
        for fres, specs in fam_bundles:
            d = fres.to_dict()
            fam_names.append(d["param_names"])
            for local, spec_i in enumerate(specs):
                clusters[spec_i] = d["clusters"][local]
        summary = {"param_names": None, "families": fam_names,
                   "clusters": clusters}
    if args.population:
        if not single_family:
            raise SystemExit(
                "--population needs one shared model family (the "
                "hierarchy pools ONE parameter across clusters); this "
                f"spec mixes {len(fam_bundles)} families — split the "
                "spec by family")
        from .sampling.population import population_from_survey

        pspec = args.population.split(":")
        family = pspec[1] if len(pspec) > 1 else "lognormal"
        # the shared ParamSet comes from the first group's session: on
        # the --spec path no loop-free `sess` exists (that name is only
        # bound in the --mock branch; using it here crashed --spec
        # --population runs AFTER the whole fit — r4 review)
        pres = population_from_survey(res, groups[0][0].params, pspec[0],
                                      family=family, seed=args.seed)
        mu_label = ("ln " if family == "lognormal" else "") + pspec[0]
        print(f"population ({family}): <{mu_label}> = "
              f"{pres.mu:.4f} +- {pres.mu_sd:.4f}, intrinsic scatter "
              f"sigma = {pres.sigma:.4f} +- {pres.sigma_sd:.4f} "
              f"(min weight n_eff {pres.n_eff_weights.min():.0f} of "
              f"{pres.n_samples} stage-1 draws/cluster)")
        summary["population"] = pres.to_dict()

    out = pathlib.Path(args.out)
    out.write_text(json.dumps(summary, indent=2))
    print(f"written {out}")

    if args.save_chains:
        from .io.checkpoint import save_chain_hdf5

        for c in range(C):
            fres, local = where[c]
            p = out.parent / f"{names[c]}_chain.hdf5"
            save_chain_hdf5(str(p), fres.chain[:, local],
                            fres.log_prob[:, local],
                            fres.acceptance[local], fres.param_names,
                            nburn=args.burn, nthin=args.thin)
            print(f"written {p}")
    # mixed-family runs have no single rectangular result: callers get
    # the per-family bundles in that case
    return res if single_family else fam_bundles


if __name__ == "__main__":
    main()
