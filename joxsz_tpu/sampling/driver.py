"""High-level fit driver: MLE -> walker init -> preliminary -> burn ->
sample, with checkpointing and timing.

Reproduces the phase structure of the reference's ``mcmc_run``
(/root/reference/joxsz_funcs.py:572-635, SURVEY.md §3.4):

  1. MLE warm start (mbproj2 doFitting equivalent),
  2. rejection-sampled walker initialisation around the MLE,
  3. "preliminary" loops of ``prelim_iterations`` steps repeated while the
     best log-probability still improves,
  4. ``nburn`` burn-in steps (discarded),
  5. ``nsteps`` sampling steps thinned by ``nthin`` -> the saved chain,
  6. acceptance-fraction report, HDF5 chain checkpoint + resume state.

Everything between host decisions runs device-resident; each phase is one
lax.scan.  Per-phase wall-clock and likelihood-evaluation throughput are
recorded in ``FitResult.timings`` (SURVEY.md §5.1: the reference has no
instrumentation; evals/sec is this framework's headline metric).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from .stretch import run_ensemble, generate_init_positions, EnsembleResult
from .mle import find_mle
from ..io.checkpoint import save_chain_hdf5, save_state, load_state


@dataclasses.dataclass
class FitResult:
    chain: np.ndarray             # (n_saved, n_walkers, ndim)
    log_prob: np.ndarray          # (n_saved, n_walkers)
    acceptance_fraction: np.ndarray
    mle_theta: np.ndarray
    mle_loglike: float
    param_names: list[str]
    timings: dict

    @property
    def flat_chain(self) -> np.ndarray:
        """((n_saved*n_walkers), ndim), walker-major like the reference's
        order='F' reshape (joxsz_main.py:213-214)."""
        n_saved, n_w, ndim = self.chain.shape
        return np.transpose(self.chain, (1, 0, 2)).reshape(-1, ndim)

    def cube_chain(self) -> np.ndarray:
        """(n_walkers, n_saved, ndim) — the reference's mcmc.chain layout."""
        return np.transpose(self.chain, (1, 0, 2))

    def summary_rows(self, units: list[str] | None = None):
        med = np.median(self.flat_chain, axis=0)
        std = np.std(self.flat_chain, axis=0)
        units = units or ["."] * len(self.param_names)
        return list(zip(self.param_names, med, std, units))

    def print_summary(self, units: list[str] | None = None):
        print(f"{'':>18}|{'Median':>10} |{'Sd':>9} |{'Unit':>13}")
        print("-" * 53)
        for name, med, std, unit in self.summary_rows(units):
            print(f"{name:>17} |{med:>9.3f} |{std:>8.3f} |{unit:>13}")


def run_fit(
    log_like,
    theta0: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    param_names: list[str],
    nwalkers: int = 30,
    nburn: int = 2000,
    nsteps: int = 5000,
    nthin: int = 5,
    seed: int | None = None,
    initspread: float = 0.1,
    prelim_iterations: int = 1000,
    max_prelim_rounds: int = 10,
    do_mle: bool = True,
    chain_path: str | None = None,
    state_path: str | None = None,
    best_path: str | None = None,
    resume_from: str | None = None,
    log_like_batch=None,
    n_temper_rungs: int = 0,
    checkpoint_every: int = 500,
    mesh=None,
    step_sampler=None,
    move: str = "stretch",
    auto_extend: int = 0,
    target_rhat: float = 1.01,
    verbose: bool = True,
    mle_cache: str | None = None,
) -> FitResult:
    """Full fit; pass ``resume_from`` (a state .npz written by a previous
    run) to skip MLE/init/preliminary/burn-in and continue sampling from
    the saved walker positions — a capability the reference lacks
    (SURVEY.md §5.4: write-side only).  ``log_like_batch`` may override the
    batched likelihood (e.g. the fused Pallas path).  ``step_sampler`` (a
    sampling.kernel.KernelSampler) routes the prelim/burn/sampling phases
    — including tempered sampling — through the fused Pallas kernels; for
    mesh runs only the SAMPLING phase is sharded (per-chip independent
    kernel ensembles; below 64 walkers/device the sampler auto-routes
    to the hybrid coupled law — see ``KernelSampler.run_sharded``; note
    the hybrid realises n_windows*sync_every ≈ nsteps and saves frames
    at effective spacing sync/(frames/window) slightly above ``nthin``,
    so step counts derived from the saved chain carry a ~1/sync_every
    conservative bias), prelim/burn stay on the single-device XLA
    sampler.

    ``move``: ensemble move for the XLA sampler phases — 'stretch'
    (default, the reference's emcee move), 'de', or 'snooker' (emcee
    move-zoo analogs; see sampling.stretch).  The fused step kernel,
    mesh, and tempered paths implement the stretch move only, so those
    combinations are rejected rather than silently downgraded.

    ``auto_extend``: after the scheduled ``nsteps``, keep sampling in
    further ``nsteps`` chunks (at most ``auto_extend`` of them, from the
    final walker state, through the same execution path) until the chain
    passes the convergence bar — total steps >= 20x the worst-parameter
    integrated autocorrelation time AND max split-Rhat <=
    ``target_rhat``.  The reference has no convergence management at
    all (fixed 5000 steps, joxsz_main.py:44); this turns the run_fit
    warnings into an actionable stopping rule.  With tempering the
    rule is applied to the cold-rung chain (the posterior product; the
    standard PT practice) and each extension round continues the FULL
    K-rung replica state, so the ladder keeps ferrying walkers between
    modes while the cold chain accumulates.

    Warmup-aware fallback: when the accumulated chain is long enough
    but split-Rhat fails while the TRAILING HALF certifies on both
    rules, the leading half is promoted to burn-in (chain trimmed,
    ``timings['extra_burn_steps']`` recorded, HDF5 burn attribute
    raised) — an insufficient ``nburn`` otherwise holds Rhat above the
    bar forever, since extensions dilute the head transient but never
    remove it."""
    timings: dict = {}
    key = jax.random.PRNGKey(0 if seed is None else seed)

    if move != "stretch":
        if step_sampler is not None:
            raise ValueError(
                f"move={move!r} is not available through the fused step "
                "kernel (stretch only); drop --step-kernel or use "
                "move='stretch'")
        if mesh is not None or n_temper_rungs > 1:
            raise ValueError(
                f"move={move!r} is not available on the mesh/tempered "
                "paths (stretch only)")

    if nsteps % nthin:
        new_nsteps = nsteps - nsteps % nthin
        if verbose:
            print(f"note: nsteps rounded down to {new_nsteps} "
                  f"(multiple of thin={nthin})")
        nsteps = new_nsteps

    sharded_step = None
    if step_sampler is not None and mesh is not None:
        # only the SAMPLING phase is sharded (per-chip independent
        # fused-kernel ensembles, parallel/kernel_sharded.py);
        # prelim/burn run the single-device XLA sampler
        sharded_step = step_sampler
        step_sampler = None
        # this fit is a fresh logical run: reset the sampler's per-run
        # sticky routing (hybrid vs independent ensembles) so a reused
        # KernelSampler doesn't inherit a previous fit's decision.
        # getattr: step_sampler is duck-typed (the documented interface
        # predates new_run) — custom samplers without it must keep
        # working
        getattr(sharded_step, "new_run", lambda: None)()
        if verbose:
            print("note: mesh run — sampling phase uses per-chip "
                  "fused-kernel ensembles; prelim/burn stay on the "
                  "single-device XLA sampler")

    if log_like_batch is None:
        log_like_batch = (step_sampler.log_prob_batch if step_sampler
                          is not None else jax.jit(jax.vmap(log_like)))

    resumed = None
    if resume_from is not None:
        resumed = load_state(resume_from)
        # continue the saved PRNG stream (folded once so a double-resume
        # from the same file still decorrelates from the original run's
        # consumed keys)
        key = jax.random.fold_in(
            jax.random.wrap_key_data(jnp.asarray(resumed["key"])), 1)
        if verbose:
            print(f"resuming from {resume_from} "
                  f"({resumed['positions'].shape[0]} walkers)")

    # 1. MLE
    t0 = time.time()
    if resumed is not None:
        mle_theta = resumed["positions"][np.argmax(resumed["log_probs"])]
        mle_ll = float(np.max(resumed["log_probs"]))
    elif do_mle:
        if verbose:
            print("MLE warm start...")
        if mle_cache is not None:
            # self-validating disk cache (sampling.mle.find_mle_cached):
            # the MLE is deterministic in (config, data), so repeat fits
            # of the same cluster skip the whole simplex loop — the
            # single fresh evaluation at the cached optimum guards
            # against changed data/physics
            from .mle import find_mle_cached

            mle_theta, mle_ll, hit = find_mle_cached(
                log_like, theta0, lo, hi, mle_cache, verbose=verbose)
            timings["mle_cached"] = hit
        else:
            mle_theta, mle_ll = find_mle(log_like, theta0, lo, hi,
                                         verbose=verbose)
    else:
        mle_theta = np.asarray(theta0, dtype=float)
        mle_ll = float(jax.jit(log_like)(jnp.asarray(mle_theta)))
    timings["mle_s"] = time.time() - t0

    # 2. walker init
    t0 = time.time()
    key, sub = jax.random.split(key)
    if resumed is not None:
        p0 = jnp.asarray(resumed["positions"])
        nwalkers = p0.shape[0]
    else:
        p0 = generate_init_positions(log_like_batch, mle_theta, nwalkers,
                                     sub, spread=initspread)
    timings["init_s"] = time.time() - t0

    # 3. preliminary improvement loop (reference joxsz_funcs.py:589-598)
    t0 = time.time()
    best = mle_ll
    rounds = 0
    while resumed is None and rounds < max_prelim_rounds:
        key, sub = jax.random.split(key)
        if step_sampler is not None:
            res = step_sampler.run(p0, prelim_iterations, sub,
                                   store_chain=False)
        else:
            res = run_ensemble(log_like_batch, p0, prelim_iterations, sub,
                               thin=prelim_iterations, store_chain=True,
                               move=move)
        p0 = res.final_state[0]
        newbest = float(np.max(np.asarray(res.final_state[1])))
        rounds += 1
        if verbose:
            print(f"preliminary round {rounds}: best ll {newbest:.2f}")
        if newbest < best:
            break
        best = newbest
    timings["prelim_s"] = time.time() - t0
    timings["prelim_rounds"] = rounds

    # 4. burn-in
    t0 = time.time()
    key, sub = jax.random.split(key)
    if resumed is None:
        # only the final burn-in state matters; save a single snapshot
        if step_sampler is not None:
            res = step_sampler.run(p0, nburn, sub, store_chain=False)
        else:
            res = run_ensemble(log_like_batch, p0, nburn, sub,
                               thin=max(nburn, 1), store_chain=True,
                               move=move)
        p1 = res.final_state[0]
    else:
        p1 = p0
    timings["burn_s"] = time.time() - t0

    # 5. sampling (optionally parallel-tempered for multimodal posteriors)
    t0 = time.time()
    key, sub = jax.random.split(key)

    _mesh_note = [verbose]

    def _sample_call(state_x, n, k):
        """One (possibly chunked) sampling call honoring the configured
        execution path: mesh-sharded (kernel ensembles, falling back to
        the XLA mesh sampler) > single-device fused kernel > XLA scan.
        Used by both the incremental-checkpoint loop and the one-shot
        path so the mesh cannot be silently dropped by branch order."""
        if mesh is not None:
            r = None
            if sharded_step is not None:
                # per-chip independent fused-kernel ensembles; falls
                # through to the XLA mesh sampler when the walker count
                # doesn't split evenly or the config mismatches the kernel
                try:
                    r = sharded_step.run_sharded(state_x, n, k, mesh,
                                                 thin=nthin,
                                                 verbose=verbose)
                except TypeError:
                    # duck-typed custom samplers predating the verbose
                    # kwarg (r5) keep working
                    r = sharded_step.run_sharded(state_x, n, k, mesh,
                                                 thin=nthin)
                if r is None and _mesh_note[0]:
                    _mesh_note[0] = False
                    print("note: sharded kernel sampler declined; falling "
                          "back to the XLA mesh sampler")
            if r is None:
                # walker-sharded sampling over a device mesh (multi-chip);
                # the program is identical to the single-device path
                # (tested bit-exact) — the mesh is a layout annotation
                from ..parallel.sharded import run_sharded_ensemble

                out = run_sharded_ensemble(log_like_batch, state_x, n, k,
                                           mesh, thin=nthin)
                r = EnsembleResult(
                    chain=out["chain"], log_prob=out["log_prob"],
                    acceptance_fraction=out["acceptance_fraction"],
                    final_state=(out["final"][0], out["final"][1], k),
                )
            return r
        if step_sampler is not None:
            return step_sampler.run(state_x, n, k, thin=nthin)
        return run_ensemble(log_like_batch, state_x, n, k, thin=nthin,
                            store_chain=True, move=move)

    def _eff_spacing(r) -> float:
        """Raw steps per saved frame for THIS result: nthin unless the
        sampler declared otherwise (the hybrid coupled sampler's frames
        are thin * sync_every/(sync_every-1) apart — see
        EnsembleResult.frame_spacing).  Every saved-frame -> raw-step
        conversion below (tau, length rules, burn promotion, HDF5 attrs)
        must go through this so hybrid chains self-correct."""
        fs = getattr(r, "frame_spacing", None)
        return float(fs) if fs else float(nthin)

    temper_state = None     # full (K, W, D) replica state for auto-extend
    swap_acc_rounds = []    # [(per-boundary swap rates, n steps)] — ladder
    #                         health must survive into timings/summary for
    #                         non-verbose production runs
    if n_temper_rungs > 1:
        from .tempered import run_tempered_ensemble, default_betas

        betas = default_betas(n_temper_rungs)

        def _temper_call(p_rungs, n, k):
            """One tempered sampling call honoring the configured
            execution path (mirrors ``_sample_call``); ``p_rungs`` is
            the full (K, W, D) replica state (or (W, D) replicated)."""
            r = None
            if sharded_step is not None:
                # independent per-chip tempered ensembles through the
                # fused kernel (parallel/kernel_sharded.py)
                r = sharded_step.run_tempered_sharded(p_rungs, betas, n,
                                                      k, mesh, thin=nthin)
            if r is None and step_sampler is not None:
                r = step_sampler.run_tempered(p_rungs, betas, n, k,
                                              thin=nthin)
            if r is None:
                r = run_tempered_ensemble(log_like_batch, p_rungs, betas,
                                          n, k, thin=nthin)
            return r

        def _adapt_tempered(rt, k):
            # adapt a TemperedResult to the common cold-rung interface;
            # the full replica state is kept separately (temper_state)
            return EnsembleResult(
                chain=rt.chain, log_prob=rt.log_prob,
                acceptance_fraction=rt.acceptance_fraction[0],
                final_state=(rt.final_state[0][0], rt.final_state[1][0],
                             k),
            )

        # resume continues the saved equilibrated replica ladder when the
        # state file carries one with a matching rung count; otherwise the
        # runner re-replicates the cold rung (and says so)
        p_start = p1
        if resumed is not None and "temper_state" in resumed:
            ts = np.asarray(resumed["temper_state"])
            if ts.shape[0] == n_temper_rungs:
                p_start = jnp.asarray(ts)
                if verbose:
                    print(f"resuming the full {ts.shape[0]}-rung replica "
                          "ladder from the saved state")
            elif verbose:
                print(f"note: saved ladder has {ts.shape[0]} rungs but "
                      f"--temper {n_temper_rungs} was requested; "
                      "restarting the ladder from a replicated cold rung")
        res_t = _temper_call(p_start, nsteps, sub)
        swap_acc_rounds.append(
            (np.asarray(res_t.swap_acceptance, float), nsteps))
        if verbose:
            print(f"swap acceptance per rung boundary: "
                  f"{np.round(res_t.swap_acceptance, 3)}")
        temper_state = res_t.final_state[0]
        res = _adapt_tempered(res_t, sub)
    elif chain_path and nsteps // nthin > checkpoint_every:
        # incremental persistence (the reference's HDF backend writes the
        # chain as it goes, SURVEY.md §5.4): sample in chunks, flushing the
        # accumulated chain + resume state after each chunk
        chunks = []
        lps = []
        state_x = p1
        acc_total = None
        done = 0
        while done < nsteps:
            n = min(checkpoint_every * nthin, nsteps - done)
            key, sub = jax.random.split(key)
            r = _sample_call(state_x, n, sub)
            chunks.append(r.chain)
            lps.append(r.log_prob)
            acc_total = (r.acceptance_fraction * n if acc_total is None
                         else acc_total + r.acceptance_fraction * n)
            state_x = r.final_state[0]
            done += n
            save_chain_hdf5(chain_path, np.concatenate(chunks),
                            np.concatenate(lps),
                            acc_total / done, param_names, nburn, nthin,
                            frame_spacing=_eff_spacing(r))
            if state_path:
                # save an unconsumed key (see the final-state note below)
                key, ksave = jax.random.split(key)
                save_state(state_path, np.asarray(state_x),
                           np.asarray(r.final_state[1]),
                           np.asarray(jax.random.key_data(ksave)),
                           {"param_names": param_names, "nburn": nburn,
                            "nthin": nthin, "seed": seed,
                            "steps_done": done})
        res = EnsembleResult(
            chain=np.concatenate(chunks), log_prob=np.concatenate(lps),
            acceptance_fraction=acc_total / done,
            final_state=(state_x, r.final_state[1], key),
            frame_spacing=r.frame_spacing,
        )
    else:
        res = _sample_call(p1, nsteps, sub)

    # 5b. convergence-driven extension: keep sampling nsteps chunks until
    # the chain passes (20x worst-tau, split-Rhat) or the budget runs out
    steps_sampled = nsteps
    ext_rounds = 0
    extra_burn = 0        # steps promoted from chain head to burn-in by
    #                       the warmup-aware fallback below
    conv_cache = None     # (worst tau in raw steps, split-Rhat) — reused
    #                       by the post-fit warnings below
    diag_s = 0.0          # host time inside tau/split-Rhat passes — the
    #                       stopping-rule diagnostics are host FFT work on
    #                       this 1-core machine, and without attribution
    #                       they read as sampler cost in sample_s
    # stopping-rule diagnostics run on at most this many walker
    # sequences: tau is a property of the MOVE, not of which walkers are
    # watched (the tau benches use 64-walker slices for the same
    # reason, postproc.summary.collect_kernel_subchain), and 256
    # sequences are ample for split-Rhat — while the full production
    # W=1024 chain costs ~4x the host FFT work per round (the 7.7 s of
    # sample_diag_s in the r4 fresh-pin fit, VERDICT weak #4).
    # The subset is STRIDED, not a head slice: on a mesh the walker axis
    # is laid out in per-device blocks (independent per-chip ensembles),
    # and a head slice would watch only device 0 — a stuck ensemble on
    # another chip must still fail split-Rhat
    _DIAG_WALKERS = 256

    def _diag_chain(c):
        w = c.shape[1]
        if w <= _DIAG_WALKERS:
            return c
        return c[:, :: max(1, w // _DIAG_WALKERS)][:, :_DIAG_WALKERS]

    if auto_extend > 0:
        from ..postproc.summary import integrated_autocorr_time, \
            convergence_rhat

        while ext_rounds < auto_extend:
            spacing = _eff_spacing(res)
            chain_steps = res.chain.shape[0] * spacing
            td = time.time()
            if res.chain.shape[0] < 8:
                # too few saved draws for any tau/Rhat estimate — by
                # definition under-converged, keep extending
                tau_w, rh = np.inf, np.inf
            else:
                # ONE sub-chain ACF pass per round (batched host FFTs —
                # still the priciest host work in the loop); Rhat reuses
                # the tau it produced
                dc = _diag_chain(res.chain)
                tau_saved = float(np.max(np.maximum(
                    integrated_autocorr_time(dc), 1.0)))
                tau_w = tau_saved * spacing
                rh = convergence_rhat(dc, tau_saved=tau_saved)
            diag_s += time.time() - td
            conv_cache = (tau_w, rh)
            if chain_steps >= 20 * tau_w and rh <= target_rhat:
                break
            # warmup-aware fallback: an insufficient nburn leaves a
            # relaxation transient at the HEAD of the accumulated chain
            # that holds split-Rhat above the bar no matter how long the
            # run extends (extensions dilute the head but never remove
            # it).  Signature: the length rule passes but Rhat fails,
            # while the trailing half alone certifies on BOTH rules —
            # then the head demonstrably differs from the (stationary)
            # tail, so promote it to burn-in (emcee's discard workflow,
            # automated) instead of extending forever.
            n0 = res.chain.shape[0] // 2
            if (n0 >= 8 and chain_steps >= 20 * tau_w
                    and rh > target_rhat):
                td = time.time()
                tail = _diag_chain(res.chain[n0:])
                tau2 = float(np.max(np.maximum(
                    integrated_autocorr_time(tail), 1.0)))
                rh2 = convergence_rhat(tail, tau_saved=tau2)
                diag_s += time.time() - td
                if ((res.chain.shape[0] - n0) * spacing
                        >= 20 * tau2 * spacing
                        and rh2 <= target_rhat):
                    extra_burn += int(round(n0 * spacing))
                    res = EnsembleResult(
                        chain=res.chain[n0:],
                        log_prob=res.log_prob[n0:],
                        acceptance_fraction=res.acceptance_fraction,
                        final_state=res.final_state,
                        frame_spacing=res.frame_spacing)
                    conv_cache = (tau2 * spacing, rh2)
                    if verbose:
                        print(f"auto-extend: head transient — promoted "
                              f"the first {extra_burn} sampled steps to "
                              f"burn-in; the trailing "
                              f"{res.chain.shape[0] * spacing:.0f} "
                              f"certify "
                              f"(split-Rhat {rh2:.3f} <= {target_rhat})")
                    break
            if verbose:
                if not np.isfinite(tau_w):
                    need = [f"only {res.chain.shape[0]} saved draws — "
                            "too short to estimate tau"]
                else:
                    need = []
                    if steps_sampled < 20 * tau_w:
                        need.append(f"steps {steps_sampled} < 20*tau "
                                    f"{20 * tau_w:.0f}")
                    if rh > target_rhat:
                        need.append(f"split-Rhat {rh:.3f} > {target_rhat}")
                print(f"auto-extend round {ext_rounds + 1}/{auto_extend}: "
                      f"{'; '.join(need)} — sampling {nsteps} more steps")
            key, sub = jax.random.split(key)
            if n_temper_rungs > 1:
                # continue the FULL replica ladder, not just the cold rung
                r2t = _temper_call(jnp.asarray(temper_state), nsteps, sub)
                temper_state = r2t.final_state[0]
                swap_acc_rounds.append(
                    (np.asarray(r2t.swap_acceptance, float), nsteps))
                if verbose:
                    print(f"  swap acceptance per rung boundary: "
                          f"{np.round(r2t.swap_acceptance, 3)}")
                r2 = _adapt_tempered(r2t, sub)
            else:
                r2 = _sample_call(jnp.asarray(res.final_state[0]), nsteps,
                                  sub)
            res = EnsembleResult(
                chain=np.concatenate([res.chain, r2.chain]),
                log_prob=np.concatenate([res.log_prob, r2.log_prob]),
                acceptance_fraction=(
                    res.acceptance_fraction * steps_sampled
                    + r2.acceptance_fraction * nsteps)
                    / (steps_sampled + nsteps),
                final_state=r2.final_state,
                # the sticky routing (KernelSampler.run_sharded) keeps
                # extension chunks on the first chunk's sampling law,
                # so one spacing describes the whole chain
                frame_spacing=r2.frame_spacing,
            )
            steps_sampled += nsteps
            ext_rounds += 1
            conv_cache = None      # the chain just grew — estimate stale
            if chain_path:   # flush progress like the chunked path
                save_chain_hdf5(chain_path, res.chain, res.log_prob,
                                res.acceptance_fraction, param_names,
                                nburn, nthin,
                                frame_spacing=_eff_spacing(res))
        timings["auto_extend_rounds"] = ext_rounds
        if extra_burn:
            timings["extra_burn_steps"] = extra_burn
        timings["sample_diag_s"] = diag_s

    timings["sample_s"] = time.time() - t0
    if swap_acc_rounds:
        # step-weighted mean per rung boundary (like acceptance_fraction)
        total = sum(n for _, n in swap_acc_rounds)
        timings["swap_acceptance"] = (
            sum(a * n for a, n in swap_acc_rounds) / total).tolist()
    sample_mult = max(n_temper_rungs, 1)
    # a resumed run skips burn-in — don't count its phantom evals in the
    # reported throughput
    burn_evals = 0 if resumed is not None else nburn
    n_evals = (rounds * prelim_iterations + burn_evals
               + steps_sampled * sample_mult) * nwalkers
    total_s = (timings["prelim_s"] + timings["burn_s"] + timings["sample_s"])
    timings["likelihood_evals"] = n_evals
    timings["evals_per_s"] = n_evals / total_s if total_s > 0 else np.nan

    if verbose:
        acc = float(np.mean(res.acceptance_fraction))
        print(f"acceptance fraction: {acc:.3f}")
        if acc < 0.05:
            print("WARNING: very low acceptance — the posterior may be "
                  "much narrower than the walker cloud (check initspread) "
                  "or strongly multimodal (try --temper)")
        print(f"throughput: {timings['evals_per_s']:.0f} likelihood "
              f"evals/s over {n_evals} evals")
        if res.chain.shape[0] >= 64:
            from ..postproc.summary import (convergence_rhat,
                                            integrated_autocorr_time)

            if conv_cache is not None and np.isfinite(conv_cache[0]):
                worst, rh = conv_cache    # from the auto-extend stopping
                #                           rule — same chain, same rules
            else:
                dc = _diag_chain(res.chain)
                tau_saved = float(np.max(np.maximum(
                    integrated_autocorr_time(dc), 1.0)))
                worst = tau_saved * _eff_spacing(res)
                rh = convergence_rhat(dc, tau_saved=tau_saved)
            # chain-based length (equals steps_sampled unless the
            # warmup-aware fallback promoted a head segment to burn-in)
            chain_len_steps = res.chain.shape[0] * _eff_spacing(res)
            if chain_len_steps < 20 * worst:
                print(f"WARNING: longest autocorrelation time ~{worst:.0f} "
                      f"steps; chain of {chain_len_steps:.0f} steps may be "
                      "under-converged (consider more steps or more "
                      "walkers)")
            if rh > 1.01:
                # tau-thinned split-Rhat (convergence_rhat): walker
                # sequences within one ensemble interact, so even this
                # is mildly optimistic — exceeding 1.01 anyway is a
                # strong stuck-walker/multimodality signal
                print(f"WARNING: split-Rhat max {rh:.3f} > 1.01 — "
                      "sequences disagree (stuck walkers or unresolved "
                      "multimodality; consider more burn-in or --temper)")

    # 6. checkpoint
    if best_path:
        # reference side-channel: continuously updated best-fit file
        # (fit.dat via AtomicWriteFile, joxsz_funcs.py:540-545); here one
        # atomic write of the overall best sample per run
        flat_lp = res.log_prob.reshape(-1)
        flat_x = res.chain.reshape(-1, res.chain.shape[-1])
        i_best = int(np.argmax(flat_lp))
        best_ll = float(flat_lp[i_best])
        lines = [f"likelihood = {max(best_ll, mle_ll):g}"]
        best_vec = (flat_x[i_best] if best_ll >= mle_ll else mle_theta)
        for nm, v in sorted(zip(param_names, best_vec)):
            lines.append(f"{nm} = {float(v):g}")
        import os
        tmp = best_path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, best_path)

    if chain_path:
        # nburn + extra_burn: steps the warmup-aware auto-extend fallback
        # promoted from the chain head to burn-in are burn-in on disk too
        save_chain_hdf5(chain_path, res.chain, res.log_prob,
                        res.acceptance_fraction, param_names,
                        nburn + extra_burn, nthin,
                        frame_spacing=_eff_spacing(res))
    if state_path:
        x, lp, _ = res.final_state
        # persist an UNCONSUMED key (the final_state key was already used
        # to drive this run's proposals — saving it verbatim would make a
        # resumed run replay the same random stream)
        key, ksave = jax.random.split(key)
        save_state(state_path, np.asarray(x), np.asarray(lp),
                   np.asarray(jax.random.key_data(ksave)),
                   {"param_names": param_names, "nburn": nburn + extra_burn,
                    "nthin": nthin, "seed": seed},
                   temper_state=(np.asarray(temper_state)
                                 if temper_state is not None else None))

    return FitResult(
        chain=res.chain,
        log_prob=res.log_prob,
        acceptance_fraction=res.acceptance_fraction,
        mle_theta=mle_theta,
        mle_loglike=mle_ll,
        param_names=param_names,
        timings=timings,
    )
