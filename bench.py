"""Benchmark: joint-likelihood throughput (evals/sec) on the bundled
CL J1226.9+3332 joint fit — the BASELINE.md headline metric.

Runs the full TPU-resident sampling stack (fused Pallas step kernels) on
the default device and reports likelihood evaluations per second against
the reference's measured ~107/s/core CPU ceiling (BASELINE.md: 9.3 ms per
SZ forward eval, the dominant cost), plus:

* sampling QUALITY (N_eff/s) for BOTH the raw-throughput plain-GW
  configuration (W=4096) AND the recommended converged-production
  sampler (tempered K=4 x W=1024, docs/PERFORMANCE.md), with the
  steps-to-convergence of the production stopping rule;
* a same-claim normalization (`no_ll_us_per_step`) so round-over-round
  deltas can be separated from the documented ~1.8x claim-to-claim
  wall-clock variance (CLAUDE.md) — compare RATIOS to no_ll across
  rounds, not raw walls;
* the ablation-derived cost attribution (X-ray / SZ+prior chunk) and an
  MXU-utilisation estimate at the attribution W (matmul FLOPs per step
  over the v5e bf16-pass peak — the kernel is VPU-transcendental-bound,
  so this is structurally low; docs/PERFORMANCE.md roofline note).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np


REFERENCE_EVALS_PER_S = 1.0 / 9.3e-3   # BASELINE.md: 9.3 ms/eval, 1 core
V5E_BF16_PEAK_FLOPS = 197e12           # per chip; f32 jnp.dot runs one
#                                        bf16 MXU pass (CLAUDE.md)


def _attribution_phase(sess, make_step_kernel, core, theta0, rng, jnp, jax):
    """Same-claim ablation timings at W=4096: us/step for the full step
    and the no_ll / no_xray / no_sz ablations (dependent-chained
    invocations — independent back-to-back calls only measure dispatch
    rate on this remote backend), plus the MXU-utilisation estimate.

    Methodology (hardened after BENCH r3 draft measured a NEGATIVE
    X-ray attribution): 200-step invocations put the ~10 ms remote
    dispatch at ~17 us/step of claim-dependent noise — larger than the
    differences being reported.  Each ablation now runs 1000-step
    invocations (n_inner is a fori_loop trip count, so compile cost is
    unchanged) and reports the MIN of 3 individually-blocked reps
    (~157 ms timed work each at W=4096), putting dispatch at ~1-2%."""
    W_A, N_A = 4096, 1000
    p0 = jnp.asarray(theta0[None] * (
        1 + 0.01 * rng.standard_normal((W_A, theta0.size))
    ).astype(np.float32))
    lp0 = core(p0)
    us = {}
    for ablate in ("", "no_ll", "no_xray", "no_sz"):
        k = make_step_kernel(sess, n_inner=N_A, n_walkers=W_A,
                             ablate=ablate)
        if k is None:
            return None
        x, lp, acc = k(p0, lp0, jnp.zeros(W_A, jnp.float32), 11)  # warm
        jax.block_until_ready(x)
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            x, lp, acc = k(x, lp, acc, 12 + i)
            jax.block_until_ready(x)
            best = min(best, (time.time() - t0) / N_A * 1e6)
        us[ablate or "full"] = best

    # MXU-utilisation estimate: matmul FLOPs actually issued per step
    # (per-walker likelihood matmuls x W + the one-hot partner gather,
    # which partner="auto" still uses at W=4096) over the measured step
    # wall and the single-chip bf16-pass peak.  A LOWER bound on MXU
    # duty and the honest summary of "is this chip well used": the
    # remaining ~85% of the step is VPU transcendental likelihood work.
    from joxsz_tpu.ops.pallas_joint import _build_spec

    spec = _build_spec(sess)
    s = spec["spec"]
    if s.get("xray_fuse") == "packed":
        # one (NSK, 2*NBS) hat matmul + the doubled (2*NBS, NBS)
        # projection (ops/pallas_joint.py XRAY_FUSE)
        xr = s["NSK"] * 2 * s["NBS"] + 2 * s["NBS"] * s["NBS"]
    else:
        xr = 2 * s["NSK"] * s["NBS"] + s["NBS"] * s["NBS"]
    per_walker = 2.0 * (s["NP"] * s["PIX"] + s["PIX"] * s["ND"] + xr)
    H, Dp = W_A // 2, spec["Dp"]
    partner = 2 * (2.0 * H * H * Dp)            # two half-sweeps
    flops_per_step = per_walker * W_A + partner
    mxu_util = flops_per_step / (us["full"] * 1e-6) / V5E_BF16_PEAK_FLOPS
    return {
        "no_ll_us_per_step": round(us["no_ll"], 1),
        "step_us_w4096": round(us["full"], 1),
        "xray_us_per_step": round(us["full"] - us["no_xray"], 1),
        "sz_us_per_step": round(us["full"] - us["no_sz"], 1),
        "mxu_utilization_est": round(mxu_util, 3),
    }


def _tempered_quality_phase(sess, core, theta0, rng, jnp, jax):
    """Production-sampler quality: tempered K=4 x W=1024 from a fresh
    10%-spread cloud (the production init), burn 8000 steps, then
    accumulate the cold chain in 2000-step chunks applying the driver's
    stopping rule (steps >= 20*tau AND tau-thinned split-Rhat <= 1.01,
    sampling/driver.py) after each chunk.  Reports wall N_eff/s of the
    accumulated cold chain and the steps the rule needed.

    Rhat caveat: measured on 64 walker-sequences of ONE interacting
    ensemble (mildly optimistic — postproc.summary.split_rhat docstring);
    same form the production driver uses.

    Init is the PRODUCTION init: MLE warm start (run_fit does the same,
    ~12 s of host-driven L-BFGS) then a 10%-spread cloud.  From a cloud
    around the config defaults instead, the 16k-step budget is spent
    relaxing and the rule never passes (measured: tau 703 vs ~400
    stationary, steps_to_rhat_101 null).

    Gate robustness (r3): the rule is only consulted from the SECOND
    chunk on — an 80-saved-draw first chunk underestimates tau badly
    enough that 20*tau can pass spuriously (measured: steps_to_rhat_101
    = 2000 on one claim, null on the next, same code).  Burn is 8000
    steps (4 chunks, ~2 s) — double the production default — because
    the bench cloud, unlike a resumed production state, starts cold
    every run and any residual relaxation transient in the accumulated
    chain holds split-Rhat above the bar for all 8 chunks.  The final
    (tau, split-Rhat) pair is always reported so a null
    steps_to_rhat_101 is interpretable (borderline vs diverging).
    (The production driver additionally carries a warmup-aware
    trailing-half fallback — run_fit promotes a demonstrably transient
    head to burn-in; not mirrored here, where the doubled burn plays
    that role and the per-chunk stderr trace shows the trajectory.)"""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel
    from joxsz_tpu.sampling.tempered import default_betas
    from joxsz_tpu.sampling.mle import find_mle
    from joxsz_tpu.postproc.summary import chain_tau_steps, convergence_rhat

    W_T, K, THIN, N_C = 1024, 4, 25, 2000
    MAX_CHUNKS = 8                              # cap: 16000 steps
    D = theta0.size
    betas = default_betas(K)
    step_t = make_tempered_step_kernel(sess, betas, n_inner=N_C,
                                       n_walkers=W_T, thin=THIN)
    if step_t is None:
        return None
    p = sess.params
    theta_mle, _ = find_mle(sess.log_like, theta0.astype(np.float64),
                            p.lo, p.hi)
    theta_mle = np.asarray(theta_mle, dtype=np.float32)
    # production init machinery (additive floor keeps zero-valued
    # coordinates non-degenerate; finite-lp rejection resampling)
    from joxsz_tpu.sampling.stretch import generate_init_positions

    x0 = jnp.asarray(generate_init_positions(
        core, theta_mle, W_T, jax.random.PRNGKey(17), spread=0.1),
        jnp.float32)
    xk = jnp.broadcast_to(x0[None], (K, W_T, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W_T), jnp.float32)
    # burn (2x the production default: the bench cloud starts cold
    # every run — see docstring; chain discarded)
    for i in range(4):
        xk, lpk, acck = step_t(xk, lpk, acck, 51 + i)[:3]
    jax.block_until_ready(xk)

    # per-chunk slice kept local (not collect_kernel_subchain): the
    # stopping rule must be consulted on the ACCUMULATED chain after
    # every chunk, and the swap counter rides the same invocation — the
    # helper collects all chunks before returning.  tau rules go
    # through chain_tau_steps (the one shared encoding).
    sl = jax.jit(lambda c: c[:, :64, :D])
    subs, swap_acc = [], []
    steps_to_conv = None
    rhat_at_gate = None
    tau_at_gate = None
    rhat = float(np.inf)
    t0 = time.time()
    for i in range(MAX_CHUNKS):
        xk, lpk, acck, sacc, ch, _ = step_t(xk, lpk, acck, 60 + i)
        subs.append(sl(ch))
        swap_acc.append(sacc)
        if i >= 1:          # chunk 1's 80 draws underestimate tau
            sub = np.concatenate([np.asarray(c) for c in subs])
            tau_steps_i = float(chain_tau_steps(sub, THIN).max())
            rhat = float(convergence_rhat(
                sub, tau_saved=tau_steps_i / THIN))
            steps = (i + 1) * N_C
            print(f"  tempered chunk {i + 1}/{MAX_CHUNKS}: steps {steps} "
                  f"tau {tau_steps_i:.0f} rhat {rhat:.4f}",
                  file=sys.stderr)
            if (steps_to_conv is None
                    and steps >= 20.0 * tau_steps_i
                    and rhat <= 1.01):
                steps_to_conv = steps
                rhat_at_gate = rhat
                tau_at_gate = tau_steps_i
    jax.block_until_ready(xk)
    wall = time.time() - t0
    sub = np.concatenate([np.asarray(c) for c in subs])
    tau_steps = float(chain_tau_steps(sub, THIN).max())
    neff = MAX_CHUNKS * N_C * W_T / tau_steps
    srate = float(np.mean([np.asarray(s) for s in swap_acc])) / (N_C * W_T)
    return {
        "neff_per_sec_tempered": round(neff / wall, 1),
        "tau_steps_tempered": round(tau_steps, 1),
        "steps_to_rhat_101": steps_to_conv,
        # the values that PASSED the rule at the gate step.  They differ
        # from the *_final fields by construction: accumulated-window tau
        # and split-Rhat climb with window length (measured 26->54 tau,
        # 1.003->1.016 Rhat over 4k->16k steps), so "gate passed at 4000"
        # next to "final Rhat 1.017" is expected, not a contradiction.
        "rhat_at_gate": None if rhat_at_gate is None
        else round(rhat_at_gate, 4),
        "tau_at_gate": None if tau_at_gate is None
        else round(tau_at_gate, 1),
        "gate_rule": "accumulated steps >= 20*tau(accumulated) and "
                     "tau-thinned split-Rhat(accumulated) <= 1.01, "
                     "consulted from chunk 2 (sampling/driver.py rule)",
        "rhat_tempered_final": round(rhat, 4),
        "swap_acceptance": round(srate, 3),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.sampling.stretch import run_ensemble

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = JoXSZConfig.cl1226()
    cfg.dtype = "float32" if on_tpu else "float64"
    sess = build_session(cfg)

    theta0 = np.asarray(sess.params.thawed_values(),
                        dtype=np.float32 if on_tpu else np.float64)

    # fastest measured production sampler (docs/PERFORMANCE.md): the fused
    # Pallas step-loop kernel — whole MCMC steps (proposal + joint
    # likelihood + accept, hardware PRNG) VMEM-resident, 500 steps per
    # invocation.  XLA scan sampler as the fallback / CPU path.
    step = None
    # W=65536 is the measured throughput peak (docs/PERFORMANCE.md A.10):
    # partner="auto" swaps the quadratic one-hot gather for the O(W)
    # rotation above 4096 walkers, packed-state lifted the old W>=32768
    # VMEM failure, and half_tile (auto-on above 32768) tiles the
    # half-substep to bound proposal intermediates — same-claim +2.1%
    # over untiled W=32768.  The remaining wall is W=131072.
    W = 65536 if on_tpu else 1024
    n_steps = 2000 if on_tpu else 200
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(theta0[None] * (
        1 + 0.01 * rng.standard_normal((W, theta0.size))
    ).astype(theta0.dtype))
    extra = {}
    if on_tpu:
        try:
            from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                                    make_step_kernel)

            core = make_joint_core(sess, block_b=256)
            step = make_step_kernel(sess, n_inner=500, n_walkers=W)
        except Exception as e:
            # never silently downgrade the headline to the XLA fallback:
            # a kernel-path regression would otherwise read as claim
            # variance (r4 review)
            import traceback
            print(f"WARNING: fused step kernel unavailable, falling "
                  f"back to the XLA sampler: {e!r}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            step = None

    neff_metrics = None
    if step is not None:
        lp0 = core(p0)
        x, lp, acc = step(p0, lp0, jnp.zeros(W), 1)   # compile + warm
        jax.block_until_ready(x)
        t0 = time.time()
        for i in range(n_steps // 500):
            x, lp, acc = step(x, lp, acc, 2 + i)
        jax.block_until_ready(x)
        wall = time.time() - t0

        # ---- same-claim normalization + cost attribution (VERDICT r2
        # #4a/#7): no_ll is the proposal/accept floor; ratios to it are
        # comparable across claims where raw walls are not -------------
        attr = _attribution_phase(sess, make_step_kernel, core, theta0,
                                  rng, jnp, jax)
        if attr:
            extra.update(attr)

        # ---- sampling QUALITY: N_eff/s (VERDICT r1 weak #5) -------------
        # Record a thinned chain fully on-device and fetch only a
        # 64-walker slice (a full chain is GBs; the tunnel moves
        # ~20 MB/s).  tau is a property of the move, not of which
        # walkers we look at, so 64 walkers estimate it fine.  Run the
        # quality phase at W=4096 (chain-buffer sizes proven there; tau
        # doesn't depend on W — measured, docs/PERFORMANCE.md).
        from joxsz_tpu.postproc.summary import chain_tau_steps

        W_Q = 4096
        # tau on this posterior is ~850 steps (scripts/
        # tpu_ensemble_equiv_bench.py), so the window needs >> 5 tau of
        # chain: 20k steps, saved every 25 (tau_saved ~ 34, n/tau ~ 23)
        THIN, N_Q, N_CHUNKS = 25, 2000, 10
        step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W_Q,
                                  thin=THIN)
        sl = jax.jit(lambda c: c[:, :64, :theta0.size])
        xq = jnp.asarray(theta0[None] * (
            1 + 0.01 * rng.standard_normal((W_Q, theta0.size))
        ).astype(np.float32))
        x2, lp2, acc2 = xq, core(xq), jnp.zeros(W_Q, jnp.float32)
        # compile + equilibrate: two invocations = 4000 steps (~4-5 tau),
        # matching the standalone tau benches — a single 2000-step chunk
        # leaves a relaxation transient from the tight init cloud that
        # inflates the measured tau
        x2, lp2, acc2, ch, chlp = step_c(x2, lp2, acc2, 96)
        x2, lp2, acc2, ch, chlp = step_c(x2, lp2, acc2, 97)
        jax.block_until_ready(x2)
        t0 = time.time()
        subs = []
        for i in range(N_CHUNKS):
            x2, lp2, acc2, ch, chlp = step_c(x2, lp2, acc2, 98 + i)
            subs.append(sl(ch))
        jax.block_until_ready(x2)
        wall_q = time.time() - t0
        # one continuous chain across chunks (each starts from the last
        # state of the previous); tau rules (negative-ACF clamp, max()
        # reduction) live in postproc.summary.chain_tau_steps
        sub = np.concatenate([np.asarray(s) for s in subs])
        tau_steps_all = chain_tau_steps(sub, THIN)
        tau_steps = float(tau_steps_all.max())        # worst parameter
        neff = sub.shape[0] * W_Q * THIN / tau_steps
        neff_per_s = neff / wall_q
        # reference quality throughput: same Goodman-Weare move => same
        # tau in steps; emcee at ~107 evals/s gives 107/tau N_eff/s
        neff_metrics = {
            "neff_per_sec": round(neff_per_s, 1),
            "tau_steps_worst": round(tau_steps, 1),
            "neff_vs_baseline": round(
                neff_per_s / (REFERENCE_EVALS_PER_S / tau_steps), 1),
        }

        # ---- recommended production sampler (VERDICT r2 #4b): tempered
        # K=4 x W=1024 — the configuration that actually certifies
        # convergence on this posterior (results/tpu_conv/) ------------
        tq = _tempered_quality_phase(sess, core, theta0, rng, jnp, jax)
        if tq:
            extra.update(tq)
    else:
        log_like_batch = jax.jit(jax.vmap(sess.log_like))
        # ONE compiled program (the remote-TPU compile path is expensive):
        # warm-up call compiles it, the timed call reuses it verbatim.
        res = run_ensemble(log_like_batch, p0, n_steps,
                           jax.random.PRNGKey(0), thin=n_steps)
        t0 = time.time()
        res = run_ensemble(log_like_batch, res.final_state[0], n_steps,
                           jax.random.PRNGKey(1), thin=n_steps)
        wall = time.time() - t0
    evals = n_steps * W
    evals_per_s = evals / wall

    primary = {
        "metric": "joint_likelihood_evals_per_sec",
        "value": round(evals_per_s, 1),
        "unit": f"evals/s ({W} walkers, {jax.default_backend()})",
        "vs_baseline": round(evals_per_s / REFERENCE_EVALS_PER_S, 1),
    }
    if neff_metrics is not None:
        # sampling QUALITY alongside raw throughput: effective samples
        # per second (worst-mixing parameter) and the autocorrelation
        # time it derives from; baseline = reference emcee at the same
        # tau (same Goodman-Weare move)
        primary.update(neff_metrics)
    primary.update(extra)
    print(json.dumps(primary))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover
        # a TPU claim released moments earlier can leave a stale grant
        # that fails the first device op (FailedPrecondition); one retry
        # after a grace period clears it.  Deterministic failures fail
        # fast instead.
        import sys
        import time as _time

        msg = f"{type(e).__name__}: {e}"
        transient = ("FAILED_PRECONDITION" in msg
                     or "FailedPrecondition" in msg
                     or "DEADLINE_EXCEEDED" in msg
                     or "UNAVAILABLE" in msg)
        if not transient:
            raise
        print(f"bench attempt 1 failed ({type(e).__name__}); "
              "retrying in 60s", file=sys.stderr)
        _time.sleep(60)
        main()
