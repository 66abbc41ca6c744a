"""Benchmark: joint-likelihood throughput (evals/sec) on the bundled
CL J1226.9+3332 joint fit — the BASELINE.md headline metric.

Runs the full TPU-resident sampling stack (vmapped walker batches inside a
lax.scan) on the default device and reports likelihood evaluations per
second, compared against the reference's measured ~107/s/core CPU ceiling
(BASELINE.md: 9.3 ms per SZ forward eval, the dominant cost).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


REFERENCE_EVALS_PER_S = 1.0 / 9.3e-3   # BASELINE.md: 9.3 ms/eval, 1 core


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
    # W=32768 is the measured throughput peak (docs/PERFORMANCE.md):
    # partner="auto" swaps the quadratic one-hot gather for the O(W)
    # rotation above 4096 walkers, and the packed-state kernel layout
    # (lp/acc in padding lanes, input_output-aliased state) lifted the
    # old W>=32768 VMEM compile failure — the wall is now W=65536
    W = 32768 if on_tpu else 1024
    n_steps = 2000 if on_tpu else 200
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(theta0[None] * (
        1 + 0.01 * rng.standard_normal((W, theta0.size))
    ).astype(theta0.dtype))
    if on_tpu:
        try:
            from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                                    make_step_kernel)

            core = make_joint_core(sess, block_b=256)
            step = make_step_kernel(sess, n_inner=500, n_walkers=W)
        except Exception:
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
