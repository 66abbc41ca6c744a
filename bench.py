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
    # measured on v5e (docs/PERFORMANCE.md): after the gather-free table
    # lookup, plain vmap+XLA is the fastest path at the optimal batch
    # (the Pallas SZ core wins only at >=16k walkers)
    log_like_batch = jax.jit(jax.vmap(sess.log_like))

    # large-ensemble throughput: the TPU-native scaling axis is the walker
    # batch (SURVEY.md §2.2); measured optimum on v5e is ~4096 walkers
    # (scripts/tpu_scaling.py)
    W = 4096 if on_tpu else 1024
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(theta0[None] * (
        1 + 0.01 * rng.standard_normal((W, theta0.size))
    ).astype(theta0.dtype))

    # ONE compiled program (the remote-TPU compile path is expensive):
    # warm-up call compiles it, the timed call reuses it verbatim.
    n_steps = 200
    t0 = time.time()
    res = run_ensemble(log_like_batch, p0, n_steps, jax.random.PRNGKey(0),
                       thin=n_steps)
    compile_s = time.time() - t0
    t0 = time.time()
    res = run_ensemble(log_like_batch, res.final_state[0], n_steps,
                       jax.random.PRNGKey(1), thin=n_steps)
    wall = time.time() - t0
    evals = n_steps * W
    evals_per_s = evals / wall

    print(json.dumps({
        "metric": "joint_likelihood_evals_per_sec",
        "value": round(evals_per_s, 1),
        "unit": f"evals/s ({W} walkers, {jax.default_backend()})",
        "vs_baseline": round(evals_per_s / REFERENCE_EVALS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
