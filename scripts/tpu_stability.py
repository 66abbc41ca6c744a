"""TPU batch: post-optimisation step timings + multi-seed posterior
stability with walker-rich ensembles.

Run: setsid nohup python scripts/tpu_stability.py > /tmp/tpu_stability.log 2>&1 &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.stretch import run_ensemble, generate_init_positions
from joxsz_tpu.sampling.mle import find_mle
from joxsz_tpu.io.readers import read_conversion_table, read_xy
from joxsz_tpu.postproc.summary import summary_dict

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
conv = read_conversion_table(cfg.sz.conversion_file)
flux = read_xy(cfg.sz.flux_file, 3)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)

# --- step timings after the matmul-lerp change --------------------------
for tag, ll in (
    ("vmap", jax.jit(jax.vmap(sess.log_like))),
    ("pallas", jax.jit(sess.model.log_like_batch_fused(
        conv, flux, sess.sz_operator, use_pallas=True))),
):
    for W in (4096, 16384):
        p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
            (W, theta0.size)))).astype(np.float32))
        n_steps = max(50, (1 << 20) // W)
        res = run_ensemble(ll, p0, n_steps, jax.random.PRNGKey(0),
                           thin=n_steps)
        t = time.time()
        res = run_ensemble(ll, res.final_state[0], n_steps,
                           jax.random.PRNGKey(1), thin=n_steps)
        dt = time.time() - t
        log(f"{tag:7s} W={W:6d}: {dt/n_steps*1e3:7.3f} ms/step "
            f"-> {W*n_steps/dt:12,.0f} evals/s")

# --- multi-seed posterior stability, walker-rich ------------------------
W = 1024
ll_b = jax.jit(sess.model.log_like_batch_fused(
    conv, flux, sess.sz_operator, use_pallas=True))
mle_theta, mle_ll = find_mle(sess.log_like, theta0,
                             sess.params.lo, sess.params.hi)
mle_theta = mle_theta.astype(np.float32)
log(f"MLE ll {mle_ll:.1f}")

results = {}
for seed in (1, 2, 3, 4):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = generate_init_positions(ll_b, mle_theta, W, k1, spread=0.1)
    t = time.time()
    res = run_ensemble(ll_b, p0, 2000, k2, thin=2000)        # burn
    res = run_ensemble(ll_b, res.final_state[0], 5000, k3, thin=5)
    dt = time.time() - t
    flat = res.chain.reshape(-1, theta0.size)
    s = summary_dict(flat, sess.params.thawed, chain_3d=res.chain)
    results[f"seed{seed}"] = s
    med = {n: round(v["median"], 3) for n, v in s["parameters"].items()}
    log(f"seed {seed}: {7000*W/dt:,.0f} evals/s; acc "
        f"{res.acceptance_fraction.mean():.3f}; medians {med}")

out = pathlib.Path("/root/repo/results/posterior_stability.json")
out.write_text(json.dumps(results, indent=2))
log(f"wrote {out}")
log("DONE")
