"""Diagnose the xfuse PHASE1 value gap: WHERE do kernel/XLA log-like
diffs live relative to posterior weight?

The xfuse bench (results in /tmp/xfuse.log, 2026-08-19) measured
max|kernel - xla| ~ 19.6 over a 3%-spread cloud for BOTH hat layouts
(packed and legacy), so it is not a packed regression — the question is
whether the MXU bf16-pass error on the table/SZ matmuls is amplified
only at posterior-irrelevant extreme parameters (where log-like is
thousands below the peak and the Cash counts blow up) or also inside
the posterior bulk where the sampler actually lives.

Batches probed (1024 rows each, same claim):
  posterior  rows drawn from the converged tempered chain
             (results/tpu_conv/joxsz_chain.hdf5, split-Rhat<=1.006);
  spread1    theta0 * (1 + 1% N(0,1));
  spread3    theta0 * (1 + 3% N(0,1)) — the failing xfuse phase-1 cloud.

For each batch x layout we report the max diff overall AND restricted
to rows within {30, 100} log-like of the batch max (the sampler only
resolves differences of order unity near the bulk; a row 1000 below
the peak has zero posterior weight).

Run: setsid nohup python -u scripts/tpu_precision_probe.py \
       > /tmp/precprobe.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import h5py
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
import joxsz_tpu.ops.pallas_joint as pj

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
log(f"backend {jax.default_backend()}; session ready")

rng = np.random.default_rng(0)
batches = {}

with h5py.File("results/tpu_conv/joxsz_chain.hdf5", "r") as f:
    ch = f["mcmc/chain"][-2:]  # (2, 1024, 13)
flat = ch.reshape(-1, ch.shape[-1]).astype(np.float32)
idx = rng.choice(flat.shape[0], size=1024, replace=False)
batches["posterior"] = flat[idx]

# Match the xfuse phase-1 draw order: a fresh seed-0 stream's first
# normal block is the 3% cloud there; here we draw 1% first, then 3%,
# which probes the same distribution (exact rows need not match).
batches["spread1"] = (theta0[None] * (1 + 0.01 * rng.standard_normal(
    (1024, theta0.size)))).astype(np.float32)
batches["spread3"] = (theta0[None] * (1 + 0.03 * rng.standard_normal(
    (1024, theta0.size)))).astype(np.float32)

cores = {}
for fuse in ("packed", "legacy"):
    pj.XRAY_FUSE = fuse
    cores[fuse] = pj.make_joint_core(sess, block_b=256)
pj.XRAY_FUSE = "packed"
xla_ll = jax.jit(jax.vmap(sess.log_like))

for name, b in batches.items():
    bj = jnp.asarray(b)
    ref = np.asarray(xla_ll(bj))
    fin = np.isfinite(ref)
    rmax = ref[fin].max()
    log(f"--- batch {name}: {fin.sum()}/1024 finite, "
        f"ll range [{ref[fin].min():.1f}, {rmax:.1f}]")
    for fuse in ("packed", "legacy"):
        v = np.asarray(cores[fuse](bj))
        if not np.array_equal(np.isfinite(v), fin):
            log(f"  {fuse}: FINITE-MASK MISMATCH")
            continue
        d = np.abs(v[fin] - ref[fin])
        rel = rmax - ref[fin]  # distance below the batch peak
        line = f"  {fuse}: max|d|={d.max():.4f}"
        for win in (30.0, 100.0):
            m = rel <= win
            line += (f"  within{int(win)}:"
                     f" n={m.sum()} max={d[m].max():.4f}" if m.any()
                     else f"  within{int(win)}: n=0")
        log(line)
        top = np.argsort(d)[::-1][:5]
        pairs = ", ".join(f"(d={d[i]:.2f}, below_peak={rel[i]:.0f})"
                          for i in top)
        log(f"    top5: {pairs}")

print("DONE", flush=True)
