"""Multi-cluster survey demo on TPU: 16 mock clusters fit simultaneously.

Each cluster is the bundled CL J1226 dataset with its SZ flux rescaled by
a known factor f_c (plus fresh Gaussian noise); the fitted per-cluster
`calibration` posterior must track f_c.  All 16 ensembles advance in one
device program over a ('cluster','walker') layout.

Run: setsid nohup python scripts/tpu_multicluster_demo.py > /tmp/mc_demo.log 2>&1 &
"""

import dataclasses
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
from joxsz_tpu.models.multicluster import (
    stack_sz_data, stack_xray_data, make_multicluster_log_like,
)
from joxsz_tpu.parallel import make_mesh, run_multi_cluster
from joxsz_tpu.sampling.mle import find_mle

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
rng = np.random.default_rng(0)

C, W = 16, 128
factors = np.round(0.85 + 0.3 * rng.random(C), 3)     # truth calibrations
err = np.asarray(sess.model.sz_data.flux_err)
base_flux = np.asarray(sess.model.sz_data.flux)
sz_list = []
for c in range(C):
    noisy = base_flux * factors[c] + rng.normal(0, err)
    sz_list.append(dataclasses.replace(
        sess.model.sz_data, flux=jnp.asarray(noisy, dtype=jnp.float32)))
xr_list = [sess.model.xray_data] * C

sz_stack, xr_stack = stack_sz_data(sz_list), stack_xray_data(xr_list)
batched = jax.jit(make_multicluster_log_like(sess.model, sz_stack, xr_stack))

# init all ensembles around the single-cluster MLE
theta0, _ = find_mle(sess.log_like, sess.params.thawed_values(),
                     sess.params.lo, sess.params.hi)
theta0 = theta0.astype(np.float32)
p0 = theta0[None, None] * (1 + 0.02 * rng.standard_normal(
    (C, W, theta0.size))).astype(np.float32)

# cluster-grid step kernel (the fast path on hardware; --xla for the
# flat widened-GEMM scan sampler)
step = None
if "--xla" not in sys.argv and jax.default_backend() != "cpu":
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    step = make_multicluster_step_kernel(sess, sz_stack, xr_stack,
                                         n_inner=400, n_walkers=W)

log(f"fitting {C} clusters x {W} walkers = {C*W} chains "
    f"({'cluster-grid kernel' if step is not None else 'flat XLA'})")
if step is not None:
    x = jnp.asarray(p0)
    lp = batched(x)
    acc = jnp.zeros((C, W))
    t = time.time()
    for i in range(2):                       # 800-step burn
        x, lp, acc = step(x, lp, acc, 1 + i)
    jax.block_until_ready(x)
    burn_t = time.time() - t
    log(f"burn: {burn_t:.1f}s ({800*C*W/burn_t:,.0f} evals/s)")
    t = time.time()
    for i in range(3):                       # 1200-step sample
        x, lp, acc = step(x, lp, acc, 10 + i)
    jax.block_until_ready(x)
    samp_t = time.time() - t
    log(f"sample: {samp_t:.1f}s ({1200*C*W/samp_t:,.0f} evals/s)")
    positions = np.asarray(x)
else:
    mesh = make_mesh(1, axis_names=("cluster", "walker"), shape=(1, 1))
    t = time.time()
    out = run_multi_cluster(batched, p0, n_steps=800,
                            key=jax.random.PRNGKey(1), mesh=mesh)
    burn_t = time.time() - t
    log(f"burn: {burn_t:.1f}s ({800*C*W/burn_t:,.0f} evals/s)")

    t = time.time()
    out = run_multi_cluster(batched, out["positions"], n_steps=1200,
                            key=jax.random.PRNGKey(2), mesh=mesh)
    samp_t = time.time() - t
    log(f"sample: {samp_t:.1f}s ({1200*C*W/samp_t:,.0f} evals/s)")
    positions = np.asarray(out["positions"])

# final positions as a crude posterior snapshot per cluster
cal_idx = sess.params.thawed.index("calibration")
fitted = positions[:, :, cal_idx]
med = np.median(fitted, axis=1)
std = np.std(fitted, axis=1)
pulls = (med - factors) / np.maximum(std, 1e-9)
for c in range(C):
    log(f"cluster {c:2d}: truth {factors[c]:.3f}  fitted "
        f"{med[c]:.3f} +- {std[c]:.3f}  pull {pulls[c]:+.2f}")
ok = np.abs(pulls) < 4
log(f"recovered {ok.sum()}/{C} within 4 sigma")

out_path = pathlib.Path("/root/repo/results/multicluster_demo.json")
out_path.write_text(json.dumps({
    "n_clusters": C, "n_walkers": W,
    "truth_calibration": factors.tolist(),
    "fitted_median": med.tolist(), "fitted_std": std.tolist(),
    "pulls": pulls.tolist(),
    "burn_evals_per_s": 800 * C * W / burn_t,
    "sample_evals_per_s": 1200 * C * W / samp_t,
}, indent=2))
log(f"wrote {out_path}")
log("DONE")
