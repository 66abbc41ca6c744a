"""Hardware validation of the stable-softplus gNFW kernel forms
(review fix: ln(1+x^a) as max(z,0)+log1p(e^-|z|), sfrac as
-expm1(-ln1xa)) — a ULP-class bit change to the default kernel path, so
it gets the standard gates (CLAUDE.md r3):

* kernel-vs-XLA band on 2048 posterior rows within the documented
  ~0.4-0.5 envelope (2x rule vs the recorded 0.50), zero veto flips;
* W=32768 step cost sane via the same-claim full/no_ll RATIO (documented
  ~7.2 at the RECIP_MUL adoption: 843.2/117.7 — raw walls are not
  claim-comparable, ratios are).

Run:  setsid nohup python -u scripts/tpu_softplus_validate.py > /tmp/spval.log 2>&1 &
"""

import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import h5py  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp  # noqa: E402

from joxsz_tpu.build import build_session  # noqa: E402
from joxsz_tpu.config import JoXSZConfig  # noqa: E402
import joxsz_tpu.ops.pallas_joint as pj  # noqa: E402

log(f"backend {jax.default_backend()}")
if jax.default_backend() == "cpu":
    log("FATAL: needs the TPU backend")
    sys.exit(1)

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), np.float32)

# ---- accuracy on posterior rows ------------------------------------------
with h5py.File(REPO / "results" / "tpu_r3" / "joxsz_chain.hdf5", "r") as f:
    ch = np.asarray(f["mcmc/chain"])
rng = np.random.default_rng(7)
ns, Wc, D = ch.shape
rows = ch[rng.integers(ns // 2, ns, 2048),
          rng.integers(0, Wc, 2048)].astype(np.float32)
p = jnp.asarray(rows)
lp_x = np.asarray(jax.jit(jax.vmap(sess.log_like))(p))
core = pj.make_joint_core(sess, block_b=256)
lp_k = np.asarray(core(p))
d = np.abs(lp_k - lp_x)
fin = np.isfinite(lp_x) & np.isfinite(lp_k)
peak = lp_x[fin].max()
m100 = fin & (lp_x >= peak - 100.0)
acc = {
    "max_dll_within_100": float(d[m100].max()),
    "rows_within_100": int(m100.sum()),
    "max_dll_all_finite": float(d[fin].max()),
    "veto_flips": int(np.sum(np.isfinite(lp_x) != np.isfinite(lp_k))),
}
log(f"accuracy: {acc}")

# ---- same-claim step cost, normalized by no_ll ---------------------------
W, N_IN, REPS = 32768, 1000, 2
rng = np.random.default_rng(0)
p0 = jnp.asarray(theta0[None] * (
    1 + 0.01 * rng.standard_normal((W, theta0.size))).astype(np.float32))
lp0 = core(p0)
jax.block_until_ready(lp0)
us = {}
for name, ablate in [("full", ""), ("no_ll", "no_ll")]:
    k_ = pj.make_step_kernel(sess, n_inner=N_IN, n_walkers=W,
                             ablate=ablate)
    x, lp, a_ = k_(p0, lp0, jnp.zeros(W, jnp.float32), 21)
    jax.block_until_ready(x)
    t1 = time.time()
    for i in range(REPS):
        x, lp, a_ = k_(x, lp, a_, 22 + i)
    jax.block_until_ready(x)
    us[name] = (time.time() - t1) / (REPS * N_IN) * 1e6
    log(f"{name:>6}: {us[name]:8.2f} us/step ({W / us[name]:.2f}M evals/s)")

ratio = us["full"] / us["no_ll"]
# documented RECIP_MUL-adoption ratio 843.2/117.7 = 7.16; allow 10%
ok = (acc["veto_flips"] == 0
      and acc["max_dll_within_100"] <= 1.0     # 2x the recorded 0.50
      and ratio <= 7.16 * 1.10)
out = {"W": W, "accuracy": acc,
       "full_us": round(us["full"], 2), "no_ll_us": round(us["no_ll"], 2),
       "full_over_no_ll": round(ratio, 3), "pass": bool(ok)}
print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_softplus_validate.json").write_text(
    json.dumps(out, indent=2))
log(f"gate: {'PASS' if ok else 'FAIL'}")
log("DONE")
