"""Accuracy gate for the LNX_CONST knob on POSTERIOR rows (the MLE-cloud
window in tpu_xray_micro_bench.py had 1 usable row — not evidence).

Draws 2048 rows from the pinned converged chain (results/tpu_r3/),
evaluates three likelihoods on the same claim — XLA f32 (reference),
base kernel, LNX_CONST kernel — and reports near-peak (within 30/100 of
the batch max) max |diff| for kernel-vs-XLA under both knob settings.
PASS rule: the LNX_CONST kernel's near-peak band must not exceed the
base kernel's by more than 2x (i.e. the knob adds no systematic error
beyond the already-accepted bf16-pass/ULP-amplification noise).

Run:  setsid nohup python -u scripts/tpu_lnx_validate.py > /tmp/lnxval.log 2>&1 &
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

with h5py.File(REPO / "results" / "tpu_r3" / "joxsz_chain.hdf5", "r") as f:
    ch = np.asarray(f["mcmc/chain"])          # (n_saved, W, D)
rng = np.random.default_rng(7)
ns, W, D = ch.shape
rows = ch[rng.integers(ns // 2, ns, 2048),
          rng.integers(0, W, 2048)].astype(np.float32)
p = jnp.asarray(rows)
log(f"2048 posterior rows from {ch.shape}")

ll_xla = jax.jit(jax.vmap(sess.log_like))
lp_x = np.asarray(ll_xla(p))

report = {}
for name, knob in [("base", False), ("lnx_const", True)]:
    pj.LNX_CONST = knob
    core = pj.make_joint_core(sess, block_b=256)
    lp_k = np.asarray(core(p))
    pj.LNX_CONST = False
    d = np.abs(lp_k - lp_x)
    fin = np.isfinite(lp_x) & np.isfinite(lp_k)
    peak = lp_x[fin].max()
    r = {}
    for win in (30.0, 100.0):
        m = fin & (lp_x >= peak - win)
        r[f"max_dll_within_{int(win)}"] = float(d[m].max())
        r[f"rows_within_{int(win)}"] = int(m.sum())
    r["max_dll_all_finite"] = float(d[fin].max())
    r["veto_flips"] = int(np.sum(np.isfinite(lp_x) != np.isfinite(lp_k)))
    report[name] = r
    log(f"{name}: {r}")

ok = (report["lnx_const"]["max_dll_within_100"]
      <= max(2.0 * report["base"]["max_dll_within_100"], 0.1)
      and report["lnx_const"]["veto_flips"]
      <= report["base"]["veto_flips"] + 2)
report["pass"] = bool(ok)
print(json.dumps(report), flush=True)
(REPO / "results" / "tpu_lnx_validate.json").write_text(
    json.dumps(report, indent=2))
log(f"{'PASS' if ok else 'FAIL'}")
log("DONE")
