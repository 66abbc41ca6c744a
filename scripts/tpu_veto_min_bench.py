"""Same-claim A/B of the VETO_MIN knob at the W=32768 throughput peak.

The shared-chunk micro-attribution (results/tpu_prof_micro.json) put the
HSE mass veto at ~103 us/step.  VETO_MIN replaces the gNFW veto's
boolean compare + or + all-reduce chain with ONE masked min-reduce over
the central differences (see ops/pallas_joint.py knob comment) — same
strict-inequality semantics for normal f32 diffs.

Gates (CLAUDE.md r3 rules): same-claim us/step A/B, plus the 2x-band
accuracy rule on 2048 posterior rows with a zero-extra-veto-flip
requirement (the veto IS the thing being rewritten, so flips are the
primary gate here, not the dll band).

Run:  setsid nohup python -u scripts/tpu_veto_min_bench.py > /tmp/vetomin.log 2>&1 &
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

VETO_DEFAULT = pj.VETO_MIN

W, N_IN, REPS = 32768, 1000, 2
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), np.float32)
rng = np.random.default_rng(0)
p0 = jnp.asarray(theta0[None] * (
    1 + 0.01 * rng.standard_normal((W, theta0.size))).astype(np.float32))
core = pj.make_joint_core(sess, block_b=256)
lp0 = core(p0)
jax.block_until_ready(lp0)
log("session + core ready")

out = {"W": W, "n_steps": REPS * N_IN}
for name, knob in [("base", False), ("veto_min", True)]:
    pj.VETO_MIN = knob
    try:
        k_ = pj.make_step_kernel(sess, n_inner=N_IN, n_walkers=W)
        if k_ is None:
            log(f"{name}: kernel builder returned None — skipped")
            continue
        x, lp, acc = k_(p0, lp0, jnp.zeros(W, jnp.float32), 21)
        jax.block_until_ready(x)
        t1 = time.time()
        for i in range(REPS):
            x, lp, acc = k_(x, lp, acc, 22 + i)
        jax.block_until_ready(x)
        us = (time.time() - t1) / (REPS * N_IN) * 1e6
        out[name] = round(us, 2)
        log(f"{name:>9}: {us:8.2f} us/step ({W / us:.2f}M evals/s)")
    except Exception as e:
        log(f"{name}: FAILED — {type(e).__name__}: {e}")
        out[name] = None
    finally:
        pj.VETO_MIN = VETO_DEFAULT

# ---- accuracy gate on posterior rows -------------------------------------
with h5py.File(REPO / "results" / "tpu_r3" / "joxsz_chain.hdf5", "r") as f:
    ch = np.asarray(f["mcmc/chain"])          # (n_saved, W, D)
rng = np.random.default_rng(7)
ns, Wc, D = ch.shape
rows = ch[rng.integers(ns // 2, ns, 2048),
          rng.integers(0, Wc, 2048)].astype(np.float32)
p = jnp.asarray(rows)
ll_xla = jax.jit(jax.vmap(sess.log_like))
lp_x = np.asarray(ll_xla(p))
log(f"2048 posterior rows from {ch.shape}")

report = {}
for name, knob in [("base", False), ("veto_min", True)]:
    pj.VETO_MIN = knob
    core_k = pj.make_joint_core(sess, block_b=256)
    lp_k = np.asarray(core_k(p))
    pj.VETO_MIN = VETO_DEFAULT
    d = np.abs(lp_k - lp_x)
    fin = np.isfinite(lp_x) & np.isfinite(lp_k)
    peak = lp_x[fin].max()
    m = fin & (lp_x >= peak - 100.0)
    r = {
        "max_dll_within_100": float(d[m].max()),
        "rows_within_100": int(m.sum()),
        "max_dll_all_finite": float(d[fin].max()),
        "veto_flips": int(np.sum(np.isfinite(lp_x) != np.isfinite(lp_k))),
    }
    report[name] = r
    log(f"accuracy {name}: {r}")

ok = (report["veto_min"]["veto_flips"] == report["base"]["veto_flips"]
      and report["veto_min"]["max_dll_within_100"]
      <= max(2.0 * report["base"]["max_dll_within_100"], 0.1))
out["accuracy"] = report
out["accuracy_pass"] = bool(ok)
if out.get("base") and out.get("veto_min"):
    out["veto_min_gain_us"] = round(out["base"] - out["veto_min"], 2)
print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_veto_min.json").write_text(
    json.dumps(out, indent=2))
log(f"accuracy gate: {'PASS' if ok else 'FAIL'}")
log("DONE")
