"""Same-claim micro-attribution INSIDE the X-ray section at the W=32768
throughput peak, plus A/Bs of the two experimental knobs
(ops.pallas_joint HAT_BF16 / LNX_CONST).

Peak attribution (scripts/tpu_peak_ablate.py) put the X-ray section at
356.6 us/step (38%) with a ~102 us roofline-bound hat matmul inside it;
this script splits the remaining ~250 us of VPU lane work:

* ``xray_hatstub``  — skip the hat construction chain (streams/select/
  abs/max) but keep the (B, NSK) materialization + matmul;
* ``xray_noexp``    — skip the exp over the (B, 2*NBS) fused rates;
* ``xray_nocash``   — skip the Cash log/masks;
* ``HAT_BF16``      — cast hats to bf16 before the table matmul (the f32
  dot already runs a bf16 MXU pass; this halves the 134 MB/step VMEM
  traffic of the biggest intermediate);
* ``LNX_CONST``     — ln(r)-from-constant rows in the gNFW pressure
  grids (one scalar log per walker instead of (B, NP) passes).

Each variant runs 2x1000 dependent-chained steps.  The knob variants
also get an ACCURACY gate: max |delta log-like| vs the base kernel on a
4096-walker MLE-cloud batch, on rows within 100 of the batch peak (the
posterior-relevant window — CLAUDE.md r3).

Run:  setsid nohup python -u scripts/tpu_xray_micro_bench.py > /tmp/xmicro.log 2>&1 &
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

VARIANTS = [
    ("base", {}, ""),
    ("hatstub", {}, "xray_hatstub"),
    ("noexp", {}, "xray_noexp"),
    ("nocash", {}, "xray_nocash"),
    ("hat_bf16", {"HAT_BF16": True}, ""),
    ("lnx_const", {"LNX_CONST": True}, ""),
    ("both_knobs", {"HAT_BF16": True, "LNX_CONST": True}, ""),
]

out = {"W": W, "n_steps": REPS * N_IN}
for name, knobs, ablate in VARIANTS:
    for k, v in knobs.items():
        setattr(pj, k, v)
    try:
        k_ = pj.make_step_kernel(sess, n_inner=N_IN, n_walkers=W,
                                 ablate=ablate)
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
        log(f"{name:>11}: {us:8.2f} us/step ({W / us:.2f}M evals/s)")
    except Exception as e:
        log(f"{name}: FAILED — {type(e).__name__}: {e}")
        out[name] = None
    finally:
        for k in knobs:
            setattr(pj, k, getattr(pj, k).__class__(False))
        pj.HAT_BF16 = False
        pj.LNX_CONST = False

# ---- accuracy gate for the knobs (near-peak window rule) ---------------
B_A = 4096
pa = jnp.asarray(theta0[None] * (
    1 + 0.02 * rng.standard_normal((B_A, theta0.size))).astype(np.float32))
lp_base = np.asarray(core(pa))
peak = lp_base.max()
win = lp_base >= peak - 100.0
log(f"accuracy window: {int(win.sum())}/{B_A} rows within 100 of peak")
acc_rep = {}
for name, knobs in [("hat_bf16", {"HAT_BF16": True}),
                    ("lnx_const", {"LNX_CONST": True}),
                    ("both_knobs", {"HAT_BF16": True, "LNX_CONST": True})]:
    for k, v in knobs.items():
        setattr(pj, k, v)
    try:
        core_k = pj.make_joint_core(sess, block_b=256)
        lp_k = np.asarray(core_k(pa))
        d = np.abs(lp_k - lp_base)
        acc_rep[name] = {
            "max_dll_near_peak": float(d[win].max()),
            "max_dll_all_finite": float(
                d[np.isfinite(lp_base) & np.isfinite(lp_k)].max()),
        }
        log(f"{name}: max |dll| near-peak {acc_rep[name]['max_dll_near_peak']:.4g}, "
            f"all-finite {acc_rep[name]['max_dll_all_finite']:.4g}")
    except Exception as e:
        log(f"{name} accuracy: FAILED — {type(e).__name__}: {e}")
        acc_rep[name] = None
    finally:
        pj.HAT_BF16 = False
        pj.LNX_CONST = False

out["accuracy"] = acc_rep
if out.get("base"):
    out["attribution_us"] = {
        "hat_construction": (round(out["base"] - out["hatstub"], 2)
                             if out.get("hatstub") else None),
        "xray_exp": (round(out["base"] - out["noexp"], 2)
                     if out.get("noexp") else None),
        "cash": (round(out["base"] - out["nocash"], 2)
                 if out.get("nocash") else None),
        "hat_bf16_gain": (round(out["base"] - out["hat_bf16"], 2)
                          if out.get("hat_bf16") else None),
        "lnx_const_gain": (round(out["base"] - out["lnx_const"], 2)
                           if out.get("lnx_const") else None),
        "both_knobs_gain": (round(out["base"] - out["both_knobs"], 2)
                            if out.get("both_knobs") else None),
    }
print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_xray_micro.json").write_text(
    json.dumps(out, indent=2))
log("DONE")
