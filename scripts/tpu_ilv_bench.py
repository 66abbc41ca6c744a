"""Same-claim A/B of the ILV knob (issue the X-ray table matmul before
the veto+SZ VPU blocks) at W=32768 and W=4096.

Hypothesis (ops/pallas_joint.py ILV comment): the peak-ablation chunk
costs are ADDITIVE (proposal + X-ray + SZ + shared == full), so the
~130 us of X-ray MXU time is fully exposed — the in-order VPU issue
stalls at exp(l01) immediately after the dot.  Hoisting the dot puts
~200 us of independent veto+SZ VPU work between issue and first use;
if the TPU overlaps MXU/VPU across that window the full step should
shed up to the matmul's wall share.

ILV moves computation only (op set and total-update order unchanged),
so the two orders must be BIT-EXACT — checked here on hardware on a
4096-row batch before timing; no posterior band gate is needed.

Protocol: per W, interleave base/ilv kernels A/B/A/B (dependent-chained
1000-step invocations, min of REPS) so claim drift inside the session
cannot masquerade as a knob effect.

Run:  setsid nohup python -u scripts/tpu_ilv_bench.py > /tmp/ilv.log 2>&1 &
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

ILV_DEFAULT = pj.ILV
N_IN, REPS = 1000, 3
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), np.float32)
rng = np.random.default_rng(0)

# ---- hardware bit-exactness (the whole correctness claim) ----------------
pbig = jnp.asarray(theta0[None] * (
    1 + 0.05 * rng.standard_normal((4096, theta0.size))).astype(np.float32))
pj.ILV = False
core0 = pj.make_joint_core(sess, block_b=256)
l0 = np.asarray(core0(pbig))
pj.ILV = True
core1 = pj.make_joint_core(sess, block_b=256)
l1 = np.asarray(core1(pbig))
pj.ILV = ILV_DEFAULT
bitexact = bool(np.array_equal(l0, l1))
log(f"hardware bit-exact on 4096 rows: {bitexact} "
    f"(finite {int(np.isfinite(l0).sum())})")

out = {"bit_exact": bitexact, "N_IN": N_IN, "REPS": REPS, "sweeps": {}}

for W in (32768, 4096):
    p0 = jnp.asarray(theta0[None] * (
        1 + 0.01 * rng.standard_normal((W, theta0.size))
    ).astype(np.float32))
    lp0 = core0(p0)
    jax.block_until_ready(lp0)
    kernels = {}
    for name, ilv in (("base", False), ("ilv", True)):
        pj.ILV = ilv
        kernels[name] = pj.make_step_kernel(sess, n_inner=N_IN,
                                            n_walkers=W)
        pj.ILV = ILV_DEFAULT
        if kernels[name] is None:
            log(f"FATAL: make_step_kernel None for {name} at W={W}")
            sys.exit(1)
    # warm both (compile), then interleave timed reps A/B/A/B
    state = {}
    for name, k in kernels.items():
        x, lp, acc = k(p0, lp0, jnp.zeros(W, jnp.float32), 31)
        jax.block_until_ready(x)
        state[name] = (x, lp, acc)
    best = {name: float("inf") for name in kernels}
    for rep in range(REPS):
        for name, k in kernels.items():
            x, lp, acc = state[name]
            t1 = time.time()
            x, lp, acc = k(x, lp, acc, 32 + rep)
            jax.block_until_ready(x)
            best[name] = min(best[name], (time.time() - t1) / N_IN * 1e6)
            state[name] = (x, lp, acc)
    sweep = {name: round(us, 2) for name, us in best.items()}
    sweep["ilv_gain_us"] = round(best["base"] - best["ilv"], 2)
    sweep["ilv_gain_pct"] = round(
        100.0 * (best["base"] - best["ilv"]) / best["base"], 2)
    out["sweeps"][f"W{W}"] = sweep
    log(f"W={W}: base {sweep['base']} us/step, ilv {sweep['ilv']} us/step "
        f"({sweep['ilv_gain_pct']}%)")

print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_ilv_bench.json").write_text(
    json.dumps(out, indent=2))
log("DONE")
