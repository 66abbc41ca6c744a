"""Same-claim cost attribution at the THROUGHPUT-PEAK walker count
(W=32768) — where does the 941 us step actually go?

The bench attribution runs at W=4096 with 200-step invocations, where
the ~10 ms remote dispatch adds ~17 us/step of claim-dependent noise to
every absolute number (ratios/differences stay valid).  Here each
configuration runs 2x1000 dependent-chained steps at W=32768, so
dispatch is <1% and the absolute split (proposal floor vs X-ray vs SZ
vs transcendental chunk) is trustworthy.  This decides where further
peak-throughput work should aim: a large no_ll share means attack the
proposal/partner/state machinery; a small one means the likelihood
transcendentals own the step (the standing docs/PERFORMANCE.md
roofline claim).

Run:  setsid nohup python -u scripts/tpu_peak_ablate.py > /tmp/peakabl.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import (make_joint_core,  # noqa: E402
                                        make_step_kernel)

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
core = make_joint_core(sess, block_b=256)
lp0 = core(p0)
jax.block_until_ready(lp0)
log("session + core ready")

out = {"W": W, "n_steps": REPS * N_IN}
for ablate in ("", "no_ll", "no_xray", "no_sz", "priors"):
    k = make_step_kernel(sess, n_inner=N_IN, n_walkers=W, ablate=ablate)
    if k is None:
        log(f"ablate={ablate!r}: kernel builder returned None — skipped")
        continue
    x, lp, acc = k(p0, lp0, jnp.zeros(W, jnp.float32), 11)   # compile+warm
    jax.block_until_ready(x)
    t1 = time.time()
    for i in range(REPS):
        x, lp, acc = k(x, lp, acc, 12 + i)
    jax.block_until_ready(x)
    us = (time.time() - t1) / (REPS * N_IN) * 1e6
    out[ablate or "full"] = round(us, 2)
    log(f"ablate={ablate or 'full':>8}: {us:8.2f} us/step "
        f"({W / us:.2f}M evals/s)")

full = out.get("full")
if full:
    out["attribution_us"] = {
        "proposal_floor(no_ll)": out.get("no_ll"),
        "xray(full-no_xray)": (round(full - out["no_xray"], 2)
                               if "no_xray" in out else None),
        "sz(full-no_sz)": (round(full - out["no_sz"], 2)
                          if "no_sz" in out else None),
        "likelihood_rest": (round(out["priors"] - out["no_ll"], 2)
                            if "priors" in out and "no_ll" in out
                            else None),
    }
print(json.dumps(out), flush=True)
(REPO / "results" / "tpu_peak_ablation.json").write_text(
    json.dumps(out, indent=2))
log("DONE")
