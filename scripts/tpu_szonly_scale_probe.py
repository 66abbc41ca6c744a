"""SZ-only (preprofit-path) kernel at extreme walker counts.

The joint kernel's absolute-row wall is W=131072 (compile-helper exit 1
even at vmem 120 MB — A.10, recorded not worth chasing).  The SZ-only
family has no X-ray tables/scratch, so its VMEM footprint is far
smaller — probe W = 32768 / 65536 / 131072 with the default auto
half_tile and record where the family's wall actually is.

Writes results/tpu_szonly_scale.json.
Run: setsid nohup python -u scripts/tpu_szonly_scale_probe.py \
    > /tmp/szp.log 2>&1 &
"""

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg, sz_only=True)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; SZ-only session ready (D={D})")

out = {"family": "sz_only", "runs": []}
for W in (32768, 65536, 131072):
    rng = np.random.default_rng(9)
    x0 = jnp.asarray((theta0[None] * (1 + 0.05 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    t1 = time.time()
    step = make_step_kernel(sess, n_inner=500, n_walkers=W)
    x, lp, acc = x0, core(x0), jnp.zeros(W, jnp.float32)
    try:
        x, lp, acc = step(x, lp, acc, 5)
        jax.block_until_ready(x)
    except Exception as e:
        log(f"W={W}: FAIL {type(e).__name__}: {str(e)[:200]}")
        out["runs"].append({"W": W, "fail": str(e)[:200]})
        continue
    compile_s = time.time() - t1
    t1 = time.time()
    for i in range(2):
        x, lp, acc = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    wall = time.time() - t1
    r = {"W": W, "compile_plus_first_s": round(compile_s, 1),
         "steps_per_s": round(1000 / wall, 1),
         "evals_per_s_M": round(1000 * W / wall / 1e6, 2),
         "lp_finite_frac": float(np.isfinite(np.asarray(lp)).mean())}
    out["runs"].append(r)
    log(f"W={W}: {r['evals_per_s_M']}M evals/s ({r['steps_per_s']} "
        f"steps/s; first call {compile_s:.0f}s)")

p = REPO / "results" / "tpu_szonly_scale.json"
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
