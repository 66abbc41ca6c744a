"""Scale probe for the r5 tempered kernel: how far past the old wall
does K=4 go?  Throughput-only (no equilibration — tau at these sizes
is covered by the A/B in tpu_temper_half_tile_ab.py); records compile
success + steps/s + rows/s for K=4 x W in {16384, 32768}.

Writes results/tpu_temper_scale.json.
Run: setsid nohup python -u scripts/tpu_temper_scale_probe.py \
    > /tmp/tsp.log 2>&1 &
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                        make_tempered_step_kernel)
from joxsz_tpu.sampling.tempered import default_betas

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

K = 4
betas = default_betas(K)
out = {"runs": []}

for W in (16384, 32768):
    rng = np.random.default_rng(5)
    x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    t1 = time.time()
    # no chain (throughput probe): 500-step blocks
    step = make_tempered_step_kernel(sess, betas, n_inner=500,
                                     n_walkers=W, thin=None)
    xk = jnp.broadcast_to(x0[None], (K, W, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W), jnp.float32)
    try:
        xk, lpk, acck, sa = step(xk, lpk, acck, 7)
        jax.block_until_ready(xk)
    except Exception as e:
        log(f"K=4 x W={W}: FAIL {type(e).__name__}: {str(e)[:300]}")
        out["runs"].append({"K": K, "W": W, "rows": 2 * K * W // 2,
                            "fail": str(e)[:300]})
        continue
    compile_s = time.time() - t1
    # timed: chain two calls so dispatch pipelining can't fake the rate
    t1 = time.time()
    for i in range(2):
        xk, lpk, acck, sa = step(xk, lpk, acck, 100 + i)
    jax.block_until_ready(xk)
    wall = time.time() - t1
    sps = 1000 / wall
    r = {"K": K, "W": W, "rows": K * W,
         "compile_plus_first_s": round(compile_s, 1),
         "steps_per_s": round(sps, 1),
         "rows_per_s_M": round(sps * K * W / 1e6, 2),
         "lp_finite_frac": float(np.isfinite(np.asarray(lpk)).mean())}
    out["runs"].append(r)
    log(f"K=4 x W={W} ({K*W} rows): {r['steps_per_s']} steps/s = "
        f"{r['rows_per_s_M']}M rows/s (first call {compile_s:.0f}s)")

p = pathlib.Path("/root/repo/results/tpu_temper_scale.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
