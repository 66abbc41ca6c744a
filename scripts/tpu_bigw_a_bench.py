"""Two follow-ups to the round-2 scaling work:

1. Does roll-partner throughput keep rising past W=16384?  (The
   quadratic one-hot gather was the old ceiling; with it gone the next
   wall is VMEM state size / VPU throughput.)
2. Does the stretch scale a < 2 improve mixing on this posterior?
   (acceptance at W=2048 equilibrium is only ~0.09 with the reference's
   a=2; emcee lore says smaller a raises acceptance and can cut tau —
   that would multiply N_eff/s at zero hardware cost.)

Run: setsid nohup python -u scripts/tpu_bigw_a_bench.py > /tmp/bigw.log 2>&1 &
"""

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
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
from joxsz_tpu.postproc.summary import (chain_tau_steps,
                                        collect_kernel_subchain)

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
core = make_joint_core(sess, block_b=256)
rng = np.random.default_rng(0)
log(f"backend {jax.default_backend()}; session ready")

# ---- phase 1: big-W roll scaling ------------------------------------------
for W in (16384, 32768, 65536):
    try:
        x = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
            (W, theta0.size)))).astype(np.float32))
        lp = core(x)
        step = make_step_kernel(sess, n_inner=100, n_walkers=W,
                                partner="roll")
        acc = jnp.zeros(W, jnp.float32)
        x, lp, acc = step(x, lp, acc, 1)
        jax.block_until_ready(x)
        t = time.time()
        for i in range(10):
            x, lp, acc = step(x, lp, acc, 2 + i)
        jax.block_until_ready(x)
        per = (time.time() - t) / 1000
        log(f"W={W}: {per*1e6:7.1f} us/step -> {W/per:.3g} evals/s")
    except Exception as e:
        log(f"W={W}: FAILED {type(e).__name__}: {str(e)[:160]}")

# ---- phase 2: stretch-scale scan at W=2048 --------------------------------
W, THIN, N_Q, N_CHUNKS = 2048, 5, 2000, 5
x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
eq = make_step_kernel(sess, n_inner=4000, n_walkers=W)
x_eq, lp_eq, _ = eq(x0, core(x0), jnp.zeros(W, jnp.float32), 11)
jax.block_until_ready(x_eq)
log("equilibrated 4000 steps at W=2048 (a=2)")

for a in (2.0, 1.5, 1.3, 1.15):
    step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W, thin=THIN,
                              a=a)
    st = [x_eq, lp_eq, jnp.zeros(W, jnp.float32)]

    def run_chunk(i, st=st, step_c=step_c):
        st[0], st[1], st[2], ch, chlp = step_c(st[0], st[1], st[2], 500 + i)
        return ch

    sub = collect_kernel_subchain(run_chunk, N_CHUNKS, ndim=theta0.size)
    tau = chain_tau_steps(sub, THIN)
    acc_frac = float(np.asarray(st[2]).mean()) / (N_Q * N_CHUNKS)
    log(f"a={a}: tau(steps) mean {tau.mean():7.1f} max {tau.max():7.1f}; "
        f"acc {acc_frac:.3f}")
print("DONE", flush=True)
