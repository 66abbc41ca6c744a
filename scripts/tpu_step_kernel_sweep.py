"""Hardware benchmark of the Pallas joint-likelihood kernels.

1. mega-kernel batch throughput, measured honestly: a lax.map over blocks
   inside ONE jit (device-serial, one host dispatch) and a dependent chain
   of single calls (per-call latency incl. host round trip).
2. fused step-loop kernel over ensemble sizes.
3. the thin-recording variant (chain snapshots inside the kernel).

Run: setsid nohup python scripts/tpu_step_kernel_sweep.py > /tmp/sw.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_step_kernel, make_joint_core

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)
core = make_joint_core(sess, block_b=256)
ref_ll = jax.jit(jax.vmap(sess.log_like))

# ---- 1. mega-kernel honest batch throughput --------------------------------
W = 4096
xb = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))


from functools import partial


@partial(jax.jit, static_argnums=1)
def serial_blocks(x, n):
    # n independent evaluations of the whole batch, chained so the device
    # cannot skip or overlap host dispatch: out feeds a tiny perturbation
    def body(c, i):
        lp = core_inner(x + 1e-12 * c)
        return jnp.float32(jnp.max(lp) * 0), lp
    _, lps = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
    return lps


core_inner = make_joint_core(sess, block_b=256)
t = time.time()
lps = serial_blocks(xb, 16)
jax.block_until_ready(lps)
log(f"mega-kernel W={W}: compile+16 chained calls {time.time()-t:.1f}s")
t = time.time()
lps = serial_blocks(xb, 16)
jax.block_until_ready(lps)
per_call = (time.time() - t) / 16
log(f"mega-kernel W={W} device-serial: {per_call*1e3:.3f} ms/call -> "
    f"{W/per_call/1e6:.1f}M evals/s")

t = time.time()
lp = core(xb)
jax.block_until_ready(lp)
for _ in range(5):
    t = time.time()
    lp = core(xb + 1e-12 * jnp.max(lp))
    jax.block_until_ready(lp)
log(f"mega-kernel W={W} dependent single call: {(time.time()-t)*1e3:.3f} ms"
    " (incl host round trip)")

t = time.time()
lp = ref_ll(xb)
jax.block_until_ready(lp)
t = time.time()
for _ in range(5):
    lp = ref_ll(xb + 1e-12 * jnp.max(lp))
    jax.block_until_ready(lp)
per = (time.time() - t) / 5
log(f"xla vmap    W={W} dependent single call: {per*1e3:.3f} ms -> "
    f"{W/per/1e6:.1f}M evals/s")

# ---- 2. step-loop kernel over ensemble sizes --------------------------------
n_inner = 100
for Wk in (512, 1024, 2048):
    x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (Wk, theta0.size)))).astype(np.float32))
    try:
        step = make_step_kernel(sess, n_inner=n_inner, n_walkers=Wk)
        lp0 = core(x0)
        t = time.time()
        x, lp, acc = step(x0, lp0, jnp.zeros(Wk), 1)
        jax.block_until_ready(x)
        log(f"step W={Wk}: compile+run {time.time()-t:.1f}s, "
            f"acc {float(acc.mean())/n_inner:.3f}")
        lp_re = core(x)
        err = float(jnp.nanmax(jnp.abs(lp - lp_re)))
        t = time.time()
        reps = 10
        for i in range(reps):
            x, lp, acc = step(x, lp, acc, 100 + i)
        jax.block_until_ready(x)
        per_step = (time.time() - t) / (reps * n_inner)
        log(f"step W={Wk}: {per_step*1e3:.4f} ms/step -> "
            f"{Wk/per_step:,.0f} evals/s (lp err {err:.1e})")
    except Exception as e:
        log(f"step W={Wk}: FAILED: {type(e).__name__}: {str(e)[:300]}")

# ---- 3. thin-recording variant ----------------------------------------------
for Wk, n_in in ((512, 500), (1024, 500)):
    x0 = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (Wk, theta0.size)))).astype(np.float32))
    try:
        stepc = make_step_kernel(sess, n_inner=n_in, n_walkers=Wk, thin=5)
        lp0 = core(x0)
        t = time.time()
        x, lp, acc, ch, chlp = stepc(x0, lp0, jnp.zeros(Wk), 1)
        jax.block_until_ready(x)
        log(f"chain W={Wk} n_inner={n_in} thin=5: compile+run "
            f"{time.time()-t:.1f}s, acc {float(acc.mean())/n_in:.3f}")
        lp_re = core(jnp.asarray(ch[-1]))
        err = float(jnp.nanmax(jnp.abs(chlp[-1] - lp_re)))
        t = time.time()
        reps = 4
        for i in range(reps):
            x, lp, acc, ch, chlp = stepc(x, lp, acc, 50 + i)
        jax.block_until_ready(x)
        per_step = (time.time() - t) / (reps * n_in)
        log(f"chain W={Wk}: {per_step*1e3:.4f} ms/step sustained (with "
            f"chain) -> {Wk/per_step:,.0f} evals/s (lp err {err:.1e})")
    except Exception as e:
        log(f"chain W={Wk}: FAILED: {type(e).__name__}: {str(e)[:300]}")
log("DONE")
