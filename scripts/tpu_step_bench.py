"""Isolate stretch-move step overhead on TPU: variants of the step design.

Run: setsid nohup python scripts/tpu_step_bench.py > /tmp/step_bench.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

t_start = time.time()


def log(msg):
    print(f"[{time.time()-t_start:8.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.stretch import make_step

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
W = 1024
rng = np.random.default_rng(0)
p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal((W, D)))
                  ).astype(np.float32))

ll_real = jax.vmap(sess.log_like)
ll_dummy = lambda x: -0.5 * jnp.sum(x * x, axis=-1)

from joxsz_tpu.io.readers import read_conversion_table, read_xy
conv = read_conversion_table(cfg.sz.conversion_file)
flux = read_xy(cfg.sz.flux_file, 3)
ll_fused = sess.model.log_like_batch_fused(conv, flux, sess.sz_operator,
                                           use_pallas=True)


def time_scan(name, ll, n_steps=200, unroll=1):
    step = make_step(ll, D)

    @jax.jit
    def drive(x, lp, acc, key):
        keys = jax.random.split(key, n_steps)
        state, _ = jax.lax.scan(step, (x, lp, acc), keys, unroll=unroll)
        return state

    lp0 = ll(p0)
    acc0 = jnp.zeros((W,), jnp.float32)
    out = drive(p0, lp0, acc0, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t = time.time()
    out = drive(p0, lp0, acc0, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    dt = (time.time() - t) / n_steps
    log(f"{name}: {dt*1e3:.3f} ms/step -> {W/dt:,.0f} evals/s")
    return dt


# A: dummy likelihood -> pure sampler overhead
time_scan("dummy-ll step", jax.jit(ll_dummy))
# B: real likelihood (vmap)
time_scan("real-ll step", ll_real)
# B2: real likelihood unroll=2
time_scan("real-ll unroll2", ll_real, unroll=2)
# C: pallas fused
time_scan("pallas-ll step", ll_fused)

# D: likelihood-only scan (no stretch machinery) for reference
@jax.jit
def ll_scan(x, key):
    def body(c, k):
        return c, jnp.sum(ll_real(x))
    _, ys = jax.lax.scan(body, 0.0, jax.random.split(key, 200))
    return ys

ys = ll_scan(p0, jax.random.PRNGKey(0))
jax.block_until_ready(ys)
t = time.time()
ys = ll_scan(p0, jax.random.PRNGKey(1))
jax.block_until_ready(ys)
log(f"ll-only scan: {(time.time()-t)/200*1e3:.3f} ms/iter (batch {W})")

# E: RNG-only scan
@jax.jit
def rng_scan(key):
    def body(c, k):
        k1, k2 = jax.random.split(k)
        ks = jax.random.split(k1, 3)
        u = jax.random.uniform(ks[0], (W // 2,))
        i = jax.random.randint(ks[1], (W // 2,), 0, W // 2)
        u2 = jax.random.uniform(ks[2], (W // 2,))
        return c, u.sum() + i.sum() + u2.sum()
    _, ys = jax.lax.scan(body, 0.0, jax.random.split(key, 200))
    return ys

ys = rng_scan(jax.random.PRNGKey(0))
jax.block_until_ready(ys)
t = time.time()
ys = rng_scan(jax.random.PRNGKey(1))
jax.block_until_ready(ys)
log(f"rng-only scan: {(time.time()-t)/200*1e3:.3f} ms/iter")

log("DONE")
