"""One persistent TPU session: staged compile/run timing + bench numbers.

Run: setsid nohup python scripts/tpu_probe.py > /tmp/tpu_probe.log 2>&1 &
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

log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

# stage 1: trivial
t = time.time()
x = jnp.arange(128, dtype=jnp.float32)
f = jax.jit(lambda a: jnp.sum(a * 2 + 1))
v = float(f(x))
log(f"trivial jit: {v} in {time.time()-t:.1f}s")
t = time.time()
f(x).block_until_ready()
log(f"trivial cached: {time.time()-t:.3f}s")

# stage 2: matmul
t = time.time()
A = jnp.asarray(np.random.rand(1024, 313).astype(np.float32))
B = jnp.asarray(np.random.rand(313, 86).astype(np.float32))
mm = jax.jit(lambda a, b: a @ b)
mm(A, B).block_until_ready()
log(f"matmul compile+run: {time.time()-t:.1f}s")

# stage 3: batched joint likelihood
t = time.time()
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
log(f"session built: {time.time()-t:.1f}s")

theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
W = 1024
rng = np.random.default_rng(0)
p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))

ll_b = jax.jit(jax.vmap(sess.log_like))
t = time.time()
out = ll_b(p0).block_until_ready()
log(f"batched ll ({W}) compile+run: {time.time()-t:.1f}s; "
    f"finite: {int(np.isfinite(np.asarray(out)).sum())}/{W}")
t = time.time()
n_rep = 100
for _ in range(n_rep):
    out = ll_b(p0)
out.block_until_ready()
per = (time.time() - t) / n_rep
log(f"batched ll steady: {per*1e3:.2f} ms/call -> {W/per:,.0f} evals/s")

# stage 4: ensemble scan (the bench program)
from joxsz_tpu.sampling.stretch import run_ensemble

t = time.time()
res = run_ensemble(ll_b, p0, 200, jax.random.PRNGKey(0), thin=200)
log(f"ensemble scan (200 steps) compile+run: {time.time()-t:.1f}s")
t = time.time()
res = run_ensemble(ll_b, res.final_state[0], 200, jax.random.PRNGKey(1),
                   thin=200)
wall = time.time() - t
log(f"ensemble steady: {wall:.2f}s for 200x{W} evals -> "
    f"{200*W/wall:,.0f} evals/s; acc {res.acceptance_fraction.mean():.3f}")

# stage 5: pallas fused path
try:
    from joxsz_tpu.io.readers import read_conversion_table, read_xy

    conv = read_conversion_table(cfg.sz.conversion_file)
    flux = read_xy(cfg.sz.flux_file, 3)
    fused = jax.jit(sess.model.log_like_batch_fused(
        conv, flux, sess.sz_operator, use_pallas=True))
    t = time.time()
    out2 = fused(p0).block_until_ready()
    log(f"pallas fused ll compile+run: {time.time()-t:.1f}s; "
        f"max |diff| vs vmap: "
        f"{np.nanmax(np.abs(np.asarray(out2)-np.asarray(ll_b(p0)))):.3e}")
    t = time.time()
    for _ in range(n_rep):
        out2 = fused(p0)
    out2.block_until_ready()
    per2 = (time.time() - t) / n_rep
    log(f"pallas fused steady: {per2*1e3:.2f} ms/call -> {W/per2:,.0f} evals/s")

    res = run_ensemble(fused, p0, 200, jax.random.PRNGKey(2), thin=200)
    t = time.time()
    res = run_ensemble(fused, res.final_state[0], 200, jax.random.PRNGKey(3),
                       thin=200)
    wall = time.time() - t
    log(f"pallas ensemble steady: {wall:.2f}s -> {200*W/wall:,.0f} evals/s")
except Exception as e:
    log(f"pallas path failed: {type(e).__name__}: {e}")

log("DONE")
