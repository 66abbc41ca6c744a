"""Joint mega-kernel vs XLA vmap on the real TPU.

Run: setsid nohup python scripts/tpu_joint_kernel_bench.py > /tmp/jk.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core
from joxsz_tpu.sampling.stretch import run_ensemble

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(0)
W = 4096
p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))

ref = jax.jit(jax.vmap(sess.log_like))
core = make_joint_core(sess, block_b=256)

# correctness on hardware first
a = np.asarray(core(p0[:512]))
b = np.asarray(ref(p0[:512]))
fin = np.isfinite(b)
log(f"hw parity: veto match {np.array_equal(np.isfinite(a), fin)}, "
    f"max |diff| {np.max(np.abs(a[fin]-b[fin])):.3e} "
    f"(ll scale ~{np.abs(b[fin]).mean():.0f})")

# likelihood-only throughput
for name, fn in (("xla", ref), ("kernel", core)):
    out = fn(p0); jax.block_until_ready(out)
    t = time.time()
    for _ in range(100):
        out = fn(p0)
    jax.block_until_ready(out)
    dt = (time.time() - t) / 100
    log(f"{name:6s} ll: {dt*1e3:6.3f} ms -> {W/dt:12,.0f} evals/s")

# full sampling step
for name, fn in (("xla", ref), ("kernel", core)):
    n = 200
    res = run_ensemble(fn, p0, n, jax.random.PRNGKey(0), thin=n)
    t = time.time()
    res = run_ensemble(fn, res.final_state[0], n, jax.random.PRNGKey(1),
                       thin=n)
    dt = time.time() - t
    log(f"{name:6s} sampling: {dt/n*1e3:6.3f} ms/step -> "
        f"{W*n/dt:12,.0f} evals/s (acc {res.acceptance_fraction.mean():.3f})")

log("DONE")
