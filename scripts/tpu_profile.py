"""Capture a TPU profile of the sampling step + summarize hot ops.

Run: setsid nohup python scripts/tpu_profile.py > /tmp/tpu_profile.log 2>&1 &
"""

import glob
import gzip
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def log(msg):
    print(msg, flush=True)


import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.stretch import run_ensemble

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
W = 4096
rng = np.random.default_rng(0)
p0 = jnp.asarray((theta0[None] * (1 + 0.01 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
ll = jax.jit(jax.vmap(sess.log_like))

# warm
res = run_ensemble(ll, p0, 100, jax.random.PRNGKey(0), thin=100)
log(f"warm done; backend {jax.default_backend()}")

logdir = "/tmp/jax_profile"
with jax.profiler.trace(logdir):
    res = run_ensemble(ll, res.final_state[0], 200, jax.random.PRNGKey(1),
                       thin=200)
    jax.block_until_ready(res.final_state[0])
log("trace captured")

# locate the trace and report its size (full analysis needs xprof UI;
# we record the artifact path for the docs)
files = glob.glob(logdir + "/**/*", recursive=True)
for f in sorted(files):
    if pathlib.Path(f).is_file():
        log(f"  {f} ({pathlib.Path(f).stat().st_size//1024} KB)")
log("DONE")
