"""Stage-timing probe for the survey CLI's --step-kernel path.

Times each stage of survey._fit_survey_kernel at the CLI-default scale
(C=4, W=256, 300 burn + 600 sample, thin 10) to attribute the observed
~26 s fit wall (the kernel itself benches at ~0.2 ms/step, so ~0.2 s of
the wall is sampling — where does the rest go?).

Run: setsid nohup python -u scripts/tpu_survey_probe.py > /tmp/survey_probe.log 2>&1 &
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
from joxsz_tpu.models.multicluster import make_multicluster_log_like
from joxsz_tpu.ops.pallas_joint import (make_multicluster_consts,
                                        make_multicluster_step_kernel)
from joxsz_tpu.sampling.batched import batched_init
from joxsz_tpu.simulate import simulate_survey

log(f"backend {jax.default_backend()}")

C, W, N_BURN, N_STEPS, THIN, SEED = 4, 256, 300, 600, 10, 6

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
names = list(sess.params.thawed)
truths = np.tile(theta0, (C, 1))
truths[:, names.index("P_0")] *= np.linspace(0.8, 1.2, C)
rng = np.random.default_rng(0)
t = time.time()
survey = simulate_survey(sess.model, truths, rng)
log(f"session+mocks built ({time.time()-t:.1f}s)")
sz_stack, xr_stack = survey.sz_stack, survey.xray_stack

t = time.time()
consts = make_multicluster_consts(sess, sz_stack, xr_stack)
samp = make_multicluster_step_kernel(sess, sz_stack, xr_stack,
                                     n_inner=N_STEPS, n_walkers=W,
                                     thin=THIN, consts=consts)
burn = make_multicluster_step_kernel(sess, sz_stack, xr_stack,
                                     n_inner=N_BURN, n_walkers=W,
                                     consts=consts)
log(f"kernel builders (shared consts): {time.time()-t:.2f}s")

t = time.time()
batched_ll = jax.jit(make_multicluster_log_like(
    sess.model, sz_stack, xr_stack, flatten=True))
p0 = batched_init(batched_ll, jnp.asarray(truths, jnp.float32), W,
                  jax.random.PRNGKey(SEED), spread=0.05)
p0.block_until_ready()
log(f"batched_init (flat widened-GEMM ll): {time.time()-t:.2f}s")

t = time.time()
x = jnp.asarray(p0, jnp.float32)
lp = jnp.asarray(batched_ll(x), jnp.float32)
lp.block_until_ready()
log(f"lp0: {time.time()-t:.2f}s")

acc = jnp.zeros((C, W), jnp.float32)
t = time.time()
x, lp, acc = burn(x, lp, acc, 2 * SEED + 1)
jax.block_until_ready((x, lp))
log(f"burn call ({N_BURN} steps): {time.time()-t:.2f}s")

acc = jnp.zeros_like(acc)
t = time.time()
out = samp(x, lp, acc, 2 * SEED + 2)
jax.block_until_ready(out)
log(f"sample call ({N_STEPS} steps, thin {THIN}): {time.time()-t:.2f}s")

t = time.time()
chain = np.asarray(out[3])
log(f"chain transfer {chain.nbytes/1e6:.1f} MB: {time.time()-t:.2f}s")

# second sample call: steady-state step rate (same compiled program)
x2, lp2, acc2 = out[0], out[1], jnp.zeros_like(acc)
t = time.time()
out2 = samp(x2, lp2, acc2, 2 * SEED + 4)
jax.block_until_ready(out2)
dt = time.time() - t
log(f"repeat sample call: {dt:.2f}s -> {dt/N_STEPS*1e3:.3f} ms/step, "
    f"{C*W*N_STEPS/dt/1e6:.1f}M evals/s")
log("done")
