"""Hardware smoke + micro-bench for the coupled sharded kernel sampler.

Validates on the real chip (1-device mesh — multi-chip behaviour is
pinned bit-exactly on the virtual CPU mesh by
tests/test_parallel.py::test_coupled_sharded_bitmatches_single_device):

1. Mosaic compiles make_coupled_half_kernel (pltpu.roll with a traced
   shift, 4-scalar SMEM block, input_output_aliases, per-substep
   prng_seed(seed, i, which)).
2. The stored packed-lane log-probs equal a fresh core() re-eval of the
   chain positions (likelihood consistency on hardware).
3. Acceptance in the healthy GW band.
4. us/step vs the fused make_step_kernel at equal W — quantifies the
   per-substep dispatch + all-gather overhead the docstring warns about.

Run: setsid nohup python -u scripts/tpu_coupled_smoke.py \
       > /tmp/tpu_coupled_smoke.log 2>&1 &
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

from jax.sharding import Mesh

from joxsz_tpu.build import build_session
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
from joxsz_tpu.parallel.kernel_sharded import run_coupled_sharded_ensemble

log(f"backend: {jax.default_backend()}")

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
log("session built")

W, n_steps, thin, seed = 256, 200, 20, 31
D = len(sess.params.thawed)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
rng = np.random.default_rng(5)
x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal((W, D))),
                 jnp.float32)
mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("walker",))

t = time.time()
res = run_coupled_sharded_ensemble(sess, x0, n_steps, seed, mesh, thin=thin)
log(f"coupled run (compile+exec): {time.time()-t:.1f}s "
    f"chain {res.chain.shape}")

core = make_joint_core(sess)
lp_re = np.asarray(core(jnp.asarray(res.chain[-1], jnp.float32)))
dlp = np.max(np.abs(lp_re - res.log_prob[-1]) / np.abs(lp_re))
acc = float(np.mean(res.acceptance_fraction))
log(f"lp consistency max rel: {dlp:.2e}  (want < 2e-6)")
log(f"acceptance: {acc:.3f}  (want 0.15-0.45)")

# timing: steady-state us/step, coupled vs fused, same claim.  The
# driver cache means this second call reuses the compiled program —
# without it the 'steady' number silently included a multi-second
# cached-compile reload through the remote tunnel.
res2 = run_coupled_sharded_ensemble(sess, x0, n_steps, seed + 1, mesh,
                                    thin=thin)
t = time.time()
res2 = run_coupled_sharded_ensemble(sess, x0, n_steps, seed + 2, mesh,
                                    thin=thin)
dt_c = time.time() - t
log(f"coupled steady: {dt_c/n_steps*1e6:.0f} us/step ({n_steps} steps)")

step = make_step_kernel(sess, n_inner=n_steps, n_walkers=W, thin=thin)
lp0 = core(x0)
out = step(x0, lp0, jnp.zeros(W, jnp.float32), seed)
jax.block_until_ready(out)
t = time.time()
out = step(x0, lp0, jnp.zeros(W, jnp.float32), seed + 1)
jax.block_until_ready(out)
dt_f = time.time() - t
log(f"fused steady:   {dt_f/n_steps*1e6:.0f} us/step")
log(f"coupled/fused overhead: {dt_c/dt_f:.1f}x")

ok = dlp < 2e-6 and 0.15 < acc < 0.45
log(f"RESULT: {'PASS' if ok else 'FAIL'}")
sys.exit(0 if ok else 1)
