"""Equilibrium acceptance-fraction cross-check: step kernel vs XLA
sampler at the same ensemble size, starting from the same equilibrated
state (the flagship fit's saved walkers).

Run: setsid nohup python scripts/tpu_acc_check.py <state.npz> > /tmp/acc.log 2>&1 &
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
from joxsz_tpu.sampling.kernel import make_kernel_sampler
from joxsz_tpu.sampling.stretch import run_ensemble

state = np.load(sys.argv[1])
x0 = jnp.asarray(state["positions"], jnp.float32)
W = x0.shape[0]
log(f"backend {jax.default_backend()}; {W} equilibrated walkers")

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
ks = make_kernel_sampler(sess)

res_k = ks.run(x0, 1000, jax.random.PRNGKey(0), store_chain=False)
log(f"kernel sampler acc over 1000 equilibrated steps: "
    f"{float(np.mean(res_k.acceptance_fraction)):.4f}")

ll = jax.jit(jax.vmap(sess.log_like))
res_x = run_ensemble(ll, x0, 1000, jax.random.PRNGKey(1), thin=1000,
                     store_chain=True)
log(f"xla sampler    acc over 1000 equilibrated steps: "
    f"{float(np.mean(res_x.acceptance_fraction)):.4f}")
log("DONE")
