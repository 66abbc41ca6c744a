"""Does parallel tempering actually cut the cold-chain autocorrelation
time on this posterior?  tau ~ 800 steps for the plain stretch move is
geometry-limited (the a-scan showed acceptance isn't the problem:
scripts/tpu_bigw_a_bench.py), and the multimodal (log r_s, epsilon)
subspace is exactly what a temperature ladder is for — but the
cold-chain tau of the tempered kernel has never been measured, only its
throughput and swap rates.

Same claim: plain W=512 tau vs tempered K=4/K=6 (geometric ladder
ratio 0.6) cold-chain tau, all from one equilibrated cloud, 20k steps
each.  Fair comparison is tau per LIKELIHOOD EVAL: the tempered
sampler pays K likelihood batches per step.

Run: setsid nohup python -u scripts/tpu_temper_tau_bench.py > /tmp/ttau.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import (make_joint_core, make_step_kernel,
                                        make_tempered_step_kernel)
from joxsz_tpu.sampling.tempered import default_betas
from joxsz_tpu.postproc.summary import chain_tau_steps

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
rng = np.random.default_rng(3)
log(f"backend {jax.default_backend()}; session ready")

W, THIN, N_Q, N_CHUNKS = 512, 5, 2000, 10
x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (W, D)))).astype(np.float32))
eq = make_step_kernel(sess, n_inner=4000, n_walkers=W)
x_eq, lp_eq, _ = eq(x0, core(x0), jnp.zeros(W, jnp.float32), 5)
jax.block_until_ready(x_eq)
log("equilibrated 4000 steps at W=512")

sl = jax.jit(lambda c: c[:, :64, :D])

# ---- plain baseline --------------------------------------------------------
step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W, thin=THIN)
x, lp, acc = x_eq, lp_eq, jnp.zeros(W, jnp.float32)
subs = []
t1 = time.time()
for i in range(N_CHUNKS):
    x, lp, acc, ch, chlp = step_c(x, lp, acc, 700 + i)
    subs.append(sl(ch))
jax.block_until_ready(x)
wall = time.time() - t1
sub = np.concatenate([np.asarray(s) for s in subs])
tau = chain_tau_steps(sub, THIN)
tau_plain = float(tau.max())
log(f"plain: tau mean {tau.mean():7.1f} max {tau.max():7.1f}; "
    f"evals/step 1.0x; wall {wall:.1f}s")

# ---- tempered --------------------------------------------------------------
for K in (4, 6):
    betas = default_betas(K)
    step_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q,
                                       n_walkers=W, thin=THIN)
    xk = jnp.broadcast_to(x_eq[None], (K, W, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W), jnp.float32)
    subs = []
    sacc = np.zeros(K - 1)
    t1 = time.time()
    for i in range(N_CHUNKS):
        xk, lpk, acck, sa, ch, chlp = step_t(xk, lpk, acck, 800 + 31 * K + i)
        sacc += np.asarray(sa)
        subs.append(sl(ch))
    jax.block_until_ready(xk)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau = chain_tau_steps(sub, THIN)
    log(f"K={K}: tau mean {tau.mean():7.1f} max {tau.max():7.1f}; "
        f"swap rates {np.round(sacc/(N_Q*N_CHUNKS*W), 3)}; "
        f"tau_max*K (per-eval cost) {tau.max()*K:7.1f} vs plain "
        f"{tau_plain:7.1f}; wall {wall:.1f}s")
print("DONE", flush=True)
