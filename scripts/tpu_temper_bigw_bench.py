"""Does the K=4 ladder at LARGE W beat the plain kernel's quality
throughput?  The ladder-equilibration A/B (tpu_temper_equil_bench.py)
showed tempered per-eval quality near parity with plain and wall
N_eff/s 2.22x better at W=1024 because K*W=4096 rows fill the chip.
The plain quality headline is ~13.3k N_eff/s at W=4096 (bench.py); if
the same chip-filling logic holds, K=4 x W=4096 (16384 likelihood
rows/step, the plain kernel's proven peak row count) should land near
steps/s * 4096 / tau_t ~ 18k N_eff/s.

Same protocol as the A/B: ladder-equilibrated 4000 steps, 20000
measured steps, thin 25, 64-walker tau slice.

Run: setsid nohup python -u scripts/tpu_temper_bigw_bench.py \
    > /tmp/tbigw.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core, \
    make_tempered_step_kernel
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

K, THIN, N_Q, N_CHUNKS = 4, 25, 2000, 10
betas = default_betas(K)
sl = jax.jit(lambda c: c[:, :64, :D])

for W in (2048, 4096, 8192):
    x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    eq_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q,
                                     n_walkers=W)
    if eq_t is None:
        log(f"W={W}: kernel declined (spec mismatch)")
        continue
    xk = jnp.broadcast_to(x0[None], (K, W, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W), jnp.float32)
    for i in range(2):
        xk, lpk, acck = eq_t(xk, lpk, acck, 40 + i)[:3]
    jax.block_until_ready(xk)
    log(f"W={W}: equilibrated 4000 ladder steps")

    step_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q,
                                       n_walkers=W, thin=THIN)
    acck = jnp.zeros((K, W), jnp.float32)
    subs = []
    sacc = np.zeros(K - 1)
    t1 = time.time()
    for i in range(N_CHUNKS):
        xk, lpk, acck, sa, ch, chlp = step_t(xk, lpk, acck, 900 + i)
        sacc += np.asarray(sa)
        subs.append(sl(ch))
    jax.block_until_ready(xk)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau = chain_tau_steps(sub, THIN)
    tau_t = float(tau.max())
    neff = N_Q * N_CHUNKS * W / tau_t / wall
    log(f"W={W} K={K}: tau mean {tau.mean():7.1f} max {tau_t:7.1f}; "
        f"swap rates {np.round(sacc/(N_Q*N_CHUNKS*W), 3)}; "
        f"{N_Q*N_CHUNKS/wall:,.0f} steps/s; wall {wall:.1f}s -> "
        f"{neff:,.0f} N_eff/s (plain headline ~13.3k at W=4096)")
print("DONE", flush=True)
