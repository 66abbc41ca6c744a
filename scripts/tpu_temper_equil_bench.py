"""Settles the tempered-tau discrepancy: plain vs K=4 tempered cold-chain
tau at W=1024, each equilibrated through its OWN kernel.

The original A/B (scripts/tpu_temper_tau_bench.py, docs/PERFORMANCE.md
"Tempered sampling" table) equilibrated the tempered runs with the PLAIN
kernel — 4000 steps ~= 2 plain tau, i.e. a mode-collapsed start — so its
tempered tau_max (~1200) measured the residual relaxation drift, not the
ladder's stationary mixing.  Two independent production fits (W=1024,
K=4, burned in through the ladder) instead show cold-chain tau ~32-44
steps.  This bench reproduces both protocols on one claim:

  plain   W=1024: own-kernel equilibration 3x4000 steps, then 20000
                  measured steps (thin 25)
  temper  K=4 W=1024: ladder equilibration 2x2000 steps, then 20000
                  measured steps (thin 25), swap rates reported

and reports tau, per-eval cost (tau*K), and same-claim wall N_eff/s for
both.  Run: setsid nohup python -u scripts/tpu_temper_equil_bench.py \
    > /tmp/tequil.log 2>&1 &
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
from joxsz_tpu.postproc.summary import chain_tau_steps, \
    collect_kernel_subchain

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
D = theta0.size
core = make_joint_core(sess, block_b=256)
rng = np.random.default_rng(3)
log(f"backend {jax.default_backend()}; session ready")

W, K, THIN, N_Q, N_CHUNKS = 1024, 4, 25, 2000, 10
x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (W, D)))).astype(np.float32))

# ---- plain, own-kernel equilibration ---------------------------------------
eq = make_step_kernel(sess, n_inner=4000, n_walkers=W)
if eq is None:
    log("make_step_kernel returned None (spec outside the kernel "
        "specialisation) — aborting")
    sys.exit(1)
x, lp, acc = x0, core(x0), jnp.zeros(W, jnp.float32)
for i in range(3):
    x, lp, acc = eq(x, lp, acc, 5 + i)
jax.block_until_ready(x)
log("plain: equilibrated 12000 steps at W=1024")

step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W, thin=THIN)
if step_c is None:
    log("make_step_kernel(thin) returned None — aborting")
    sys.exit(1)
acc = jnp.zeros(W, jnp.float32)
plain_state = {"x": x, "lp": lp, "acc": acc}
t1 = time.time()


def plain_chunk(i):
    plain_state["x"], plain_state["lp"], plain_state["acc"], ch, _ = \
        step_c(plain_state["x"], plain_state["lp"], plain_state["acc"],
               700 + i)
    return ch


sub = collect_kernel_subchain(plain_chunk, N_CHUNKS, ndim=D)
jax.block_until_ready(plain_state["x"])
wall_p = time.time() - t1
tau = chain_tau_steps(sub, THIN)
tau_plain = float(tau.max())
neff_p = N_Q * N_CHUNKS * W / tau_plain / wall_p
log(f"plain: tau mean {tau.mean():7.1f} max {tau_plain:7.1f}; "
    f"wall {wall_p:.1f}s -> {neff_p:,.0f} N_eff/s")

# ---- tempered, ladder equilibration ----------------------------------------
betas = default_betas(K)
eq_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q, n_walkers=W)
if eq_t is None:
    log("make_tempered_step_kernel returned None — aborting")
    sys.exit(1)
xk = jnp.broadcast_to(x0[None], (K, W, D))
lpk = jnp.stack([core(xk[k]) for k in range(K)])
acck = jnp.zeros((K, W), jnp.float32)
for i in range(2):
    xk, lpk, acck, _ = eq_t(xk, lpk, acck, 40 + i)[:4]
jax.block_until_ready(xk)
log(f"tempered: equilibrated 4000 ladder steps at K={K} W={W}")

step_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q, n_walkers=W,
                                   thin=THIN)
if step_t is None:
    log("make_tempered_step_kernel(thin) returned None — aborting")
    sys.exit(1)
temper_state = {"x": xk, "lp": lpk, "acc": jnp.zeros((K, W), jnp.float32)}
sacc = np.zeros(K - 1)
t1 = time.time()


def temper_chunk(i):
    # swap-rate accumulation lives in this closure — the reason the
    # shared collect_kernel_subchain helper fits here after all
    temper_state["x"], temper_state["lp"], temper_state["acc"], sa, ch, \
        _ = step_t(temper_state["x"], temper_state["lp"],
                   temper_state["acc"], 900 + i)
    sacc[:] += np.asarray(sa)
    return ch


sub = collect_kernel_subchain(temper_chunk, N_CHUNKS, ndim=D)
jax.block_until_ready(temper_state["x"])
wall_t = time.time() - t1
tau = chain_tau_steps(sub, THIN)
tau_t = float(tau.max())
neff_t = N_Q * N_CHUNKS * W / tau_t / wall_t
log(f"tempered K={K}: tau mean {tau.mean():7.1f} max {tau_t:7.1f}; "
    f"swap rates {np.round(sacc/(N_Q*N_CHUNKS*W), 3)}; "
    f"per-eval cost tau*K {tau_t*K:7.1f} vs plain {tau_plain:7.1f}; "
    f"wall {wall_t:.1f}s -> {neff_t:,.0f} N_eff/s")
log(f"verdict: tempered/plain N_eff/s ratio {neff_t/neff_p:.2f}x "
    f"(same claim)")
print("DONE", flush=True)
