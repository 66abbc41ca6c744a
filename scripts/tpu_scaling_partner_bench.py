"""W>4096 falloff attribution + partner-mixing A/B (VERDICT r1 weak #6,
advisor finding on partner='roll').

Hypothesis: the (H, H) one-hot partner gather is O(H^2 Dp) FLOPs — it
crosses the whole likelihood's FLOP count near W=4096 and dominates by
W=16384 (4.2 MFLOP/walker vs ~0.75 for the likelihood).  partner='roll'
removes exactly that matmul, so the same-claim (onehot - roll) delta IS
the partner cost.

Phases (one TPU claim):
  1. W in {4096, 8192, 16384} x {onehot, roll, no_ll}: dependent-chained
     step timings, all same-claim (normalise by the no_ll floor).
  2. Mixing A/B at W=2048: integrated autocorrelation time of onehot vs
     roll chains (10k steps each) — the missing measurement before roll
     can be recommended at large W.

Run: setsid nohup python scripts/tpu_scaling_partner_bench.py > /tmp/scal.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
from joxsz_tpu.postproc.summary import chain_tau_steps

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

rng = np.random.default_rng(0)


def timed_steps(W, n_inner, reps, **kw):
    """Dependent-chained per-step wall time for one kernel variant."""
    x = jnp.asarray((theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    lp = core(x)
    step = make_step_kernel(sess, n_inner=n_inner, n_walkers=W, **kw)
    acc = jnp.zeros(W, jnp.float32)
    x, lp, acc = step(x, lp, acc, 1)            # compile + warm
    jax.block_until_ready(x)
    t = time.time()
    for i in range(reps):
        x, lp, acc = step(x, lp, acc, 2 + i)
    jax.block_until_ready(x)
    return (time.time() - t) / (n_inner * reps)


# ---- phase 1: scaling attribution -----------------------------------------
print("\nW       onehot(us)  roll(us)  no_ll(us)  partner(us)  "
      "evals/s(onehot)  evals/s(roll)")
for W in (4096, 8192, 16384):
    # explicit partner= (the kernel default became "auto", which resolves
    # to roll above 4096 walkers — unlabeled, this column would time roll)
    t_one = timed_steps(W, 100, 10, partner="onehot")
    t_roll = timed_steps(W, 100, 10, partner="roll")
    t_floor = timed_steps(W, 100, 10, ablate="no_ll")
    print(f"{W:6d} {t_one*1e6:10.1f} {t_roll*1e6:9.1f} "
          f"{t_floor*1e6:10.1f} {(t_one-t_roll)*1e6:11.1f} "
          f"{W/t_one:15.3g} {W/t_roll:13.3g}", flush=True)

# ---- phase 2: mixing A/B at W=2048 ----------------------------------------
W, THIN, N_Q, N_CHUNKS = 2048, 5, 2000, 5
x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (W, theta0.size)))).astype(np.float32))
lp0 = core(x0)

# shared equilibration (onehot)
eq = make_step_kernel(sess, n_inner=2000, n_walkers=W)
x_eq, lp_eq, _ = eq(x0, lp0, jnp.zeros(W, jnp.float32), 11)
jax.block_until_ready(x_eq)
log("equilibrated 2000 steps at W=2048")

sl = jax.jit(lambda c: c[:, :64, :theta0.size])
for partner in ("onehot", "roll"):
    step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W, thin=THIN,
                              partner=partner)
    x, lp, acc = x_eq, lp_eq, jnp.zeros(W, jnp.float32)
    subs = []
    t1 = time.time()
    for i in range(N_CHUNKS):
        x, lp, acc, ch, chlp = step_c(x, lp, acc, 300 + i)
        subs.append(sl(ch))
    jax.block_until_ready(x)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau = chain_tau_steps(sub, THIN)
    acc_frac = float(np.asarray(acc).mean()) / (N_Q * N_CHUNKS)
    log(f"partner={partner}: tau(steps) mean {tau.mean():6.1f} "
        f"max {tau.max():6.1f}; acc {acc_frac:.3f}; "
        f"wall {wall:6.1f}s for {N_Q*N_CHUNKS} steps")
print("DONE", flush=True)
