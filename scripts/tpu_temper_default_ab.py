"""Same-claim A/B: does tempered K=4 at chip-filling W beat the W=1024
converged default? (VERDICT r3 task 1.)

The first bigw run (tpu_temper_bigw_bench.py, claim of 2026-08-19) gave
stationary tau_max ~685 at BOTH W=2048 and W=4096 vs the r3 W=1024
measurement of 404, with steps/s falling super-linearly past W=2048
(958 -> 365), and K=4 x W=8192 failing Mosaic VMEM compile (163M > 128M
limit).  But tau claims need same-seed-protocol, same-claim numbers, so
this script runs W=1024 (two seeds, to bound tau scatter), 2048, 4096
tempered PLUS a plain W=4096 anchor in ONE claim, identical protocol:
10%-spread cloud around the config defaults, 4000-step ladder
equilibration, 20000 measured steps, thin 25, 64-walker tau slice.

Writes results/tpu_temper_bigw.json.

Run: setsid nohup python -u scripts/tpu_temper_default_ab.py \
    > /tmp/tab.log 2>&1 &
"""

import json
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
log(f"backend {jax.default_backend()}; session ready")

K, THIN, N_Q, N_CHUNKS = 4, 25, 2000, 10
betas = default_betas(K)
sl = jax.jit(lambda c: c[:, :64, :D])
out = {"protocol": "10% cloud around config defaults, 4000-step ladder "
                   "equilibration, 20000 measured, thin 25, 64-walker "
                   "tau slice; all points one claim", "runs": []}


def measure_tempered(W, seed):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    step_t = make_tempered_step_kernel(sess, betas, n_inner=N_Q,
                                       n_walkers=W, thin=THIN)
    if step_t is None:
        log(f"tempered W={W}: kernel declined")
        return
    xk = jnp.broadcast_to(x0[None], (K, W, D))
    lpk = jnp.stack([core(xk[k]) for k in range(K)])
    acck = jnp.zeros((K, W), jnp.float32)
    for i in range(2):
        xk, lpk, acck = step_t(xk, lpk, acck, 40 + 100 * seed + i)[:3]
    jax.block_until_ready(xk)
    acck = jnp.zeros((K, W), jnp.float32)
    subs, sacc = [], np.zeros(K - 1)
    t1 = time.time()
    for i in range(N_CHUNKS):
        # 100*seed keeps chunk-seed ranges DISJOINT across runs: with
        # `900 + seed + i` the two W=1024 scatter runs (seed 3 vs 11)
        # shared 2 of 10 PRNG streams (r4 self-review) — correlated
        # trajectories narrow the very scatter being measured
        xk, lpk, acck, sa, ch, _ = step_t(xk, lpk, acck,
                                          900 + 100 * seed + i)
        sacc += np.asarray(sa)
        subs.append(sl(ch))
    jax.block_until_ready(xk)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau = chain_tau_steps(sub, THIN)
    tau_t = float(tau.max())
    r = {"sampler": "tempered", "K": K, "W": W, "seed": seed,
         "rows": K * W, "tau_max": round(tau_t, 1),
         "tau_mean": round(float(tau.mean()), 1),
         "steps_per_s": round(N_Q * N_CHUNKS / wall, 1),
         "wall_s": round(wall, 2),
         "swap_rates": [round(float(s), 3)
                        for s in sacc / (N_Q * N_CHUNKS * W)],
         "neff_per_s": round(N_Q * N_CHUNKS * W / tau_t / wall, 1)}
    out["runs"].append(r)
    log(f"tempered W={W} seed={seed}: tau_max {tau_t:.0f} "
        f"{r['steps_per_s']:,} steps/s -> {r['neff_per_s']:,} N_eff/s")


def measure_plain(W, seed, n_chunks=20):
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
        (W, D)))).astype(np.float32))
    step_c = make_step_kernel(sess, n_inner=N_Q, n_walkers=W, thin=THIN)
    x, lp, acc = x0, core(x0), jnp.zeros(W, jnp.float32)
    for i in range(6):                       # 12000-step own-kernel equil
        x, lp, acc = step_c(x, lp, acc, 70 + i)[:3]
    jax.block_until_ready(x)
    acc = jnp.zeros(W, jnp.float32)
    subs = []
    t1 = time.time()
    for i in range(n_chunks):
        x, lp, acc, ch, _ = step_c(x, lp, acc, 800 + i)
        subs.append(sl(ch))
    jax.block_until_ready(x)
    wall = time.time() - t1
    sub = np.concatenate([np.asarray(s) for s in subs])
    tau_t = float(chain_tau_steps(sub, THIN).max())
    r = {"sampler": "plain", "W": W, "seed": seed, "rows": W,
         "tau_max": round(tau_t, 1),
         "steps_per_s": round(N_Q * n_chunks / wall, 1),
         "wall_s": round(wall, 2),
         "neff_per_s": round(N_Q * n_chunks * W / tau_t / wall, 1)}
    out["runs"].append(r)
    log(f"plain W={W} seed={seed}: tau_max {tau_t:.0f} "
        f"{r['steps_per_s']:,} steps/s -> {r['neff_per_s']:,} N_eff/s "
        f"(window {N_Q*n_chunks/tau_t:.0f} tau — plain tau is "
        "window-limited, anchor only)")


measure_tempered(1024, seed=3)
measure_tempered(1024, seed=11)
measure_tempered(2048, seed=3)
measure_tempered(4096, seed=3)
measure_plain(4096, seed=3)

p = pathlib.Path("/root/repo/results/tpu_temper_bigw.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
