"""Hardware posterior-agreement check for the KNOTS kernel family after
the round-2 segment-averaged mass veto (midpoint constants RMK/AKV/SKV
+ hardware-PRNG path — exactly the class of thing interpret mode cannot
validate, see CLAUDE.md).

Kernel sampler vs XLA scan sampler on the knots joint posterior at
W=512 (independent random streams): marginal pulls and width ratios,
plus in-kernel recorded lp vs joint-core recomputation, plus a
hardware veto-structure cross-check against the XLA batch likelihood.

Run: setsid nohup python -u scripts/tpu_knots_kernel_check.py > /tmp/kk.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble, generate_init_positions

# N_SAMP must be several tau (tau ~ 1000 steps on the multimodal
# log r_s direction): at 3000 steps the two streams' medians pull up
# to ~0.9 sigma from pure sampling noise
W, N_BURN, N_SAMP, THIN = 512, 3000, 9000, 5

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
cfg.pressure_model = "knots"
sess = build_session(cfg)
names = list(sess.params.thawed)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; knots session "
    f"({len(names)} params)")

# hardware veto-structure cross-check: Mosaic kernel vs XLA batch on a
# boundary-rich cloud (the CI test pins this in interpret mode only)
rng = np.random.default_rng(7)
cloud = jnp.asarray((theta0[None] * (1 + 0.1 * rng.standard_normal(
    (512, theta0.size)))).astype(np.float32))
lk = np.asarray(core(cloud))
lx = np.asarray(jax.jit(jax.vmap(sess.log_like))(cloud))
flips = int((np.isfinite(lk) != np.isfinite(lx)).sum())
fin = np.isfinite(lk) & np.isfinite(lx)
dmax = float(np.abs(lk[fin] - lx[fin]).max())
# near-mode walkers are what sampling actually visits; far tails have
# |ll| ~ 1e5 where f32 bf16-pass matmuls give O(1e-2) RELATIVE error
# (absolute dll can reach hundreds there — expected, not a bug)
near = fin & (lx > np.nanmax(lx[fin]) - 200.0)
dnear = float(np.abs(lk[near] - lx[near]).max()) if near.any() else 0.0
log(f"HARDWARE veto agreement: {flips}/512 structure flips; "
    f"|dll| max {dmax:.3g} (all finite), {dnear:.3g} (near-mode)")

p0 = generate_init_positions(core, jnp.asarray(theta0), W,
                             jax.random.PRNGKey(12), spread=0.1)

# ---- kernel sampler --------------------------------------------------------
eq = make_step_kernel(sess, n_inner=N_BURN, n_walkers=W)
x, lp, acc = eq(p0, core(p0), jnp.zeros(W, jnp.float32), 3)
step_c = make_step_kernel(sess, n_inner=N_SAMP, n_walkers=W, thin=THIN)
x, lp, acc, ch_k, chlp_k = step_c(x, lp, jnp.zeros(W, jnp.float32), 4)
jax.block_until_ready(x)
ch_k = np.asarray(ch_k)
# stored lp vs recompute (veto + likelihood consistency on hardware)
lp_re = np.asarray(core(jnp.asarray(ch_k[-1])))
dlp = np.abs(np.asarray(chlp_k)[-1] - lp_re)
log(f"kernel chain {ch_k.shape}; stored-lp vs recompute max "
    f"|d| {dlp.max():.3g}")

# ---- two INDEPENDENT XLA streams -------------------------------------------
# several directions (log r_s multimodality, the (log n0, beta, log rc)
# core coupling) have tau ~ 1000 steps and basin-occupancy fluctuations
# far slower than that, so the meaningful criterion is: kernel-vs-XLA
# deviations must be within the XLA-vs-XLA NULL distribution at the
# same chain length, not below an absolute threshold.
lp_b = jax.jit(jax.vmap(sess.log_like))
chains_x = []
for seed in (21, 31):
    # the null stream gets its OWN init cloud: streams sharing p0 have
    # correlated basin occupancy (slow modes switch on timescales >>
    # tau), which would make the null underdispersed relative to the
    # kernel stream's independent trajectory
    p0_s = (p0 if seed == 21 else generate_init_positions(
        core, jnp.asarray(theta0), W, jax.random.PRNGKey(113),
        spread=0.1))
    res_b = run_ensemble(lp_b, p0_s, N_BURN, jax.random.PRNGKey(seed),
                         thin=N_BURN)
    res_x = run_ensemble(lp_b, res_b.final_state[0], N_SAMP,
                         jax.random.PRNGKey(seed + 1), thin=THIN)
    chains_x.append(np.asarray(res_x.chain))
log(f"xla chains 2 x {chains_x[0].shape}")


def stats(ch):
    f = ch.reshape(-1, len(names))
    return np.median(f, axis=0), np.std(f, axis=0)


mk, sk = stats(ch_k)
m1, s1 = stats(chains_x[0])
m2, s2 = stats(chains_x[1])
ok = True
print("   param              kernel-vs-xla1   null(xla2-vs-xla1)",
      flush=True)
for i, n in enumerate(names):
    s = max(np.hypot(sk[i], s1[i]) / np.sqrt(2), 1e-12)
    pull = (mk[i] - m1[i]) / s
    null = (m2[i] - m1[i]) / max(np.hypot(s2[i], s1[i]) / np.sqrt(2),
                                 1e-12)
    wr = sk[i] / max(s1[i], 1e-12)
    wr_null = s2[i] / max(s1[i], 1e-12)
    bad = (abs(pull) > max(0.5, 1.5 * abs(null) + 0.2)
           or not (min(0.6, wr_null * 0.8) < wr
                   < max(1.6, wr_null * 1.25)))
    if bad:
        ok = False
    print(f"   {n:18} pull {pull:+6.2f} wr {wr:5.2f}   "
          f"null {null:+6.2f} wr {wr_null:5.2f}"
          f"{'  <-- CHECK' if bad else ''}", flush=True)
print(("PASS" if ok and flips <= 3 and dlp.max() < 0.1
       and dnear < 1.0 else "FAIL")
      + " knots-family hardware agreement", flush=True)
