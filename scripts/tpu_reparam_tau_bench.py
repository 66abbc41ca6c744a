"""Log-reparametrization tau A/B on the real joint posterior
(same-claim): does sampling (P_0, a, b, r_p) in log-space straighten the
curved gNFW degeneracy enough to beat identity-space mixing?

Both arms run the XLA scan sampler (the step kernels are theta-space
specialised) at W=1024 from the same equilibrated theta cloud; tau is
measured on the THETA-space chains (physical-parameter mixing is what
matters) over 20k steps thin 25 per the CLAUDE.md window rules.

Run: setsid nohup python -u scripts/tpu_reparam_tau_bench.py > /tmp/rep.log 2>&1 &
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
from joxsz_tpu.sampling.stretch import run_ensemble, generate_init_positions
from joxsz_tpu.sampling.reparam import LogReparam
from joxsz_tpu.postproc.summary import chain_tau_steps

W, THIN, N_Q, N_CHUNKS, N_EQ = 1024, 25, 4000, 5, 4000

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
names = list(sess.params.thawed)
lp_b = jax.jit(jax.vmap(sess.log_like))
rp = LogReparam(sess.params)
lp_u = jax.jit(rp.wrap_log_prob_batch(lp_b))
log(f"backend {jax.default_backend()}; log params {rp.names}")

p0 = generate_init_positions(lp_b, jnp.asarray(theta0), W,
                             jax.random.PRNGKey(3), spread=0.1)
# shared theta-space equilibration, then each arm equilibrates again in
# its own space (the identity arm re-equilibration keeps step counts
# symmetric)
eq = run_ensemble(lp_b, p0, N_EQ, jax.random.PRNGKey(4), thin=N_EQ)
x_eq = eq.final_state[0]
jax.block_until_ready(x_eq)
log(f"shared equilibration {N_EQ} steps done")

for arm, lpf, to_space, to_theta in (
        ("identity", lp_b, lambda x: x, lambda c: np.asarray(c)),
        ("log-reparam", lp_u, rp.fwd, rp.chain_to_theta)):
    x = to_space(x_eq)
    r = run_ensemble(lpf, x, N_EQ, jax.random.PRNGKey(10), thin=N_EQ)
    x = r.final_state[0]
    subs = []
    t1 = time.time()
    for i in range(N_CHUNKS):
        r = run_ensemble(lpf, x, N_Q, jax.random.PRNGKey(100 + i),
                         thin=THIN, keep_walkers=64)
        x = r.final_state[0]
        subs.append(r.chain)
    jax.block_until_ready(x)
    wall = time.time() - t1
    acc = float(np.asarray(r.acceptance_fraction).mean())
    sub = to_theta(np.concatenate(subs, axis=0))
    tau = chain_tau_steps(sub, THIN)
    worst = int(np.argmax(tau))
    order = np.argsort(tau)[::-1][:4]
    log(f"{arm}: tau(steps) mean {tau.mean():7.1f} max {tau.max():7.1f} "
        f"(worst={names[worst]}); acc {acc:.3f}; wall {wall:6.1f}s "
        f"for {N_Q*N_CHUNKS} steps")
    log(f"  slowest four: "
        + ", ".join(f"{names[i]}={tau[i]:.0f}" for i in order))
print("DONE", flush=True)
