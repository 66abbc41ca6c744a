"""Multi-seed posterior stability through the PRODUCTION step-kernel
sampler (4 independent 1024-walker flagship fits), cross-checked against
the XLA-sampler study (results/posterior_stability.json).

Run: setsid nohup python scripts/tpu_stability_kernel.py > /tmp/stab_k.log 2>&1 &
"""

import json
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

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.sampling.stretch import generate_init_positions
from joxsz_tpu.sampling.kernel import make_kernel_sampler
from joxsz_tpu.sampling.mle import find_mle
from joxsz_tpu.postproc.summary import summary_dict

log(f"backend {jax.default_backend()}")
cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)

W = 1024
ks = make_kernel_sampler(sess)
assert ks is not None
mle_theta, mle_ll = find_mle(sess.log_like, theta0,
                             sess.params.lo, sess.params.hi)
mle_theta = mle_theta.astype(np.float32)
log(f"MLE ll {mle_ll:.1f}")

results = {}
for seed in (1, 2, 3, 4):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = generate_init_positions(ks.log_prob_batch, mle_theta, W, k1,
                                 spread=0.1)
    t = time.time()
    res = ks.run(p0, 2000, k2, store_chain=False)                # burn
    res = ks.run(jnp.asarray(res.final_state[0]), 5000, k3, thin=5)
    dt = time.time() - t
    flat = res.chain.reshape(-1, theta0.size)
    s = summary_dict(flat, sess.params.thawed, chain_3d=res.chain)
    results[f"seed{seed}"] = s
    med = {n: round(v["median"], 3) for n, v in s["parameters"].items()}
    log(f"seed {seed}: {7000*W/dt:,.0f} evals/s; acc "
        f"{res.acceptance_fraction.mean():.3f}; medians {med}")

# cross-seed agreement + against the XLA-sampler study
names = sess.params.thawed
med = np.array([[results[f"seed{s}"]["parameters"][n]["median"]
                 for n in names] for s in (1, 2, 3, 4)])
std = np.array([[results[f"seed{s}"]["parameters"][n]["std"]
                 for n in names] for s in (1, 2, 3, 4)])
spread = med.std(axis=0) / np.maximum(std.mean(axis=0), 1e-12)
log("cross-seed median spread / posterior width: "
    + np.array2string(spread, precision=2))

xla_path = pathlib.Path("/root/repo/results/posterior_stability.json")
if xla_path.exists():
    xla = json.loads(xla_path.read_text())
    xmed = np.array([[xla[f"seed{s}"]["parameters"][n]["median"]
                      for n in names] for s in (1, 2, 3, 4)])
    pulls = (med.mean(axis=0) - xmed.mean(axis=0)) \
        / np.maximum(std.mean(axis=0), 1e-12)
    log("kernel-vs-XLA mean-median pulls: "
        + np.array2string(pulls, precision=2))

out = pathlib.Path("/root/repo/results/posterior_stability_kernel.json")
out.write_text(json.dumps(results, indent=2))
log(f"wrote {out}")
log("DONE")
