"""Config #4 science demo: non-parametric knot-pressure fits of the real
CL J1226 data vs the flagship gNFW posterior, all through the production
kernel sampler.

For n_knots in {5, 7, 9}: MLE -> burn -> sample on TPU; compare the
recovered P(r) posterior bands against the gNFW fit's band on the same
radius grid.  The non-parametric profile should agree with the
parametric one where the data constrain it (tens to hundreds of kpc)
and inflate its uncertainty outside.

Writes results/knot_pressure_demo.json.

Run: setsid nohup python scripts/tpu_knot_demo.py > /tmp/knd.log 2>&1 &
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
from joxsz_tpu.sampling.kernel import make_kernel_sampler
from joxsz_tpu.sampling.stretch import generate_init_positions
from joxsz_tpu.sampling.mle import find_mle

log(f"backend {jax.default_backend()}")

W = 512
R_EVAL = np.geomspace(20.0, 1500.0, 24)     # kpc, data-constrained range


def fit_pressure_band(cfg, seed):
    sess = build_session(cfg)
    ks = make_kernel_sampler(sess)
    assert ks is not None, "kernel declined the configuration"
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    mle, ll = find_mle(sess.log_like, theta0, sess.params.lo,
                       sess.params.hi)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    p0 = generate_init_positions(ks.log_prob_batch,
                                 mle.astype(np.float32), W, k1,
                                 spread=0.05)
    res = ks.run(p0, 1500, k2, store_chain=False)              # burn
    res = ks.run(jnp.asarray(res.final_state[0]), 3000, k3, thin=5)
    flat = res.chain.reshape(-1, theta0.size)
    # posterior pressure band on the shared radius grid
    press_fn = jax.jit(jax.vmap(
        lambda th: sess.model.pressure(sess.params.unpack(th),
                                       jnp.asarray(R_EVAL))))
    sub = flat[:: max(1, len(flat) // 20000)]
    P = np.asarray(press_fn(jnp.asarray(sub, jnp.float32)))
    band = np.percentile(P, [16, 50, 84], axis=0)
    return float(ll), band, float(res.acceptance_fraction.mean())


results = {"r_kpc": R_EVAL.tolist()}

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
ll, band_g, acc = fit_pressure_band(cfg, 101)
results["gnfw"] = {"mle_ll": ll, "band": band_g.tolist(), "acc": acc}
log(f"gnfw: MLE ll {ll:.1f}, acc {acc:.3f}")

for nk in (5, 7, 9):
    cfg = JoXSZConfig.cl1226()
    cfg.dtype = "float32"
    cfg.pressure_model = "knots"
    cfg.n_pressure_knots = nk
    ll, band, acc = fit_pressure_band(cfg, 200 + nk)
    # agreement: gNFW median inside the knots 68% band, per radius
    inside = ((band_g[1] >= band[0]) & (band_g[1] <= band[2]))
    results[f"knots{nk}"] = {
        "mle_ll": ll, "band": band.tolist(), "acc": acc,
        "gnfw_median_inside_68": inside.tolist(),
        "frac_inside": float(inside.mean()),
    }
    log(f"knots{nk}: MLE ll {ll:.1f}, acc {acc:.3f}, "
        f"gnfw-median inside 68% band at {inside.mean()*100:.0f}% of radii")

out = pathlib.Path("/root/repo/results/knot_pressure_demo.json")
out.write_text(json.dumps(results, indent=1))
log(f"wrote {out}")
log("DONE")
