"""Drill into the finite-mask mismatch found by tpu_precision_probe:
4/1024 rows drawn from the CONVERGED chain are -inf under the XLA
log-like while the fused kernels disagree on the mask.

For every row where any of {xla, packed, legacy} disagrees on
finiteness, print the three values plus the XLA-side component split
(prior, mass-veto flag, X-ray, SZ) so we can see WHICH term flips, and
dump the rows to /tmp/maskrows.npz for an f64 CPU adjudication
(scripts/cpu_finite_mask_adjudicate.py).

Run: setsid nohup python -u scripts/tpu_finite_mask_probe.py \
       > /tmp/maskprobe.log 2>&1 &
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


import h5py
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
import joxsz_tpu.ops.pallas_joint as pj

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
log(f"backend {jax.default_backend()}; session ready")

rng = np.random.default_rng(0)
with h5py.File("results/tpu_conv/joxsz_chain.hdf5", "r") as f:
    ch = f["mcmc/chain"][-2:]
flat = ch.reshape(-1, ch.shape[-1]).astype(np.float32)
idx = rng.choice(flat.shape[0], size=1024, replace=False)
batch = flat[idx]
bj = jnp.asarray(batch)

vals = {}
for fuse in ("packed", "legacy"):
    pj.XRAY_FUSE = fuse
    vals[fuse] = np.asarray(pj.make_joint_core(sess, block_b=256)(bj))
pj.XRAY_FUSE = "packed"
vals["xla"] = np.asarray(jax.jit(jax.vmap(sess.log_like))(bj))

masks = {k: np.isfinite(v) for k, v in vals.items()}
mism = (masks["xla"] != masks["packed"]) | (masks["xla"] != masks["legacy"])
rows = np.flatnonzero(mism)
log(f"mask mismatch rows: {rows.tolist()}  "
    f"(xla non-finite total: {(~masks['xla']).sum()})")

# XLA component split on the mismatch rows
model = sess.model
names = list(sess.params.thawed)


@jax.jit
def comps(th):
    pars = model.params.unpack(th)
    pr = model.params.log_prior(th)
    if hasattr(model.density, "log_prior"):
        pr = pr + model.density.log_prior(pars)
    mono = model._mass_veto_ok(pars, model.sz_data.r_press_kpc)
    from joxsz_tpu.models.xray import xray_log_like
    from joxsz_tpu.models.sz import sz_log_like
    xr = xray_log_like(pars, model.xray_data, model.density,
                       model.temperature, model.Z_name)
    szl = sz_log_like(pars, model.sz_data, model.pressure,
                      model.temperature)
    return pr, mono, xr, szl


for r in rows:
    pr, mono, xr, szl = (np.asarray(v) for v in comps(bj[r]))
    log(f"row {r}: xla={vals['xla'][r]:.4f} packed={vals['packed'][r]:.4f} "
        f"legacy={vals['legacy'][r]:.4f}")
    log(f"  prior={pr:.4f} mass_veto_ok={bool(mono)} xray={xr:.4f} "
        f"sz={szl:.4f}")
    log("  theta: " + ", ".join(f"{n}={batch[r, i]:.6g}"
                                for i, n in enumerate(names)))

np.savez("/tmp/maskrows.npz", rows=rows, theta=batch[rows],
         xla=vals["xla"][rows], packed=vals["packed"][rows],
         legacy=vals["legacy"][rows], names=np.array(names))
print("DONE", flush=True)
