"""f64 adjudication of the mass-veto boundary rows dumped by
tpu_finite_mask_probe (/tmp/maskrows.npz).

For each row: the f64 CPU veto margin min(gradient(M)) over the dense
pressure grid, plus the f32 CPU margin, so we can see how close to the
veto surface these converged-chain states actually sit and which f32
evaluation (XLA vmap vs fused kernel) rounded to the true side.

Run: python -u scripts/cpu_finite_mask_adjudicate.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session

d = np.load("/tmp/maskrows.npz")
rows, thetas = d["rows"], d["theta"]

margins = {}
for dtype in ("float64", "float32"):
    cfg = JoXSZConfig.cl1226()
    cfg.dtype = dtype
    sess = build_session(cfg)
    model = sess.model
    r = jnp.asarray(model.sz_data.r_press_kpc,
                    dtype=jnp.float64 if dtype == "float64" else jnp.float32)

    def margin(th):
        pars = model.params.unpack(jnp.asarray(th, dtype=r.dtype))
        m = model.mass(pars, r)
        return jnp.gradient(m).min(), jnp.abs(jnp.gradient(m)).max()

    margins[dtype] = [tuple(float(x) for x in margin(t)) for t in thetas]

for i, row in enumerate(rows):
    m64, g64 = margins["float64"][i]
    m32, g32 = margins["float32"][i]
    verdict = "PASS (monotone)" if m64 > 0 else "VETO (non-monotone)"
    print(f"row {row}: f64 min_grad={m64:.6e} (max|grad|={g64:.3e}) "
          f"-> true {verdict}; f32 cpu min_grad={m32:.6e}")
print("xla_lp:", d["xla"], "\npacked:", d["packed"], "\nlegacy:", d["legacy"])
