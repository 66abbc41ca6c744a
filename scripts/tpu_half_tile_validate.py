"""half_tile (walker-tiled half-substep) hardware validation — the
W=65536 VMEM-wall attempt (VERDICT r3 task 8).

The untiled kernel fails Mosaic compilation at W=65536 because the
full-width (H, Dp) proposal intermediates (xp / y / accept-select, 16.8
MB each at H=32768) plus the (H, Dp)+(H, 1) likelihood scratches exceed
VMEM.  half_tile bounds every proposal intermediate at (half_tile, Dp)
and keeps only the rolled complementary half full-width.  Interpret-mode
bit-exactness vs the untiled kernel is pinned in
tests/test_pallas_joint.py::test_step_kernel_half_tile_matches_untiled;
on hardware the PRNG stream is drawn per tile (different, equally valid
stream), so this script validates statistically, in ONE claim:

  1. W=32768 same-claim A/B tiled vs untiled: per-step cost, acceptance
     fraction (must agree within a few %), and stored-lp-vs-XLA-core
     agreement on the final ensemble (near-peak band rule, see
     CLAUDE.md round-3 facts: band <= ~1.0 on rows within 100 of peak);
  2. W=65536 tiled: compile + sustained rate (the previously-impossible
     point); W=131072 attempted optimistically;
  3. tile-size scan at W=65536 (2048/4096/8192) for the cost knee.

Run: setsid nohup python -u scripts/tpu_half_tile_validate.py \
       > /tmp/htile.log 2>&1 &
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
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel

cfg = JoXSZConfig.cl1226()
cfg.dtype = "float32"
sess = build_session(cfg)
theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
core = make_joint_core(sess, block_b=256)
log(f"backend {jax.default_backend()}; session ready")

rng = np.random.default_rng(0)
out = {"variants": {}}


def init_state(W, spread=0.02):
    x = jnp.asarray((theta0[None] * (1 + spread * rng.standard_normal(
        (W, theta0.size)))).astype(np.float32))
    return x, core(x), jnp.zeros(W, jnp.float32)


def run_variant(name, W, n_inner=100, reps=10, warm_steps=300, **kw):
    """Compile, equilibrate warm_steps, measure reps*n_inner steps.
    Returns (us/step, acc_frac, lp_band) and logs them."""
    x, lp, acc = init_state(W)
    step = make_step_kernel(sess, n_inner=n_inner, n_walkers=W, **kw)
    tc = time.time()
    x, lp, acc = step(x, lp, acc, 1)
    jax.block_until_ready(x)
    log(f"  compile+warm {name}: {time.time()-tc:.1f}s")
    for i in range(warm_steps // n_inner):
        x, lp, acc = step(x, lp, acc, 100 + i)
    jax.block_until_ready(x)
    acc = jnp.zeros(W, jnp.float32)
    t = time.time()
    for i in range(reps):
        x, lp, acc = step(x, lp, acc, 1000 + i)
    jax.block_until_ready(x)
    us = (time.time() - t) / (n_inner * reps) * 1e6
    accf = float(jnp.mean(acc)) / (n_inner * reps)
    # stored-lp vs XLA-core agreement on near-peak rows of the final
    # ensemble (the posterior-row band rule)
    lp_np = np.asarray(lp)
    lp_re = np.asarray(core(x))
    near = lp_np > lp_np.max() - 100.0
    band = float(np.abs(lp_np - lp_re)[near].max()) if near.any() else -1.0
    r = {"W": W, "us_per_step": round(us, 1),
         "evals_per_sec": round(W / us * 1e6 / 1e6, 3),
         "acc_frac": round(accf, 4), "lp_band_near_peak": round(band, 3),
         **{k: v for k, v in kw.items()}}
    out["variants"][name] = r
    log(f"{name}: {us:.1f} us/step ({W/us*1e6/1e6:.2f}M evals/s), "
        f"acc {accf:.3f}, lp band {band:.3f}")
    return r


# ---- phase 1: W=32768 tiled vs untiled (same claim) ------------------------
base = run_variant("w32768_untiled", 32768, half_tile=None)
tile = run_variant("w32768_tiled4096", 32768, half_tile=4096)
agree = (abs(tile["acc_frac"] - base["acc_frac"]) < 0.03
         and tile["lp_band_near_peak"] < 2.0
         and base["lp_band_near_peak"] < 2.0)
out["phase1_pass"] = bool(agree)
print(f"PHASE1 {'PASS' if agree else 'FAIL'} (acc "
      f"{base['acc_frac']:.3f} vs {tile['acc_frac']:.3f})", flush=True)

# ---- phase 2+3: beyond the wall + tile scan ---------------------------------
for W, ht, kw in ((65536, 2048, {}), (65536, 4096, {}), (65536, 8192, {}),
                  (131072, 4096, {"vmem_limit_mb": 120})):
    name = f"w{W}_tiled{ht}"
    try:
        run_variant(name, W, half_tile=ht, **kw)
    except Exception as e:
        out["variants"][name] = {"W": W, "half_tile": ht,
                                 "failed": f"{type(e).__name__}: "
                                           f"{str(e)[:200]}"}
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")

p = pathlib.Path("/root/repo/results/tpu_half_tile.json")
p.write_text(json.dumps(out, indent=2))
log(f"wrote {p}")
print("DONE", flush=True)
