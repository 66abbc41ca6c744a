"""Calibrate the posterior-parity referee (VERDICT r4 #1).

Measures, on the real CL J1226 joint posterior (CPU backend):
  1. wall cost of the batched-likelihood numpy GW referee,
  2. replicate scatter of per-parameter medians/widths at the chosen
     schedule (the comparison band the test can afford),
  3. the effect size of the deliberately broken stretch move
     (z-exponent (D-1) -> D) on medians and widths — the negative
     control the test must detect.

Writes results/parity_power_calibration.json.  Run once per schedule
change; the test's bands cite the numbers.
"""

import json
import pathlib
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from joxsz_tpu.config import JoXSZConfig  # noqa: E402
from joxsz_tpu.build import build_session  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))


def gw_reference_chain(ll_batch, p0, n_steps, rng, a=2.0, broken=False):
    """Independent numpy GW stretch sampler (batched likelihood)."""
    x = np.array(p0, dtype=float)
    W, D = x.shape
    H = W // 2
    expo = D if broken else D - 1
    lp = np.array(ll_batch(jnp.asarray(x)))
    chain = []
    for _ in range(n_steps):
        for (m0, m1), (f0, f1) in (((0, H), (H, W)), ((H, W), (0, H))):
            mv = slice(m0, m1)
            nm = m1 - m0
            z = (1 / np.sqrt(a) + rng.random(nm)
                 * (np.sqrt(a) - 1 / np.sqrt(a))) ** 2
            partner = rng.integers(0, f1 - f0, nm)
            xp = x[f0:f1][partner]
            y = xp + z[:, None] * (x[mv] - xp)
            lp_y = np.asarray(ll_batch(jnp.asarray(y)))
            accept = (np.log(rng.random(nm))
                      < expo * np.log(z) + lp_y - lp[mv])
            x[mv] = np.where(accept[:, None], y, x[mv])
            lp[mv] = np.where(accept, lp_y, lp[mv])
        chain.append(x.copy())
    return np.array(chain)


def main():
    ref = pathlib.Path("/root/reference/data")
    sess = build_session(JoXSZConfig.cl1226(str(ref)))
    p = sess.params
    ll_batch = jax.jit(jax.vmap(sess.log_like))

    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta_c = np.array([centre[n] for n in p.thawed])
    D = theta_c.size

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    burn = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2500
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    seedbase = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    def init(rng):
        return theta_c[None] * (
            1 + 0.02 * rng.standard_normal((W, D)))

    def summarize(flat):
        return np.median(flat, axis=0), np.std(flat, axis=0)

    out = {"W": W, "burn": burn, "steps": steps, "K": K,
           "params": list(p.thawed)}

    # numpy referee replicates: correct and broken
    for tag, broken in (("np", False), ("np_broken", True)):
        meds, stds, walls = [], [], []
        kk = K
        for r in range(kk):
            rng = np.random.default_rng(
                seedbase + (100 + r if not broken else 900 + r))
            t0 = time.time()
            ch = gw_reference_chain(ll_batch, init(rng), burn + steps,
                                    rng, broken=broken)
            walls.append(time.time() - t0)
            m, s = summarize(ch[burn:].reshape(-1, D))
            meds.append(m)
            stds.append(s)
        out[tag] = {"medians": np.array(meds).tolist(),
                    "stds": np.array(stds).tolist(),
                    "wall_s": walls}
        print(tag, "walls", np.round(walls, 1))

    # device sampler replicates
    from joxsz_tpu.sampling.stretch import run_ensemble
    meds, stds, walls = [], [], []
    for r in range(K):
        rng = np.random.default_rng(seedbase + 500 + r)
        t0 = time.time()
        res = run_ensemble(ll_batch, jnp.asarray(init(rng)), burn,
                           jax.random.PRNGKey(seedbase + 50 + r),
                           thin=burn)
        res = run_ensemble(ll_batch, res.final_state[0], steps,
                           jax.random.PRNGKey(seedbase + 150 + r),
                           thin=1)
        walls.append(time.time() - t0)
        m, s = summarize(res.chain.reshape(-1, D))
        meds.append(m)
        stds.append(s)
    out["jx"] = {"medians": np.array(meds).tolist(),
                 "stds": np.array(stds).tolist(), "wall_s": walls}
    print("jx walls", np.round(walls, 1))

    # effect summary in pooled-width units
    def band(tag_a, tag_b):
        ma = np.array(out[tag_a]["medians"])
        mb = np.array(out[tag_b]["medians"])
        sa = np.array(out[tag_a]["stds"])
        sb = np.array(out[tag_b]["stds"])
        width = 0.5 * (sa.mean(0) + sb.mean(0))
        dmed = (ma.mean(0) - mb.mean(0)) / width
        se = np.sqrt(ma.var(0, ddof=1) / ma.shape[0]
                     + mb.var(0, ddof=1) / mb.shape[0]) / width
        wratio = sa.mean(0) / sb.mean(0)
        return {"dmed_width": dmed.tolist(), "se_width": se.tolist(),
                "width_ratio": wratio.tolist()}

    out["correct_vs_jx"] = band("np", "jx")
    out["broken_vs_jx"] = band("np_broken", "jx")
    print("correct max|dmed|",
          np.max(np.abs(out["correct_vs_jx"]["dmed_width"])))
    print("correct width ratio range",
          np.min(out["correct_vs_jx"]["width_ratio"]),
          np.max(out["correct_vs_jx"]["width_ratio"]))
    print("broken  max|dmed|",
          np.max(np.abs(out["broken_vs_jx"]["dmed_width"])))
    print("broken  width ratio range",
          np.min(out["broken_vs_jx"]["width_ratio"]),
          np.max(out["broken_vs_jx"]["width_ratio"]))

    out["seedbase"] = seedbase
    path = pathlib.Path(
        f"results/parity_power_calibration_s{seedbase}.json")
    path.write_text(json.dumps(out, indent=2))
    print("written", path)


if __name__ == "__main__":
    main()
