"""Posterior parity: the TPU-resident sampler vs an independent, plain
numpy implementation of the Goodman-Weare stretch move on the REAL joint
CL J1226 posterior (SURVEY.md §7.2's 'CPU emcee + scipy' parity strategy —
emcee is not installed, so the CPU reference is implemented here from the
published algorithm, sharing only the jitted likelihood)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session


def numpy_stretch_sampler(log_prob, p0, n_steps, rng, a=2.0):
    """Reference implementation: sequential half-ensemble stretch moves."""
    x = np.array(p0, dtype=float)
    W, D = x.shape
    H = W // 2
    lp = np.array([log_prob(xi) for xi in x])
    chain = []
    for _ in range(n_steps):
        for (sl_move, sl_fix) in (((0, H), (H, W)), ((H, W), (0, H))):
            mv = slice(*sl_move)
            fx = slice(*sl_fix)
            nm = sl_move[1] - sl_move[0]
            z = (1 / np.sqrt(a) + rng.random(nm)
                 * (np.sqrt(a) - 1 / np.sqrt(a))) ** 2
            partner = rng.integers(0, sl_fix[1] - sl_fix[0], nm)
            xp = x[fx][partner]
            y = xp + z[:, None] * (x[mv] - xp)
            lp_y = np.array([log_prob(yi) for yi in y])
            accept = np.log(rng.random(nm)) < (D - 1) * np.log(z) + lp_y - lp[mv]
            x[mv][accept] = y[accept]
            x[mv] = np.where(accept[:, None], y, x[mv])
            lp[mv] = np.where(accept, lp_y, lp[mv])
        chain.append(x.copy())
    return np.array(chain)


@pytest.mark.slow
def test_joint_posterior_parity(ref_data):
    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    p = sess.params

    ll_single = jax.jit(sess.log_like)
    ll_batch = jax.jit(jax.vmap(sess.log_like))

    def log_prob_np(theta):
        return float(ll_single(jnp.asarray(theta)))

    # common start: tight ball around a plausible point
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta_c = np.array([centre[n] for n in p.thawed])
    rng = np.random.default_rng(0)
    W = 30
    p0 = theta_c[None] * (1 + 0.02 * rng.standard_normal((W, theta_c.size)))
    # ensure all finite
    lp0 = np.asarray(ll_batch(jnp.asarray(p0)))
    assert np.all(np.isfinite(lp0))

    burn, steps = 800, 3200

    # numpy reference chain
    np_chain = numpy_stretch_sampler(log_prob_np, p0, burn + steps,
                                     np.random.default_rng(1))
    np_flat = np_chain[burn:].reshape(-1, theta_c.size)

    # device chain
    from joxsz_tpu.sampling.stretch import run_ensemble
    res = run_ensemble(ll_batch, jnp.asarray(p0), burn,
                       jax.random.PRNGKey(2), thin=burn)
    res = run_ensemble(ll_batch, res.final_state[0], steps,
                       jax.random.PRNGKey(3), thin=1)
    jx_flat = res.chain.reshape(-1, theta_c.size)

    # compare marginal medians and widths within combined MC error;
    # autocorrelation in stretch chains is high, so allow generous but
    # meaningful tolerances relative to the posterior width
    med_np = np.median(np_flat, axis=0)
    med_jx = np.median(jx_flat, axis=0)
    std_np = np.std(np_flat, axis=0)
    std_jx = np.std(jx_flat, axis=0)
    width = 0.5 * (std_np + std_jx) + 1e-12

    # stretch-move chains on a 13-dim correlated posterior have
    # autocorrelation times of O(100) steps; with ~10^5 post-burn samples
    # the median MC error is ~width/sqrt(neff~1e3) ~ 3% of width per chain,
    # but transient burn-in memory inflates that — 0.75*width is a
    # meaningful detection threshold for a *wrong* sampler (a biased move
    # shifts medians by O(width))
    assert np.all(np.abs(med_np - med_jx) < 0.75 * width), (
        list(zip(p.thawed, (med_np - med_jx) / width)))
    ratio = std_jx / std_np
    assert np.all((ratio > 0.5) & (ratio < 2.0)), list(zip(p.thawed, ratio))
