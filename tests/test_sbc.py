"""Simulation-based calibration: statistical ground truth on a conjugate
Gaussian pipeline (calibrated AND a miscalibration detection control),
the uniformity test's edge cases, and (slow) the full joint model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.sbc import (
    run_batched_ensembles, run_sbc, sbc_uniformity,
)


def _conjugate_ranks(fit_sigma_scale=1.0, n_reps=256, seed=0):
    """theta* ~ N(0, s^2 I_2), y ~ N(theta*, t^2 I_2); the ensembles fit
    the posterior with likelihood width ``fit_sigma_scale * t`` — scale 1
    is the calibrated pipeline, anything else a deliberate
    miscalibration the ranks must expose."""
    s, t = 1.3, 0.6
    D, W = 2, 32
    rng = np.random.default_rng(seed)
    thetas = rng.normal(0.0, s, size=(n_reps, D))
    ys = jnp.asarray(thetas + rng.normal(0.0, t, size=thetas.shape))
    tf = fit_sigma_scale * t

    def llcb(x):                       # (C, W, D) -> (C, W)
        pri = -0.5 * jnp.sum(x * x, axis=-1) / s**2
        d = x - ys[:, None, :]
        return pri - 0.5 * jnp.sum(d * d, axis=-1) / tf**2

    p0 = jnp.asarray(thetas[:, None, :]
                     + 0.1 * rng.standard_normal((n_reps, W, D)))
    chain, acc, _ = run_batched_ensembles(llcb, p0, n_burn=400,
                                          n_steps=400,
                                          key=jax.random.PRNGKey(seed + 1),
                                          thin=20)
    draws = chain.transpose(1, 0, 2, 3).reshape(n_reps, -1, D)
    L = draws.shape[1]
    ranks = (draws < thetas[:, None, :]).sum(axis=1)
    return ranks, L, acc


def test_sbc_calibrated_conjugate_pipeline_is_uniform():
    ranks, L, acc = _conjugate_ranks(fit_sigma_scale=1.0)
    assert ranks.min() >= 0 and ranks.max() <= L
    p, counts = sbc_uniformity(ranks, L, n_bins=8)
    # a correct pipeline must not fail the uniformity test
    assert (p > 0.01).all(), p
    assert counts.sum(axis=1).tolist() == [256, 256]
    # acceptance sane for a 2-dim Gaussian
    assert 0.2 < acc.mean() < 0.95


def test_sbc_detects_miscalibrated_posterior():
    """Fitting with a 2.5x-too-narrow likelihood makes the posterior
    overconfident: ranks pile at the extremes (U-shape) and the
    uniformity test must reject decisively."""
    ranks, L, _ = _conjugate_ranks(fit_sigma_scale=0.4, seed=3)
    p, _ = sbc_uniformity(ranks, L, n_bins=8)
    assert (p < 1e-4).all(), p


def test_sbc_uniformity_edge_cases():
    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 101, size=(400, 3))
    p, counts = sbc_uniformity(ranks, 100)
    assert p.shape == (3,) and (p > 1e-3).all()
    with pytest.raises(ValueError, match="n_bins"):
        sbc_uniformity(ranks, 100, n_bins=1)
    # n_bins not dividing L+1: expected counts follow the uneven widths
    p2, c2 = sbc_uniformity(ranks, 100, n_bins=7)
    assert c2.shape == (3, 7) and (p2 > 1e-3).all()


def test_batched_ensembles_validates_schedule():
    def llcb(x):
        return -0.5 * jnp.sum(x * x, axis=-1)

    p0 = jnp.zeros((2, 8, 1))
    with pytest.raises(ValueError, match="multiple"):
        run_batched_ensembles(llcb, p0, 0, 10, jax.random.PRNGKey(0),
                              thin=3)
    with pytest.raises(ValueError, match="n_burn"):
        run_batched_ensembles(llcb, p0, -1, 10, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_run_sbc_joint_model_smoke(ref_data):
    """Wiring check of the full SBC harness on the real joint model with
    a tightened prior (the production-width CL J1226 box priors need
    schedules ~10x longer than a CI budget; prior width does not change
    what the harness validates — the model's own prior is the measure).
    The statistical power lives in the conjugate tests above; here we
    assert the machinery runs the real forward models end to end and
    produces non-degenerate ranks."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    p = sess.params
    tight = {
        "log(n_0)": (-1.55, -1.25), r"\beta": (0.58, 0.72),
        "log(r_c)": (1.85, 2.2), "log(r_s)": (2.2, 3.4),
        r"\epsilon": (0.0, 2.0), "log(T_X/T_{SZ})": (-0.2, 0.3),
        "Z": (0.0, 0.6), "P_0": (0.1, 0.4), "a": (0.8, 5.0),
        "b": (2.0, 4.0), "r_p": (110.0, 350.0),
    }
    for name, (lo, hi) in tight.items():
        p[name].minval, p[name].maxval = lo, hi
    p._refresh()

    res = run_sbc(sess.model, n_reps=12, n_walkers=32, n_burn=800,
                  n_steps=200, thin=20, seed=4, n_bins=3)
    assert res.ranks.shape == (12, p.ndim)
    assert res.n_draws == (200 // 20) * 32
    # non-degenerate: ranks spread over the range for most parameters
    spread = res.ranks.max(axis=0) - res.ranks.min(axis=0)
    assert (spread > res.n_draws * 0.2).sum() >= p.ndim - 2, spread
    assert np.isfinite(res.p_values).all()
    name, worst = res.worst()
    assert worst >= 0.0
