"""HMC correctness: moment recovery on correlated Gaussians, adaptation
sanity, and a run on the real joint posterior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.hmc import run_hmc


def test_correlated_gaussian_moments():
    rng = np.random.default_rng(0)
    D = 5
    A = rng.normal(size=(D, D))
    cov = A @ A.T + D * np.eye(D)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(rng.normal(size=D) * 2)

    def lp(x):
        d = x - mu
        return -0.5 * d @ prec @ d

    C = 32
    p0 = mu + jax.random.normal(jax.random.PRNGKey(1), (C, D),
                                dtype=jnp.float64) * 2.0
    res = run_hmc(lp, p0, n_steps=1500, key=jax.random.PRNGKey(2),
                  n_warmup=400, n_leapfrog=12, thin=2)
    assert res.acceptance_fraction.mean() > 0.5
    flat = res.chain[50:].reshape(-1, D)
    scale = np.sqrt(np.diag(cov))
    assert np.all(np.abs(flat.mean(axis=0) - np.asarray(mu)) < 0.12 * scale)
    est_cov = np.cov(flat.T)
    assert np.allclose(est_cov, cov, rtol=0.2, atol=0.12 * scale.max()**2)


def test_step_size_adaptation():
    """Dual averaging should land near the target acceptance."""
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    p0 = jax.random.normal(jax.random.PRNGKey(3), (16, 4),
                           dtype=jnp.float64)
    res = run_hmc(lp, p0, n_steps=600, key=jax.random.PRNGKey(4),
                  n_warmup=400, n_leapfrog=8, target_accept=0.8)
    assert 0.55 < res.acceptance_fraction.mean() < 0.99
    assert res.step_size > 0


def test_mass_adaptation_helps_badly_scaled_target():
    """On a target with 100x scale differences the windowed mass
    re-estimation must improve over the identity-ish initial mass."""
    scales = jnp.asarray([0.05, 0.5, 5.0, 50.0])

    def lp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    # start cloud with the WRONG scale everywhere
    p0 = jax.random.normal(jax.random.PRNGKey(5), (32, 4),
                           dtype=jnp.float64)
    outs = {}
    for adapt in (False, True):
        res = run_hmc(lp, p0, n_steps=1200, key=jax.random.PRNGKey(6),
                      n_warmup=600, n_leapfrog=16, thin=2,
                      adapt_mass=adapt)
        flat = res.chain[100:].reshape(-1, 4)
        # per-dimension std estimate quality (ratio to truth)
        outs[adapt] = np.abs(np.log(flat.std(axis=0) / np.asarray(scales)))
    # adaptation should reduce the worst-dimension bias substantially
    assert outs[True].max() < outs[False].max() * 0.8, outs


@pytest.mark.slow
def test_hmc_on_joint_posterior(ref_data):
    """HMC must run on the real (vetoed) posterior and agree with the
    stretch sampler on marginal medians."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.sampling.stretch import run_ensemble

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta_c = np.array([centre[n] for n in sess.params.thawed])
    rng = np.random.default_rng(5)
    C = 32
    p0 = jnp.asarray(theta_c[None] * (
        1 + 0.01 * rng.standard_normal((C, theta_c.size))))

    res = run_hmc(sess.log_like, p0, n_steps=800,
                  key=jax.random.PRNGKey(6), n_warmup=400, n_leapfrog=24,
                  thin=2)
    assert res.acceptance_fraction.mean() > 0.2
    hmc_flat = res.chain[100:].reshape(-1, theta_c.size)

    lp_b = jax.jit(jax.vmap(sess.log_like))
    st = run_ensemble(lp_b, jnp.asarray(
        theta_c[None] * (1 + 0.01 * rng.standard_normal((64, theta_c.size)))),
        800, jax.random.PRNGKey(7), thin=800)
    st = run_ensemble(lp_b, st.final_state[0], 2400, jax.random.PRNGKey(8),
                      thin=2)
    st_flat = st.chain.reshape(-1, theta_c.size)

    med_h = np.median(hmc_flat, axis=0)
    med_s = np.median(st_flat, axis=0)
    width = 0.5 * (np.std(hmc_flat, axis=0) + np.std(st_flat, axis=0)) + 1e-12
    assert np.all(np.abs(med_h - med_s) < 1.0 * width), (
        list(zip(sess.params.thawed, (med_h - med_s) / width)))
