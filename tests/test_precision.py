"""Float32 (TPU) vs float64 numerical consistency of the joint likelihood
(SURVEY.md §7.3.3: f32 with unit rescaling must preserve the posterior)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session


@pytest.fixture(scope="module")
def sessions(ref_data):
    cfg64 = JoXSZConfig.cl1226(str(ref_data))
    cfg32 = JoXSZConfig.cl1226(str(ref_data))
    cfg32.dtype = "float32"
    return build_session(cfg64), build_session(cfg32)


def test_f32_loglike_consistency(sessions):
    s64, s32 = sessions
    theta0 = s64.params.thawed_values()
    rng = np.random.default_rng(0)
    batch = theta0[None] * (1 + 0.02 * rng.standard_normal((32, theta0.size)))

    ll64 = np.asarray(jax.jit(jax.vmap(s64.log_like))(jnp.asarray(batch)))
    ll32 = np.asarray(jax.jit(jax.vmap(s32.log_like))(
        jnp.asarray(batch, dtype=jnp.float32)))

    finite = np.isfinite(ll64)
    assert finite.sum() > 20
    # likelihood DIFFERENCES drive MCMC acceptance; absolute offsets are
    # harmless.  Compare pairwise deltas of finite walkers.
    d64 = ll64[finite] - ll64[finite][0]
    d32 = ll32[finite] - ll32[finite][0]
    scale = np.maximum(np.abs(d64), 1.0)
    rel = np.abs(d64 - d32) / scale
    # f32 roundoff through ~1e4-magnitude Cash sums: expect <1e-3 relative
    assert np.max(rel) < 5e-3, rel

    # veto structure must agree exactly
    assert np.array_equal(np.isfinite(ll64), np.isfinite(ll32))


def test_f32_no_spurious_inf(sessions):
    """Plausible parameter regions must not produce f32 overflow -inf."""
    _, s32 = sessions
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta = np.array([centre[n] for n in s32.params.thawed])
    rng = np.random.default_rng(1)
    batch = theta[None] * (1 + 0.05 * rng.standard_normal((256, theta.size)))
    ll = np.asarray(jax.jit(jax.vmap(s32.log_like))(
        jnp.asarray(batch, dtype=jnp.float32)))
    # a few walkers may trip real vetoes; the bulk must be finite
    assert np.isfinite(ll).mean() > 0.5
    assert not np.any(np.isnan(ll))
