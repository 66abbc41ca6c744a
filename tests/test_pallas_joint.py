"""Full-likelihood Pallas mega-kernel: interpreter-mode parity against the
XLA path on the flagship configuration (values AND veto structure)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core


@pytest.fixture(scope="module")
def sess32(ref_data):
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    return build_session(cfg)


def test_joint_kernel_matches_xla(sess32):
    core = make_joint_core(sess32, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess32.log_like))

    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(0)
    batch = theta0[None] * (1 + 0.03 * rng.standard_normal(
        (16, theta0.size))).astype(np.float32)

    a = np.asarray(core(jnp.asarray(batch, jnp.float32)))
    b = np.asarray(ref(jnp.asarray(batch, jnp.float32)))
    finite = np.isfinite(b)
    # veto structure must agree exactly
    assert np.array_equal(np.isfinite(a), finite), (a, b)
    # finite values agree to f32 roundoff of ~1e4-magnitude sums
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), (
        np.max(np.abs(a[finite] - b[finite])))


def test_joint_kernel_vetoes(sess32):
    core = make_joint_core(sess32, block_b=8, interpret=True)
    p = sess32.params
    theta0 = np.asarray(p.thawed_values(), dtype=np.float32)

    # out-of-box
    bad = theta0.copy()
    bad[p.thawed.index("P_0")] = -1.0
    # r_c > r_s
    bad2 = theta0.copy()
    bad2[p.thawed.index("log(r_c)")] = 3.0
    bad2[p.thawed.index("log(r_s)")] = 2.0
    out = np.asarray(core(jnp.asarray(np.stack([theta0, bad, bad2]),
                                      jnp.float32)))
    assert np.isfinite(out[0])
    assert out[1] == -np.inf and out[2] == -np.inf


def test_joint_kernel_declines_other_configs(ref_data):
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.pressure_model = "knots"
    sess = build_session(cfg)
    assert make_joint_core(sess) is None
