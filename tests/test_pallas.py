"""Pallas SZ-core kernel: interpreter-mode parity against the jnp path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_kernels import make_sz_core
from joxsz_tpu.io.readers import read_conversion_table, read_xy


@pytest.fixture(scope="module")
def setup(ref_data):
    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    conv = read_conversion_table(str(ref_data / "SZ/Compton_to_Jy_per_beam.dat"))
    flux = read_xy(str(ref_data / "SZ/press_data_cl1226_flagsource_Xraycent.dat"), 3)
    return sess, conv, flux


def _inputs(sess, B, rng):
    geom = sess.geometry
    r = geom.r_press_kpc
    x = r / 300.0
    pp0 = 0.18 / (x**0.014 * (1 + x**5.0) ** (2.2 / 5.0))
    pp = pp0[None] * (1 + 0.05 * rng.standard_normal((B, r.size)))
    t_all = 8.0 * (1 + 0.1 * rng.standard_normal((B, geom.sep + 1)))
    cal = 1.0 + 0.05 * rng.standard_normal(B)
    return pp, t_all, cal


def test_jnp_core_matches_model(setup):
    """The jnp core must equal the production sz_log_like given the same
    intermediates."""
    sess, conv, flux = setup
    rng = np.random.default_rng(0)
    pp, t_all, cal = _inputs(sess, 4, rng)

    core = make_sz_core(sess.sz_operator, conv, flux[1], flux[2],
                        dtype=jnp.float64, use_pallas=False)
    ll = np.asarray(core(jnp.asarray(pp), jnp.asarray(t_all),
                         jnp.asarray(cal)))

    # production path, one walker at a time
    from joxsz_tpu.ops.splines import lerp_lookup
    sz = sess.model.sz_data
    for b in range(4):
        raw = np.asarray(sz.L) @ pp[b]
        conv_v = np.asarray(lerp_lookup(sz.conv_T, sz.conv_val,
                                        jnp.asarray(t_all[b])))
        prof = raw * conv_v * cal[b]
        model = np.asarray(sz.G) @ prof
        expected = -0.5 * np.sum(
            ((np.asarray(sz.flux) - model) / np.asarray(sz.flux_err)) ** 2)
        assert np.isclose(ll[b], expected, rtol=1e-10)


def test_pallas_interpret_matches_jnp(setup):
    sess, conv, flux = setup
    rng = np.random.default_rng(1)
    B = 8
    pp, t_all, cal = _inputs(sess, B, rng)

    jnp_core = make_sz_core(sess.sz_operator, conv, flux[1], flux[2],
                            dtype=jnp.float32, use_pallas=False)
    pl_core = make_sz_core(sess.sz_operator, conv, flux[1], flux[2],
                           dtype=jnp.float32, use_pallas=True,
                           interpret=True, block_b=8)

    a = np.asarray(jnp_core(jnp.asarray(pp, jnp.float32),
                            jnp.asarray(t_all, jnp.float32),
                            jnp.asarray(cal, jnp.float32)))
    b = np.asarray(pl_core(jnp.asarray(pp, jnp.float32),
                           jnp.asarray(t_all, jnp.float32),
                           jnp.asarray(cal, jnp.float32)))
    assert np.allclose(a, b, rtol=2e-5, atol=1e-3)


def test_pallas_padding_safe(setup):
    """Batch sizes that are not a multiple of the block still work."""
    sess, conv, flux = setup
    rng = np.random.default_rng(2)
    pp, t_all, cal = _inputs(sess, 5, rng)
    pl_core = make_sz_core(sess.sz_operator, conv, flux[1], flux[2],
                           dtype=jnp.float32, use_pallas=True,
                           interpret=True, block_b=8)
    jnp_core = make_sz_core(sess.sz_operator, conv, flux[1], flux[2],
                            dtype=jnp.float32, use_pallas=False)
    a = np.asarray(pl_core(jnp.asarray(pp, jnp.float32),
                           jnp.asarray(t_all, jnp.float32),
                           jnp.asarray(cal, jnp.float32)))
    b = np.asarray(jnp_core(jnp.asarray(pp, jnp.float32),
                            jnp.asarray(t_all, jnp.float32),
                            jnp.asarray(cal, jnp.float32)))
    assert a.shape == (5,)
    assert np.allclose(a, b, rtol=2e-5, atol=1e-3)
