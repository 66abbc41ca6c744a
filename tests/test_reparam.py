"""Log-reparametrized sampling: bijection, Jacobian, and distributional
equivalence with direct sampling on an analytic target."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.sampling.reparam import LogReparam
from joxsz_tpu.sampling.stretch import run_ensemble


class _FakeParams:
    def __init__(self, names, lo):
        self.thawed = list(names)
        self.lo = np.asarray(lo, dtype=float)
        self.hi = np.full(len(names), np.inf)


def test_roundtrip_and_jacobian():
    rp = LogReparam(_FakeParams(["s", "x", "t"], [0.0, -5.0, 0.1]),
                    names=("s", "t"))
    theta = jnp.asarray([2.0, -1.3, 0.5])
    u = rp.fwd(theta)
    np.testing.assert_allclose(np.asarray(u),
                               [np.log(2.0), -1.3, np.log(0.5)],
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rp.inv(u)), np.asarray(theta),
                               rtol=1e-12)
    # log|dtheta/du| = sum of masked u
    assert np.isclose(float(rp.log_jacobian(u)),
                      np.log(2.0) + np.log(0.5))
    # batched
    U = jnp.stack([u, u + 0.1])
    assert rp.log_jacobian(U).shape == (2,)


def test_chain_to_theta_matches_inv_and_stays_numpy():
    """chain_to_theta is pure numpy (a big recorded chain must not
    round-trip through the device) and must agree with the device-side
    inverse bijection elementwise — including not overflowing on large
    unmasked coordinates (e.g. r_p ~ 300, where a naive np.exp would
    produce inf before the where discards it)."""
    rp = LogReparam(_FakeParams(["s", "x", "t"], [0.0, -5.0, 0.1]),
                    names=("s", "t"))
    rng = np.random.default_rng(0)
    chain = rng.normal(size=(7, 5, 3))
    chain[..., 1] = 300.0  # unmasked, exp() would overflow f32
    out = rp.chain_to_theta(chain)
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(
        out, np.asarray(rp.inv(jnp.asarray(chain))), rtol=1e-12)
    assert np.isfinite(out).all()


def test_rejects_negative_lower_bound_and_unthawed():
    with pytest.raises(ValueError, match="lower bound"):
        LogReparam(_FakeParams(["a"], [-1.0]), names=("a",))
    with pytest.raises(ValueError, match="thawed"):
        LogReparam(_FakeParams(["a"], [0.0]), names=("zzz",))


def test_reparam_targets_same_posterior():
    """Sampling u = log(theta) with the Jacobian-corrected density must
    reproduce the theta-space posterior.  Target: theta_0 ~ Gamma(3, 1)
    (mean 3, var 3), theta_1 ~ N(0, 1) untransformed."""

    def lp(x):
        ok = x[0] > 0
        lg = jnp.where(ok, (3 - 1) * jnp.log(jnp.where(ok, x[0], 1.0))
                       - x[0], -jnp.inf)
        return lg - 0.5 * x[1] ** 2

    lp_b = jax.jit(jax.vmap(lp))
    rp = LogReparam(_FakeParams(["g", "n"], [0.0, -10.0]), names=("g",))
    lp_u = jax.jit(rp.wrap_log_prob_batch(lp_b))

    W, n_steps, thin = 256, 4000, 4
    rng = np.random.default_rng(0)
    p0_theta = jnp.asarray(np.column_stack([
        rng.gamma(3.0, 1.0, W), rng.standard_normal(W)]))

    direct = run_ensemble(lp_b, p0_theta, n_steps, jax.random.PRNGKey(1),
                          thin=thin)
    rep = run_ensemble(lp_u, rp.fwd(p0_theta), n_steps,
                       jax.random.PRNGKey(2), thin=thin)
    th_direct = np.asarray(direct.chain).reshape(-1, 2)
    th_rep = rp.chain_to_theta(rep.chain).reshape(-1, 2)

    # Gamma(3,1): mean 3, sd sqrt(3); compare the two samplers' marginals
    assert abs(th_rep[:, 0].mean() - 3.0) < 0.15
    assert abs(th_rep[:, 0].std() - np.sqrt(3.0)) < 0.15
    assert abs(th_rep[:, 0].mean() - th_direct[:, 0].mean()) < 0.2
    assert abs(th_rep[:, 1].mean()) < 0.1
    assert abs(th_rep[:, 1].std() - 1.0) < 0.1
    # quantile agreement between the two parametrizations
    for q in (0.1, 0.5, 0.9):
        a = np.quantile(th_rep[:, 0], q)
        b = np.quantile(th_direct[:, 0], q)
        assert abs(a - b) < 0.25, (q, a, b)


def test_wrapped_joint_posterior_finite(ref_data):
    """On the real joint posterior the wrapped density at fwd(MLE-ish
    init) equals lp(theta) + log-Jacobian and is finite."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    rp = LogReparam(sess.params)
    assert set(rp.names) == {"P_0", "a", "b", "r_p"}
    lp_b = jax.jit(jax.vmap(sess.log_like))
    lp_u = jax.jit(rp.wrap_log_prob_batch(lp_b))
    theta0 = jnp.asarray(sess.params.thawed_values())[None]
    u0 = rp.fwd(theta0)
    want = float(lp_b(theta0)[0]) + float(rp.log_jacobian(u0)[0])
    got = float(lp_u(u0)[0])
    assert np.isfinite(got)
    assert np.isclose(got, want, rtol=1e-12)
