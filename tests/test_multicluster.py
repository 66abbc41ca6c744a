"""Multi-cluster batched likelihood: stacked pytree data + double vmap,
and end-to-end through the mesh-sharded sampler."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.models.multicluster import (
    stack_sz_data, stack_xray_data, make_multicluster_log_like,
)


@pytest.fixture(scope="module")
def sess(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)))


def _perturbed_clusters(sess, n=3):
    """Clones of the bundled cluster with scaled SZ flux / X-ray counts —
    stand-ins for a homogeneous multi-cluster survey batch."""
    rng = np.random.default_rng(0)
    sz_list, xr_list = [], []
    for c in range(n):
        f = 1.0 + 0.1 * c
        # differing per-cluster scalars (integ prior, norm) must also
        # stack — they are data leaves, not static metadata
        sz = dataclasses.replace(sess.model.sz_data,
                                 flux=sess.model.sz_data.flux * f,
                                 integ_mu=1e-3 * f)
        xr = dataclasses.replace(
            sess.model.xray_data,
            counts_filled=sess.model.xray_data.counts_filled * f,
            norm_per_cm3=sess.model.xray_data.norm_per_cm3 * f)
        sz_list.append(sz)
        xr_list.append(xr)
    return sz_list, xr_list


def test_flat_matches_nested(sess):
    """The widened-GEMM flat path must equal the nested-vmap reference."""
    sz_list, xr_list = _perturbed_clusters(sess, 3)
    sz_stack = stack_sz_data(sz_list)
    xr_stack = stack_xray_data(xr_list)
    flat = jax.jit(make_multicluster_log_like(sess.model, sz_stack,
                                              xr_stack, flatten=True))
    nested = jax.jit(make_multicluster_log_like(sess.model, sz_stack,
                                                xr_stack, flatten=False))
    theta0 = sess.params.thawed_values()
    rng = np.random.default_rng(7)
    thetas = jnp.asarray(np.stack([
        theta0[None] * (1 + 0.02 * rng.standard_normal((5, theta0.size)))
        for _ in range(3)]))
    a = np.asarray(flat(thetas))
    b = np.asarray(nested(thetas))
    assert np.allclose(a, b, rtol=1e-10, equal_nan=True), np.abs(a - b).max()


def test_heterogeneous_grids_fall_back_to_nested(sess):
    """The flat widened-GEMM path evaluates all clusters on cluster 0's
    grids; a stack whose radial grids differ (e.g. different redshifts)
    must decline to the nested-vmap path instead of silently targeting
    the wrong posterior (regression)."""
    sz_list, xr_list = _perturbed_clusters(sess, 2)
    # same grid LENGTH, different values — the failure the shape-level
    # checks can't see
    sz_list[1] = dataclasses.replace(
        sz_list[1], r_press_kpc=sz_list[1].r_press_kpc * 1.01)
    sz_stack = stack_sz_data(sz_list)
    xr_stack = stack_xray_data(xr_list)
    with pytest.warns(UserWarning, match="per-cluster radial"):
        fn = make_multicluster_log_like(sess.model, sz_stack, xr_stack,
                                        flatten=True)
    nested = make_multicluster_log_like(sess.model, sz_stack, xr_stack,
                                        flatten=False)
    theta0 = sess.params.thawed_values()
    thetas = jnp.asarray(np.broadcast_to(theta0, (2, 3, theta0.size)))
    np.testing.assert_array_equal(np.asarray(fn(thetas)),
                                  np.asarray(nested(thetas)))


def test_flat_mass_veto_is_family_aware(ref_data):
    """A knots-pressure multicluster fit through the flat path must use
    the knots segment-midpoint mass criterion — the dense-grid gradient
    check rejects nearly every knot vector on interpolant kinks
    (regression: the flat path hardcoded the smooth-family check)."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.pressure_model = "knots"
    ksess = build_session(cfg)
    assert ksess.model.exclude_unphysical_mass
    sz_stack = stack_sz_data([ksess.model.sz_data] * 2)
    xr_stack = stack_xray_data([ksess.model.xray_data] * 2)
    flat = jax.jit(make_multicluster_log_like(ksess.model, sz_stack,
                                              xr_stack, flatten=True))
    theta0 = ksess.params.thawed_values()
    thetas = jnp.asarray(np.broadcast_to(theta0, (2, 2, theta0.size)))
    out = np.asarray(flat(thetas))
    # the default knot vector is physical: must NOT be vetoed, and must
    # match the single-cluster likelihood exactly
    ref = float(ksess.model.log_like(jnp.asarray(theta0)))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, ref, rtol=1e-10)


def test_stacked_matches_per_cluster(sess):
    sz_list, xr_list = _perturbed_clusters(sess, 3)
    sz_stack = stack_sz_data(sz_list)
    xr_stack = stack_xray_data(xr_list)
    batched = jax.jit(make_multicluster_log_like(sess.model, sz_stack,
                                                 xr_stack))

    theta0 = sess.params.thawed_values()
    rng = np.random.default_rng(1)
    W = 4
    thetas = np.stack([
        theta0[None] * (1 + 0.01 * rng.standard_normal((W, theta0.size)))
        for _ in range(3)
    ])
    out = np.asarray(batched(jnp.asarray(thetas)))
    assert out.shape == (3, W)

    # per-cluster reference
    for c in range(3):
        for w in range(W):
            ref = float(sess.model.log_like(
                jnp.asarray(thetas[c, w]), sz_data=sz_list[c],
                xray_data=xr_list[c]))
            assert np.isclose(out[c, w], ref, rtol=1e-12)

    # the flux scaling must actually change the likelihoods across clusters
    assert not np.allclose(out[0], out[1])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_multicluster_sampler_on_mesh(sess):
    from joxsz_tpu.parallel import make_mesh, run_multi_cluster

    sz_list, xr_list = _perturbed_clusters(sess, 2)
    batched = jax.jit(make_multicluster_log_like(
        sess.model, stack_sz_data(sz_list), stack_xray_data(xr_list)))

    mesh = make_mesh(8, axis_names=("cluster", "walker"), shape=(2, 4))
    theta0 = sess.params.thawed_values()
    rng = np.random.default_rng(2)
    C, W = 2, 16
    p0 = theta0[None, None] * (
        1 + 0.01 * rng.standard_normal((C, W, theta0.size)))
    out = run_multi_cluster(batched, p0, n_steps=10,
                            key=jax.random.PRNGKey(0), mesh=mesh)
    assert out["log_prob"].shape == (C, W)
    assert np.all(np.isfinite(out["log_prob"]))


def test_none_stack_with_bound_probe_rejected(sess):
    """r5 review: a None stack for a probe the model has data bound for
    gave two DIFFERENT posteriors depending on `flatten` (nested
    silently reused the single bound dataset per cluster, flat dropped
    the probe) — now an explicit error."""
    sz_list, xr_list = _perturbed_clusters(sess, 2)
    sz_stack = stack_sz_data(sz_list)
    xr_stack = stack_xray_data(xr_list)
    with pytest.raises(ValueError, match="xray_stack is None"):
        make_multicluster_log_like(sess.model, sz_stack, None)
    with pytest.raises(ValueError, match="sz_stack is None"):
        make_multicluster_log_like(sess.model, None, xr_stack)


def test_stack_static_flag_mismatch_rejected(sess):
    """r5 review: mixed static flags used to die inside tree_map with a
    cryptic pytree-structure error naming no field."""
    sz_list, _ = _perturbed_clusters(sess, 2)
    sz_hetero = [sz_list[0],
                 dataclasses.replace(sz_list[1],
                                     calc_integ=not sz_list[1].calc_integ)]
    with pytest.raises(ValueError, match="calc_integ"):
        stack_sz_data(sz_hetero)


def test_masked_annulus_does_not_veto_everything(sess):
    """r5 review: the positivity veto ran over ALL cells, so an annulus
    excluded the standard way (counts masked, exposure 0 -> pred 0 for
    every theta) made the whole likelihood -inf unconditionally.  The
    masked form must return a finite log-like for a valid theta, on
    both the single-cluster and flat multicluster paths."""
    from joxsz_tpu.models.xray import xray_log_like

    theta = jnp.asarray(np.asarray(sess.params.thawed_values()))
    pars = sess.model.params.unpack(theta)

    xr = sess.model.xray_data
    mask = np.asarray(xr.counts_mask).copy()
    exps = np.asarray(xr.exposures).copy()
    mask[:, 4] = 0.0
    exps[:, 4] = 0.0
    xr_masked = dataclasses.replace(
        xr, counts_mask=jnp.asarray(mask), exposures=jnp.asarray(exps))

    ll = xray_log_like(pars, xr_masked, sess.model.density,
                       sess.model.temperature, sess.model.Z_name)
    assert np.isfinite(float(ll)), "masked annulus vetoed every theta"

    # flat multicluster path, same masked dataset per cluster
    sz_list, _ = _perturbed_clusters(sess, 2)
    sz_stack = stack_sz_data(sz_list)
    xr_stack = stack_xray_data([xr_masked, xr_masked])
    ll_fn = make_multicluster_log_like(sess.model, sz_stack, xr_stack)
    thetas = jnp.broadcast_to(theta, (2, 4, theta.size))
    out = np.asarray(ll_fn(thetas))
    assert np.isfinite(out).all(), out
