"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
walker-sharded ensembles and multi-cluster batched fits (BASELINE configs
#3/#5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.parallel import (
    make_mesh, run_sharded_ensemble, run_multi_cluster,
)


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _gauss_logprob(ndim):
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    return jax.vmap(lp)


@needs_devices
def test_sharded_ensemble_matches_moments():
    mesh = make_mesh(8, axis_names=("walker",))
    lp_b = jax.jit(_gauss_logprob(4))
    W = 64
    p0 = jax.random.normal(jax.random.PRNGKey(0), (W, 4), dtype=jnp.float64)
    out = run_sharded_ensemble(lp_b, p0, 800, jax.random.PRNGKey(1), mesh,
                               thin=4)
    flat = out["chain"].reshape(-1, 4)
    assert 0.1 < out["acceptance_fraction"].mean() < 0.9
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    assert np.allclose(flat.std(axis=0), 1.0, atol=0.15)


@needs_devices
def test_multi_cluster_runs_and_updates():
    mesh = make_mesh(8, axis_names=("cluster", "walker"), shape=(2, 4))
    lp_cb = jax.jit(jax.vmap(_gauss_logprob(3)))
    C, W = 4, 16
    p0 = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (C, W, 3),
                                      dtype=jnp.float64)) * 3.0
    out = run_multi_cluster(lp_cb, p0, n_steps=200,
                            key=jax.random.PRNGKey(3), mesh=mesh)
    assert out["positions"].shape == (C, W, 3)
    # after 200 steps from a wide start the ensemble should have moved and
    # contracted toward the unit Gaussian
    assert out["acceptance_fraction"].mean() > 0.2
    assert out["positions"].std() < 2.0
    assert not np.allclose(out["positions"], p0)


@needs_devices
def test_sharded_equals_unsharded_distribution():
    """Sharding must not change the algorithm: same seed, same init -> the
    sharded run's chain matches the single-device run exactly (the program
    is deterministic and sharding is a layout annotation)."""
    from joxsz_tpu.sampling.stretch import run_ensemble

    lp_b = jax.jit(_gauss_logprob(2))
    W = 32
    p0 = jax.random.normal(jax.random.PRNGKey(5), (W, 2), dtype=jnp.float64)
    mesh = make_mesh(8, axis_names=("walker",))
    sharded = run_sharded_ensemble(lp_b, p0, 50, jax.random.PRNGKey(6),
                                   mesh, thin=5)
    plain = run_ensemble(lp_b, p0, 50, jax.random.PRNGKey(6), thin=5)
    assert np.allclose(sharded["chain"], plain.chain, atol=1e-12)


@needs_devices
def test_kernel_sharded_matches_per_device_runs(ref_data):
    """shard_map'd fused-kernel ensembles (interpret mode) are bit-exact
    with running each device's walker block through the plain step kernel
    sequentially with the same seed — the sharding is pure orchestration,
    zero cross-device coupling."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
    from joxsz_tpu.parallel.kernel_sharded import (
        make_sharded_kernel_step, run_sharded_kernel_ensembles,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)

    n_dev, w_loc = 4, 8
    W = n_dev * w_loc
    mesh = make_mesh(n_dev, axis_names=("walker",))
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess, block_b=8, interpret=True)
    lp0 = core(x0)
    acc0 = jnp.zeros(W, jnp.float32)
    seeds = jnp.arange(100, 100 + n_dev, dtype=jnp.int32)

    sharded = make_sharded_kernel_step(sess, mesh, n_inner=6,
                                       walkers_per_device=w_loc, thin=2,
                                       interpret=True)
    x, lp, acc, chain, chain_lp = sharded(x0, lp0, acc0, seeds)
    assert chain.shape == (3, W, theta0.size)
    assert chain_lp.shape == (3, W)

    # per-device sequential reference with identical seeds
    step = make_step_kernel(sess, n_inner=6, n_walkers=w_loc,
                            interpret=True, thin=2)
    for d in range(n_dev):
        s = slice(d * w_loc, (d + 1) * w_loc)
        xd, lpd, accd, chd, chlpd = step(x0[s], lp0[s], acc0[s],
                                         int(seeds[d]))
        np.testing.assert_array_equal(np.asarray(x[s]), np.asarray(xd))
        np.testing.assert_array_equal(np.asarray(lp[s]), np.asarray(lpd))
        np.testing.assert_array_equal(np.asarray(chain[:, s]),
                                      np.asarray(chd))
        np.testing.assert_array_equal(np.asarray(chain_lp[:, s]),
                                      np.asarray(chlpd))

    # runner wrapper: shapes, acceptance normalisation, lp consistency
    res = run_sharded_kernel_ensembles(sess, x0, n_steps=6,
                                       key=jax.random.PRNGKey(3),
                                       mesh=mesh, thin=2, interpret=True,
                                       core=core, allow_small=True)
    assert res.chain.shape == (3, W, theta0.size)
    lp_re = np.asarray(core(jnp.asarray(res.chain[-1])))
    np.testing.assert_allclose(res.log_prob[-1], lp_re, rtol=2e-5,
                               atol=1e-2)
    assert np.all(res.acceptance_fraction >= 0)
    assert np.all(res.acceptance_fraction <= 1)


@needs_devices
def test_run_fit_routes_mesh_through_sharded_kernel(ref_data, tmp_path):
    """run_fit with mesh + step_sampler sends the sampling phase through
    the per-chip fused-kernel ensembles (prelim/burn stay on the XLA mesh
    sampler) and produces a consistent chain."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.sampling.driver import run_fit
    from joxsz_tpu.sampling.kernel import make_kernel_sampler

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    ks = make_kernel_sampler(sess, interpret=True)
    assert ks is not None
    mesh = make_mesh(2, axis_names=("walker",))
    p = sess.params

    # 28 walkers/device: the smallest per-chip ensemble the
    # statistical guard admits (2*ndim+2 with ndim=13)
    res = run_fit(sess.log_like, np.asarray(p.thawed_values()),
                  np.asarray(p.lo), np.asarray(p.hi), list(p.thawed),
                  nwalkers=56, nburn=4, nsteps=8, nthin=2, seed=0,
                  initspread=0.02, prelim_iterations=2,
                  max_prelim_rounds=1, do_mle=False, mesh=mesh,
                  step_sampler=ks, verbose=False)
    assert res.chain.shape == (4, 56, len(p.thawed))
    # stored lp matches recomputation (kernel-recorded frames)
    lp_re = np.asarray(ks.log_prob_batch(jnp.asarray(res.chain[-1])))
    np.testing.assert_allclose(res.log_prob[-1], lp_re, rtol=2e-5,
                               atol=1e-2)


@needs_devices
def test_run_fit_chunked_checkpointing_honours_mesh(tmp_path, monkeypatch):
    """A mesh run with a chain_path long enough to trigger incremental
    checkpointing must still sample through the mesh path (regression:
    the chunked branch used to shadow the mesh branch and silently
    sample single-device)."""
    from joxsz_tpu.sampling.driver import run_fit
    import joxsz_tpu.parallel.sharded as shd

    calls = {"n": 0}
    real = shd.run_sharded_ensemble

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(shd, "run_sharded_ensemble", spy)

    mu = jnp.asarray(np.linspace(-1, 1, 3))

    def log_like(x):
        return -0.5 * jnp.sum((x - mu) ** 2) * 50.0

    mesh = make_mesh(2, axis_names=("walker",))
    res = run_fit(log_like, np.zeros(3), np.full(3, -10.0),
                  np.full(3, 10.0), ["a", "b", "c"], nwalkers=16,
                  nburn=20, nsteps=200, nthin=2, seed=5,
                  prelim_iterations=10, max_prelim_rounds=1, do_mle=False,
                  checkpoint_every=25, mesh=mesh,
                  chain_path=str(tmp_path / "c.hdf5"),
                  state_path=str(tmp_path / "s.npz"), verbose=False)
    # 200 steps / (25 saved * 2 thin) = 4 sampling chunks, all sharded
    assert calls["n"] == 4
    assert res.chain.shape == (100, 16, 3)
    from joxsz_tpu.io.checkpoint import load_chain_hdf5
    on_disk = load_chain_hdf5(str(tmp_path / "c.hdf5"))
    assert np.array_equal(on_disk["chain"], res.chain)


@needs_devices
def test_tempered_kernel_sharded_matches_per_device(ref_data):
    """shard_map'd tempered kernel ensembles are bit-exact with running
    each device's walker block through the plain tempered kernel with
    the same seed; swap counters sum across devices."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.ops.pallas_joint import (make_joint_core,
                                            make_tempered_step_kernel)
    from joxsz_tpu.parallel.kernel_sharded import (
        run_sharded_tempered_ensembles,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    K, n_dev, w_loc = 3, 2, 8
    W = n_dev * w_loc
    betas = [1.0, 0.6, 0.36]
    mesh = make_mesh(n_dev, axis_names=("walker",))
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(21)
    p0 = theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (K, W, theta0.size))).astype(np.float32)
    core = make_joint_core(sess, block_b=8, interpret=True)

    key = jax.random.PRNGKey(4)
    res = run_sharded_tempered_ensembles(sess, p0, betas, n_steps=4,
                                         key=key, mesh=mesh, thin=2,
                                         interpret=True, core=core,
                                         allow_small=True)
    assert res is not None
    assert res.chain.shape == (2, W, theta0.size)
    assert res.swap_acceptance.shape == (K - 1,)

    # per-device reference with the same seeds (the chunked runner draws
    # a (n_chunks, n_dev) grid; this schedule is a single chunk)
    seeds = np.asarray(jax.random.randint(
        key, (1, n_dev), 0, np.iinfo(np.int32).max, dtype=jnp.int32))[0]
    step = make_tempered_step_kernel(sess, betas, n_inner=4,
                                     n_walkers=w_loc, interpret=True,
                                     thin=2)
    sacc_tot = np.zeros(K - 1)
    for d in range(n_dev):
        s = slice(d * w_loc, (d + 1) * w_loc)
        x0 = jnp.asarray(p0[:, s], jnp.float32)
        lp0 = jnp.stack([core(x0[k]) for k in range(K)])
        xd, lpd, accd, saccd, chd, chlpd = step(
            x0, lp0, jnp.zeros((K, w_loc)), int(seeds[d]))
        np.testing.assert_array_equal(
            np.asarray(res.final_state[0][:, s]), np.asarray(xd))
        np.testing.assert_array_equal(np.asarray(res.chain[:, s]),
                                      np.asarray(chd))
        sacc_tot += np.asarray(saccd)
    np.testing.assert_allclose(res.swap_acceptance,
                               sacc_tot / float(4 * W))


@needs_devices
def test_small_per_device_ensemble_guard(ref_data):
    """Statistical guard on independent per-chip ensembles: the library
    runner hard-errors below 2*ndim+2 walkers per device (unless
    allow_small for plumbing tests), and KernelSampler.run_sharded
    falls back (None + warning) so the driver can route to the XLA
    mesh sampler instead."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.parallel.kernel_sharded import (
        run_sharded_kernel_ensembles,
    )
    from joxsz_tpu.sampling.kernel import make_kernel_sampler

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    mesh = make_mesh(8, axis_names=("walker",))
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    x0 = jnp.asarray(np.tile(theta0, (32, 1)))   # 4 walkers/device

    with pytest.raises(ValueError, match="2\\*ndim\\+2"):
        run_sharded_kernel_ensembles(sess, x0, n_steps=2,
                                     key=jax.random.PRNGKey(0),
                                     mesh=mesh, thin=2, interpret=True)

    ks = make_kernel_sampler(sess, interpret=True)
    with pytest.warns(UserWarning, match="falling back"):
        out = ks.run_sharded(x0, 2, jax.random.PRNGKey(0), mesh, thin=2)
    assert out is None


def test_sharded_multicluster_matches_per_device(ref_data):
    """shard_map'd cluster-grid survey kernel (interpret mode) is
    bit-exact with running each device's cluster block through the
    plain multicluster kernel with the same seed — cluster sharding is
    pure orchestration (independent posteriors, zero coupling), and the
    per-device constants ride in as shard_map operands."""
    import dataclasses
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel
    from joxsz_tpu.parallel.kernel_sharded import (
        make_sharded_multicluster_step,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    sz0 = sess.model.sz_data
    C, W, n_dev = 4, 16, 2
    sz_stack = stack_sz_data([
        dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.04 * c))
        for c in range(C)
    ])
    xr_stack = stack_xray_data([sess.model.xray_data] * C)
    mesh = make_mesh(n_dev, axis_names=("cluster",))

    ll = make_multicluster_log_like(sess.model, sz_stack, xr_stack,
                                    flatten=False)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(17)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (C, W, theta0.size))), jnp.float32)
    lp0 = jnp.asarray(ll(x0), jnp.float32)
    assert np.all(np.isfinite(np.asarray(lp0)))
    acc0 = jnp.zeros((C, W), jnp.float32)
    seeds = jnp.asarray([7, 19], jnp.int32)

    sharded = make_sharded_multicluster_step(
        sess, sz_stack, xr_stack, mesh, n_inner=4, n_walkers=W,
        thin=2, interpret=True)
    x, lp, acc, chain, chain_lp = sharded(x0, lp0, acc0, seeds)
    assert chain.shape == (C, 2, W, theta0.size)

    c_loc = C // n_dev
    for d in range(n_dev):
        s = slice(d * c_loc, (d + 1) * c_loc)
        loc = lambda v: v[s]
        step = make_multicluster_step_kernel(
            sess, jax.tree_util.tree_map(loc, sz_stack),
            jax.tree_util.tree_map(loc, xr_stack),
            n_inner=4, n_walkers=W, thin=2, interpret=True)
        xd, lpd, accd, chd, chlpd = step(x0[s], lp0[s], acc0[s],
                                         seeds[d])
        np.testing.assert_array_equal(np.asarray(x[s]), np.asarray(xd))
        np.testing.assert_array_equal(np.asarray(lp[s]), np.asarray(lpd))
        np.testing.assert_array_equal(np.asarray(acc[s]), np.asarray(accd))
        np.testing.assert_array_equal(np.asarray(chain[s]),
                                      np.asarray(chd))
        np.testing.assert_array_equal(np.asarray(chain_lp[s]),
                                      np.asarray(chlpd))

    with pytest.raises(ValueError, match="divide"):
        make_sharded_multicluster_step(sess, sz_stack, xr_stack,
                                       make_mesh(3, axis_names=("cluster",)),
                                       n_inner=4, n_walkers=W)


def test_coupled_sharded_bitmatches_single_device(ref_data):
    """VERDICT r2 #8: ONE W-total ensemble spanning the mesh on the
    kernel path.  Two-level contract (measured, this is the pin):

    1. ACROSS SHARD COUNTS the coupled sampler is BIT-EXACT — n_dev in
       {1, 2, 4} produce identical chains/log-probs/acceptance, because
       the half-substep kernel draws the full global (H, 4) random
       block addressed by global row and every per-row computation
       (blend, one-hot partner over the full complementary half,
       row-tiled likelihood, accept) is row-independent.  Adding chips
       changes nothing.
    2. VS THE FUSED SINGLE-DEVICE KERNEL (make_step_kernel) the walker
       trajectories are identical over this window and log-probs agree
       to float32 ULPs (measured max rel 5.2e-7).  Exact lp equality is
       NOT a stable property there: the two kernels are different XLA
       programs (one fori_loop mega-kernel vs per-substep calls) and
       the compiler contracts the same likelihood arithmetic into
       different FMA forms.  Positions are pinned exact for this seed —
       the ULP lp wobble flips no accept decision in this window."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel
    from joxsz_tpu.parallel.kernel_sharded import (
        run_coupled_sharded_ensemble,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)

    W, n_steps, thin, seed = 32, 6, 2, 123
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(21)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess, block_b=8, interpret=True)
    lp0 = core(x0)

    # single-device fused reference (packed state, onehot partner)
    step = make_step_kernel(sess, n_inner=n_steps, n_walkers=W,
                            interpret=True, thin=thin, partner="onehot")
    x_r, lp_r, acc_r, ch_r, chlp_r = step(x0, lp0,
                                          jnp.zeros(W, jnp.float32), seed)

    results = {}
    for n_dev in (1, 2, 4):
        mesh = make_mesh(n_dev, axis_names=("walker",))
        res = run_coupled_sharded_ensemble(
            sess, x0, n_steps, seed, mesh, thin=thin, interpret=True)
        assert res is not None
        results[n_dev] = res
        # contract 2: trajectories match the fused kernel; lp to ULPs
        np.testing.assert_array_equal(np.asarray(res.chain),
                                      np.asarray(ch_r))
        np.testing.assert_allclose(np.asarray(res.log_prob),
                                   np.asarray(chlp_r), rtol=2e-6)
        np.testing.assert_array_equal(np.asarray(res.final_state[0]),
                                      np.asarray(x_r))
        np.testing.assert_array_equal(
            res.acceptance_fraction, np.asarray(acc_r) / float(n_steps))
    # contract 1: shard-count invariance is BIT-exact, lp included
    r1 = results[1]
    for n_dev in (2, 4):
        r = results[n_dev]
        np.testing.assert_array_equal(np.asarray(r.chain),
                                      np.asarray(r1.chain))
        np.testing.assert_array_equal(np.asarray(r.log_prob),
                                      np.asarray(r1.log_prob))
        np.testing.assert_array_equal(r.acceptance_fraction,
                                      r1.acceptance_fraction)


def test_coupled_sharded_validations(ref_data):
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.parallel.kernel_sharded import (
        run_coupled_sharded_ensemble,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)
    mesh = make_mesh(4, axis_names=("walker",))
    with pytest.raises(ValueError, match="divide"):
        run_coupled_sharded_ensemble(sess, np.zeros((10, D)), 4, 0,
                                     mesh, thin=2, interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        run_coupled_sharded_ensemble(sess, np.zeros((16, D)), 5, 0,
                                     mesh, thin=2, interpret=True)


def test_hybrid_coupled_mechanics(ref_data):
    """VERDICT r3 #4: the amortized hybrid sampler — chip-local fused
    windows + one globally coupled step per window.  Mechanics contract:
    runs on a multi-device mesh, chain shapes follow the window-only
    recording rule, log-probs are finite and consistent with re-eval,
    walkers move, and acceptance counts include the coupled steps."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.ops.pallas_joint import make_joint_core
    from joxsz_tpu.parallel.kernel_sharded import (
        run_hybrid_coupled_ensemble,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)

    W, n_windows, sync_every, thin = 32, 3, 5, 2
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(33)
    x0 = theta0[None] * (1 + 0.02 * rng.standard_normal((W, D)))

    mesh = make_mesh(4, axis_names=("walker",))
    res = run_hybrid_coupled_ensemble(
        sess, x0.astype(np.float32), n_windows, sync_every, 7, mesh,
        thin=thin, interpret=True, allow_small=True)
    assert res is not None
    n_keep = n_windows * (sync_every - 1) // thin
    assert res.chain.shape == (n_keep, W, D)
    assert res.log_prob.shape == (n_keep, W)
    # the window-only recording rule is DECLARED on the result: frames
    # span n_windows*sync_every steps in n_keep frames, i.e. spacing
    # thin*sync_every/(sync_every-1) — downstream tau/length arithmetic
    # reads this instead of assuming thin (VERDICT r4 #5)
    assert res.frame_spacing == pytest.approx(
        thin * sync_every / (sync_every - 1))
    assert res.frame_spacing * n_keep == pytest.approx(
        n_windows * sync_every)
    assert np.all(np.isfinite(res.log_prob))
    # recorded lp matches a re-evaluation of the recorded positions
    core = make_joint_core(sess, block_b=8, interpret=True)
    lp_re = np.asarray(core(jnp.asarray(res.chain[-1], jnp.float32)))
    np.testing.assert_allclose(res.log_prob[-1], lp_re, rtol=2e-5,
                               atol=1e-3)
    # the ensemble actually moved and accepted swaps
    assert np.any(res.chain[0] != res.chain[-1])
    assert res.acceptance_fraction.mean() > 0.05
    # final state is consistent
    xf, lpf, _ = res.final_state
    lp_fin = np.asarray(core(jnp.asarray(np.asarray(xf), jnp.float32)))
    np.testing.assert_allclose(np.asarray(lpf), lp_fin, rtol=2e-5,
                               atol=1e-3)


def test_hybrid_coupled_validations(ref_data):
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.parallel.kernel_sharded import (
        run_hybrid_coupled_ensemble,
    )

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)
    mesh = make_mesh(4, axis_names=("walker",))
    with pytest.raises(ValueError, match="sync_every"):
        run_hybrid_coupled_ensemble(sess, np.zeros((32, D)), 2, 1, 0,
                                    mesh, interpret=True)
    with pytest.raises(ValueError, match="even per-device"):
        run_hybrid_coupled_ensemble(sess, np.zeros((20, D)), 2, 5, 0,
                                    mesh, interpret=True)
    with pytest.raises(ValueError, match="multiple"):
        run_hybrid_coupled_ensemble(sess, np.zeros((32, D)), 2, 6, 0,
                                    mesh, thin=2, interpret=True,
                                    allow_small=True)
    # the per-device walker floor guards this runner like every other
    # sharded runner (r4 self-review #2): 8 walkers/chip at ndim=13 is
    # below 2*ndim+2 and must hard-error unless explicitly allowed
    with pytest.raises(ValueError, match="walkers per device"):
        run_hybrid_coupled_ensemble(sess, np.zeros((32, D)), 2, 5, 0,
                                    mesh, interpret=True)


def test_driver_cache_identity_guard():
    """The driver caches key on id(sess); a dead session's id can be
    REUSED by a new object, so a hit must be honoured only when the
    stored session IS the caller's (kernel_sharded._cache_get).  Also
    pins LRU move-to-front and max-size eviction."""
    from collections import OrderedDict

    from joxsz_tpu.parallel.kernel_sharded import _cache_get, _cache_put

    cache = OrderedDict()
    s1, s2 = object(), object()
    _cache_put(cache, 2, "k1", s1, "drv1")
    assert _cache_get(cache, "k1", s1) == ("drv1",)
    # same key, DIFFERENT session object (id-reuse impostor): miss
    assert _cache_get(cache, "k1", s2) is None
    # multi-value entries come back as the stored tuple tail
    _cache_put(cache, 2, "k2", s2, "a", "b", "c")
    assert _cache_get(cache, "k2", s2) == ("a", "b", "c")
    # k1 was touched most recently via the hit above -> k2 is older?
    # no: the k2 put moved it to the end; a k1 hit refreshes k1, so a
    # third insert evicts k2
    assert _cache_get(cache, "k1", s1) == ("drv1",)
    _cache_put(cache, 2, "k3", s1, "drv3")
    assert "k2" not in cache and "k1" in cache and "k3" in cache
    # overwriting an existing key (id-reuse rebuild) refreshes its LRU
    # position: k1 is oldest; rewriting it must make k3 the eviction
    # candidate instead of the just-rebuilt k1
    _cache_put(cache, 2, "k1", s2, "drv1b")
    _cache_put(cache, 2, "k4", s1, "drv4")
    assert "k3" not in cache and _cache_get(cache, "k1", s2) == ("drv1b",)


@needs_devices
def test_run_sharded_routes_small_ensembles_to_hybrid(ref_data,
                                                      monkeypatch,
                                                      capsys):
    """KernelSampler.run_sharded routing: below 64 walkers/device the
    run goes to the hybrid coupled sampler (mixing validated at 32
    walkers/chip, docs/PERFORMANCE.md A.11) with sync_every ≡ 1 (mod
    thin) near the validated sync_every=100 operating point; at >= 64 it
    keeps the independent per-chip ensembles; short runs that cannot
    amortise whole windows keep the independent path; below the 2*ndim+2
    statistical floor the kernel path declines entirely (XLA mesh
    fallback)."""
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.build import build_session
    from joxsz_tpu.parallel import kernel_sharded
    from joxsz_tpu.sampling.kernel import KernelSampler

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    D = len(sess.params.thawed)
    assert D == 13          # floor 2*D+2 = 28 < 32 < 64 below

    calls = {}

    def fake_hybrid(s, p0, n_windows, sync_every, seed, mesh, **kw):
        calls["hybrid"] = (p0.shape, n_windows, sync_every, seed, kw)
        return "HYBRID"

    def fake_indep(s, p0, n_steps, key, mesh, **kw):
        calls["indep"] = (p0.shape, n_steps)
        return "INDEP"

    monkeypatch.setattr(kernel_sharded, "run_hybrid_coupled_ensemble",
                        fake_hybrid)
    monkeypatch.setattr(kernel_sharded, "run_sharded_kernel_ensembles",
                        fake_indep)

    sampler = KernelSampler(sess, core=None, dp=128)
    mesh = make_mesh(4, axis_names=("walker",))
    key = jax.random.PRNGKey(3)

    # 32 walkers/device, long run -> hybrid; sync_every = 25*4+1
    p0 = np.zeros((128, D), np.float32)
    assert sampler.run_sharded(p0, 8000, key, mesh, thin=25) == "HYBRID"
    shape, n_windows, sync_every, seed, kw = calls.pop("hybrid")
    assert shape == (128, D)
    assert sync_every == 101 and (sync_every - 1) % 25 == 0
    assert n_windows == round(8000 / 101)
    assert isinstance(seed, int) and kw["thin"] == 25
    assert kw["allow_small"] is True

    # thin=1 -> the validated sync_every=100 point exactly
    assert sampler.run_sharded(p0, 2000, key, mesh, thin=1) == "HYBRID"
    _, n_windows, sync_every, _, _ = calls.pop("hybrid")
    assert sync_every == 100 and n_windows == 20

    # the routing decision is STICKY: a short remainder chunk of the
    # same (W, n_dev, thin) run stays on the hybrid law instead of
    # silently switching samplers mid-chain
    assert sampler.run_sharded(p0, 200, key, mesh, thin=25) == "HYBRID"
    _, n_windows, sync_every, _, _ = calls.pop("hybrid")
    assert sync_every == 101 and n_windows == 2   # round(200/101)

    # >= 64 walkers/device -> independent per-chip ensembles
    p_big = np.zeros((256, D), np.float32)
    assert sampler.run_sharded(p_big, 8000, key, mesh, thin=25) == "INDEP"
    calls.pop("indep")

    # a FIRST call too short to amortise windows -> independent path,
    # and that decision is sticky too (a later long chunk stays put)
    fresh = KernelSampler(sess, core=None, dp=128)
    assert fresh.run_sharded(p0, 200, key, mesh, thin=25) == "INDEP"
    calls.pop("indep")
    assert fresh.run_sharded(p0, 8000, key, mesh, thin=25) == "INDEP"
    calls.pop("indep")
    assert "hybrid" not in calls

    # ... but the stickiness is scoped to one LOGICAL RUN: new_run()
    # (called by run_fit at fit start) resets it, so a reused sampler
    # does not inherit a previous fit's short-first-chunk decision
    fresh.new_run()
    assert fresh.run_sharded(p0, 8000, key, mesh, thin=25) == "HYBRID"
    calls.pop("hybrid")

    # the routing note is gated on verbose (default silent — JSON
    # consumers of run_fit must not get stray stdout); verbose=True
    # prints it once
    capsys.readouterr()
    fresh.new_run()
    assert fresh.run_sharded(p0, 8000, key, mesh, thin=25) == "HYBRID"
    calls.pop("hybrid")
    assert "hybrid coupled sampler" not in capsys.readouterr().out
    fresh.new_run()
    assert fresh.run_sharded(p0, 8000, key, mesh, thin=25,
                             verbose=True) == "HYBRID"
    calls.pop("hybrid")
    assert "hybrid coupled sampler" in capsys.readouterr().out

    # below the statistical floor -> decline the kernel path entirely
    p_tiny = np.zeros((64, D), np.float32)   # 16/device < 28
    with pytest.warns(UserWarning, match="below 2\\*ndim\\+2"):
        assert sampler.run_sharded(p_tiny, 8000, key, mesh,
                                   thin=25) is None
