"""Full-likelihood Pallas mega-kernel: interpreter-mode parity against the
XLA path on the flagship configuration (values AND veto structure)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session
from joxsz_tpu.ops.pallas_joint import make_joint_core, make_step_kernel


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


def test_joint_kernel_integrated_y(ref_data):
    """calc_integ configs are no longer declined: the kernel's
    integrated-Y Gaussian term (zero-weight no-op otherwise) matches the
    XLA likelihood, and differs from the no-integ likelihood."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.sz.calc_integ = True
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(12)
    batch = jnp.asarray(theta0[None] * (1 + 0.03 * rng.standard_normal(
        (8, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert np.array_equal(np.isfinite(a), finite)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5)

    # the term contributes exactly -0.5*((Y - mu)/sigma)^2 vs the
    # no-integ session
    from joxsz_tpu.models.sz import sz_integrated_y

    cfg2 = JoXSZConfig.cl1226(str(ref_data))
    cfg2.dtype = "float32"
    sess2 = build_session(cfg2)
    core2 = make_joint_core(sess2, block_b=8, interpret=True)
    c = np.asarray(core2(batch))
    szd = sess.model.sz_data
    cint = np.asarray(jax.vmap(
        lambda th: sz_integrated_y(sess.params.unpack(th), szd,
                                   sess.model.pressure))(batch))
    pen = -0.5 * ((cint - szd.integ_mu) / szd.integ_sig) ** 2
    np.testing.assert_allclose(a[finite] - c[finite], pen[finite],
                               rtol=1e-3, atol=5e-3)
    assert np.any(np.abs(pen[finite]) > 1e-3)   # non-trivial somewhere


def test_step_kernel_mechanics(sess32):
    """Interpreter-mode mechanics of the fused step-loop kernel: stored
    log-probs match recomputation, walkers stay in-box, acceptance counts
    are sane.  (Posterior correctness is validated on hardware —
    scripts/tpu_step_kernel_bench.py — since the interpret fallback PRNG
    is a plain hash.)"""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)
    assert np.all(np.isfinite(np.asarray(lp0)))

    step = make_step_kernel(sess32, n_inner=6, n_walkers=W, interpret=True)
    x, lp, acc = step(x0, lp0, jnp.zeros(W), 3)
    lp_re = core(x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_re),
                               rtol=2e-5, atol=1e-2)
    assert np.all(np.asarray(acc) >= 0) and np.all(np.asarray(acc) <= 6)


def test_step_kernel_chain_recording(sess32):
    """The thin-recording variant returns snapshots whose last frame is
    the final state and whose log-probs match recomputation."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    step = make_step_kernel(sess32, n_inner=6, n_walkers=W, interpret=True,
                            thin=2)
    x, lp, acc, chain, chain_lp = step(x0, lp0, jnp.zeros(W), 7)
    assert chain.shape == (3, W, theta0.size)
    assert chain_lp.shape == (3, W)
    np.testing.assert_array_equal(np.asarray(chain[-1]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(chain_lp[-1]), np.asarray(lp))
    for k in range(3):
        lp_re = core(jnp.asarray(chain[k]))
        np.testing.assert_allclose(np.asarray(chain_lp[k]),
                                   np.asarray(lp_re), rtol=2e-5, atol=1e-2)


def test_step_kernel_roll_partner_mechanics(sess32):
    """partner='roll' (rotation partner selection): stored log-probs
    match recomputation, acceptance counts sane, and the ensemble
    actually moves (the rotation must not freeze the move)."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    step = make_step_kernel(sess32, n_inner=8, n_walkers=W,
                            interpret=True, partner="roll")
    x, lp, acc = step(x0, lp0, jnp.zeros(W), 13)
    lp_re = core(x)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_re),
                               rtol=2e-5, atol=1e-2)
    assert np.sum(np.asarray(acc)) > 0          # some moves accepted
    assert not np.array_equal(np.asarray(x), np.asarray(x0))
    assert np.all(np.asarray(acc) <= 8)


def test_step_kernel_ll_loop_matches_unrolled(sess32):
    """The fori_loop-over-scratch likelihood tiling (used when H divides
    into ll_tile blocks, the compile-time fix for large W) is
    bit-identical to the single-call/unrolled evaluation — per-row
    independence makes any tiling exact."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    outs = {}
    for tile in (256, 4):    # 256: single call; 4: loop path (H=8)
        step = make_step_kernel(sess32, n_inner=6, n_walkers=W,
                                interpret=True, thin=2, ll_tile=tile)
        outs[tile] = step(x0, lp0, jnp.zeros(W), 21)
    for a, b in zip(outs[256], outs[4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_kernel_hbm_chain_matches_vmem(sess32):
    """chain_space='hbm' (per-frame DMA out of VMEM, the default) must be
    bit-identical to the original VMEM-output chain path: same seed, same
    deterministic stream, so every output — final state, acceptance,
    chain, chain log-probs — matches exactly."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    outs = {}
    for space in ("vmem", "hbm"):
        step = make_step_kernel(sess32, n_inner=6, n_walkers=W,
                                interpret=True, thin=2, chain_space=space)
        outs[space] = step(x0, lp0, jnp.zeros(W), 11)
    for a, b in zip(outs["vmem"], outs["hbm"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_kernel_packed_state_matches_unpacked(sess32):
    """packed_state=True (lp/acc in two padding lanes of the position
    buffer, lp chain folded into the recorded frames — the layout that
    collapses six lane-padded VMEM buffers into two and unlocks
    W >= 32768) must be bit-identical to the original separate-buffer
    layout on every output, in both chain spaces and without a chain."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    for kw in ({"thin": None}, {"thin": 2, "chain_space": "hbm"},
               {"thin": 2, "chain_space": "vmem"}):
        outs = {}
        for packed in (False, True):
            step = make_step_kernel(sess32, n_inner=6, n_walkers=W,
                                    interpret=True, packed_state=packed,
                                    **kw)
            outs[packed] = step(x0, lp0, jnp.zeros(W), 11)
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_kernel_half_tile_matches_untiled(sess32):
    """half_tile (walker-tiled half-substep, the W=65536 VMEM fix) must
    be bit-identical to the untiled kernel in interpret mode: moving
    rows are independent, and the interpret hash PRNG takes a global
    row offset so the tiled stream reproduces the untiled one exactly.
    Covers both partner laws, packed/unpacked, chain recording, and
    both the TR==ll_tile (direct) and TR>ll_tile (nested loop) paths."""
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = core(x0)

    for kw in ({"partner": "roll", "thin": 2, "packed_state": True,
                "ll_tile": 4},                    # TR == ll_tile
               {"partner": "roll", "thin": None, "packed_state": False,
                "ll_tile": 2},                    # TR > ll_tile (nested)
               {"partner": "onehot", "thin": 2, "packed_state": True,
                "ll_tile": 2}):
        outs = {}
        for ht in (None, 4):
            step = make_step_kernel(sess32, n_inner=6, n_walkers=W,
                                    interpret=True, half_tile=ht, **kw)
            outs[ht] = step(x0, lp0, jnp.zeros(W), 17)
        for a, b in zip(outs[None], outs[4]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_joint_kernel_declines_other_configs(ref_data):
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    sess.params.thaw(r"\alpha")     # layout outside every kernel family
    assert make_joint_core(sess) is None


def test_sz_only_kernel_family(ref_data):
    """SZ-only sessions (config #1, the preprofit path) get kernel
    coverage: the X-ray constants and section drop out entirely, and the
    core matches the XLA SZ-only likelihood."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg, sz_only=True)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(17)
    batch = jnp.asarray(theta0[None] * (1 + 0.03 * rng.standard_normal(
        (16, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert finite.any()
    assert np.array_equal(np.isfinite(a), finite), (a, b)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), (
        np.max(np.abs(a[finite] - b[finite])))

    # step kernel runs and stays self-consistent
    lp0 = core(batch)
    step = make_step_kernel(sess, n_inner=4, n_walkers=16,
                            interpret=True, thin=2)
    x, lp, acc, chain, chain_lp = step(batch, lp0, jnp.zeros(16), 29)
    lp_re = core(x)
    fin = np.isfinite(np.asarray(lp))
    np.testing.assert_allclose(np.asarray(lp)[fin],
                               np.asarray(lp_re)[fin], rtol=2e-5,
                               atol=1e-2)


def test_joint_kernel_double_beta_density(ref_data):
    """The double-beta density mode (reference mydens mode='double') gets
    kernel coverage: agreement with the XLA path on values and veto
    structure."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.density_mode = "double"
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    # the default double-mode init is mass-vetoed (the added core
    # component flattens the density the veto leans on); use a small
    # second component so finite points exist in the batch
    theta0[sess.params.thawed.index("log(n_{02})")] = -5.0
    rng = np.random.default_rng(16)
    batch = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (16, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert finite.any()
    assert np.array_equal(np.isfinite(a), finite), (a, b)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), (
        np.max(np.abs(a[finite] - b[finite])))
    # the second component really contributes: boosting it on a finite
    # batch point changes the log-likelihood
    i_fin = int(np.flatnonzero(finite)[0])
    th2 = np.asarray(batch[i_fin]).copy()
    th2[sess.params.thawed.index("log(n_{02})")] = -2.5
    c2 = float(core(jnp.asarray(th2[None], jnp.float32))[0])
    assert abs(c2 - a[i_fin]) > 1.0 or c2 == -np.inf


def test_joint_kernel_knots_family(ref_data):
    """The knot-pressure layout (config #4) gets its own kernel family:
    agreement with the XLA path on values AND veto structure."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.pressure_model = "knots"
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(13)
    batch = jnp.asarray(theta0[None] * (1 + 0.03 * rng.standard_normal(
        (16, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert finite.any()
    assert np.array_equal(np.isfinite(a), finite), (a, b)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), (
        np.max(np.abs(a[finite] - b[finite])))

    # step kernel runs and stays self-consistent on the knots family
    x0 = batch
    lp0 = core(x0)
    step = make_step_kernel(sess, n_inner=4, n_walkers=16, interpret=True,
                            thin=2)
    x, lp, acc, chain, chain_lp = step(x0, lp0, jnp.zeros(16), 23)
    lp_re = core(x)
    fin = np.isfinite(np.asarray(lp))
    np.testing.assert_allclose(np.asarray(lp)[fin],
                               np.asarray(lp_re)[fin], rtol=2e-5,
                               atol=1e-2)


@pytest.mark.parametrize("pm", ["gnfw", "knots"])
def test_joint_kernel_parametric_temperature(ref_data, pm):
    """The parametric Vikhlinin-T layouts (config #4's second axis, with
    either pressure family) get kernel coverage: agreement with the XLA
    path on values and veto structure."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.temperature_model = "vikhlinin"
    cfg.pressure_model = pm
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(15)
    batch = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (16, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert finite.any()
    assert np.array_equal(np.isfinite(a), finite), (a, b)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5), (
        np.max(np.abs(a[finite] - b[finite])))


def test_joint_kernel_mass_veto_gate(ref_data):
    """exclude_unphysical_mass=False configs drop the in-kernel mass
    veto, matching the XLA path (previously the kernel baked it in
    unconditionally)."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.exclude_unphysical_mass = False
    sess = build_session(cfg)
    core = make_joint_core(sess, block_b=8, interpret=True)
    assert core is not None
    ref = jax.jit(jax.vmap(sess.log_like))

    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(14)
    batch = jnp.asarray(theta0[None] * (1 + 0.05 * rng.standard_normal(
        (16, theta0.size))), jnp.float32)
    a = np.asarray(core(batch))
    b = np.asarray(ref(batch))
    finite = np.isfinite(b)
    assert np.array_equal(np.isfinite(a), finite)
    assert np.allclose(a[finite], b[finite], rtol=2e-4, atol=0.5)


def test_kernel_sampler_mechanics(sess32):
    """KernelSampler chunking/accounting in interpret mode: chain shapes,
    final-state consistency, acceptance normalisation."""
    from joxsz_tpu.sampling.kernel import make_kernel_sampler
    import joxsz_tpu.sampling.kernel as kmod

    ks = make_kernel_sampler(sess32, interpret=True)
    assert ks is not None
    W = 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)

    # force multi-chunk scheduling to exercise the remainder kernel
    old = kmod._CHAIN_VMEM_BYTES
    kmod._CHAIN_VMEM_BYTES = W * (128 + 1) * 4 * 3   # max_keep = 3
    try:
        res = ks.run(p0, 8 * 2, jax.random.PRNGKey(0), thin=2)
    finally:
        kmod._CHAIN_VMEM_BYTES = old
    assert res.chain.shape == (8, W, theta0.size)
    assert res.log_prob.shape == (8, W)
    np.testing.assert_array_equal(res.chain[-1],
                                  np.asarray(res.final_state[0]))
    assert np.all(res.acceptance_fraction >= 0)
    assert np.all(res.acceptance_fraction <= 1)
    # stored log-probs match recomputation on every frame
    for k in range(8):
        lp_re = ks.log_prob_batch(jnp.asarray(res.chain[k]))
        np.testing.assert_allclose(res.log_prob[k], np.asarray(lp_re),
                                   rtol=2e-5, atol=1e-2)

    # no-chain phase path
    res2 = ks.run(p0, 10, jax.random.PRNGKey(1), store_chain=False)
    assert res2.chain.shape[0] == 0
    assert np.asarray(res2.final_state[0]).shape == (W, theta0.size)


def test_multicluster_step_kernel(sess32):
    """Cluster-grid step kernel (interpret mode): per-cluster log-probs
    match the reference nested-vmap multicluster likelihood; chain
    recording works per cluster; clusters evolve independently."""
    import dataclasses
    from joxsz_tpu.models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    sz0 = sess32.model.sz_data
    C, W = 2, 16
    sz_stack = stack_sz_data([
        dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.05 * c))
        for c in range(C)
    ])
    xr_stack = stack_xray_data([sess32.model.xray_data] * C)
    ref_ll = make_multicluster_log_like(sess32.model, sz_stack, xr_stack,
                                        flatten=False)

    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (C, W, theta0.size))), jnp.float32)
    lp0 = jnp.asarray(ref_ll(x0), jnp.float32)
    assert np.all(np.isfinite(np.asarray(lp0)))

    step = make_multicluster_step_kernel(sess32, sz_stack, xr_stack,
                                         n_inner=4, n_walkers=W,
                                         interpret=True, thin=2)
    x, lp, acc, chain, chain_lp = step(x0, lp0, jnp.zeros((C, W)), 9)
    assert chain.shape == (C, 2, W, theta0.size)
    assert chain_lp.shape == (C, 2, W)
    np.testing.assert_array_equal(np.asarray(chain[:, -1]), np.asarray(x))
    # stored lp matches the reference multicluster likelihood per frame
    for k in range(2):
        lp_re = np.asarray(ref_ll(jnp.asarray(chain[:, k])))
        np.testing.assert_allclose(np.asarray(chain_lp[:, k]), lp_re,
                                   rtol=2e-4, atol=0.5)
    # the two clusters see different data, so identical starting ensembles
    # must diverge (per-cluster constants really are per-cluster)
    assert not np.allclose(np.asarray(x[0]), np.asarray(x[1]))
    assert np.all(np.asarray(acc) >= 0) and np.all(np.asarray(acc) <= 4)


def test_multicluster_kernel_hbm_chain_matches_vmem(sess32):
    """Multicluster chain_space='hbm' (unblocked HBM x chain + per-grid
    DMA) is bit-identical to the VMEM-block path."""
    import dataclasses
    from joxsz_tpu.models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    sz0 = sess32.model.sz_data
    C, W = 2, 16
    sz_stack = stack_sz_data([
        dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.05 * c))
        for c in range(C)
    ])
    xr_stack = stack_xray_data([sess32.model.xray_data] * C)
    ref_ll = make_multicluster_log_like(sess32.model, sz_stack, xr_stack,
                                        flatten=False)
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(6)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (C, W, theta0.size))), jnp.float32)
    lp0 = jnp.asarray(ref_ll(x0), jnp.float32)

    outs = {}
    for space in ("vmem", "hbm"):
        step = make_multicluster_step_kernel(
            sess32, sz_stack, xr_stack, n_inner=4, n_walkers=W,
            interpret=True, thin=2, chain_space=space)
        outs[space] = step(x0, lp0, jnp.zeros((C, W)), 9)
    for a, b in zip(outs["vmem"], outs["hbm"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multicluster_kernel_knots_family(ref_data):
    """The cluster-grid kernel inherits the model-family system: a
    knot-pressure stack matches the XLA multicluster likelihood."""
    import dataclasses
    from joxsz_tpu.models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.pressure_model = "knots"
    sess = build_session(cfg)
    sz0 = sess.model.sz_data
    C, W = 2, 16
    sz_stack = stack_sz_data([
        dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.05 * c))
        for c in range(C)
    ])
    xr_stack = stack_xray_data([sess.model.xray_data] * C)
    ref_ll = make_multicluster_log_like(sess.model, sz_stack, xr_stack,
                                        flatten=False)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(22)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (C, W, theta0.size))), jnp.float32)
    lp0 = jnp.asarray(ref_ll(x0), jnp.float32)

    step = make_multicluster_step_kernel(sess, sz_stack, xr_stack,
                                         n_inner=4, n_walkers=W,
                                         interpret=True, thin=2)
    assert step is not None
    x, lp, acc, chain, chain_lp = step(x0, lp0, jnp.zeros((C, W)), 31)
    lp_re = np.asarray(ref_ll(jnp.asarray(x)))
    fin = np.isfinite(np.asarray(lp))
    np.testing.assert_allclose(np.asarray(lp)[fin], lp_re[fin],
                               rtol=2e-4, atol=0.5)


def _tempered_state(sess32, K, W, seed=9):
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (K, W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = jnp.stack([core(x0[k]) for k in range(K)])
    return x0, lp0


def test_tempered_kernel_packed_matches_unpacked(sess32):
    """VERDICT r4 #2: the packed-state tempered kernel (lp/acc in the
    position buffer's padding lanes, state aliased in place — the plain
    kernel's W>=32768 fix ported) is bit-identical to the unpacked
    layout, including the swap sweeps (rows swap with their lp lane,
    accept counts stay with the walker slot)."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16
    betas = [1.0, 0.6, 0.36]
    x0, lp0 = _tempered_state(sess32, K, W)
    outs = {}
    for packed in (True, False):
        step = make_tempered_step_kernel(sess32, betas, n_inner=6,
                                         n_walkers=W, interpret=True,
                                         thin=3, packed_state=packed)
        outs[packed] = step(x0, lp0, jnp.zeros((K, W)), 5)
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tempered_kernel_half_tile_matches_untiled(sess32):
    """VERDICT r4 #2: the walker-tiled tempered half-substep is
    bit-identical to the untiled kernel in interpret mode (global
    row-offset PRNG), for both partner laws and both state layouts —
    tiles never straddle a rung."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16                 # H = 8, KH = 24
    betas = [1.0, 0.6, 0.36]
    x0, lp0 = _tempered_state(sess32, K, W, seed=12)
    for partner in ("onehot", "roll"):
        for packed in (True, False):
            outs = {}
            for tile in (None, 4):
                step = make_tempered_step_kernel(
                    sess32, betas, n_inner=4, n_walkers=W,
                    interpret=True, thin=2, ll_tile=4, half_tile=tile,
                    packed_state=packed, partner=partner)
                outs[tile] = step(x0, lp0, jnp.zeros((K, W)), 23)
            for a, b in zip(outs[None], outs[4]):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))


def test_tempered_kernel_roll_partner_mechanics(sess32):
    """partner='roll' (the large-W gather law): stored lp stays the
    untempered log-like on every rung, walkers move, swap counters
    sane — the rotation partner is a valid stretch move."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16
    betas = [1.0, 0.6, 0.36]
    x0, lp0 = _tempered_state(sess32, K, W, seed=14)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    step = make_tempered_step_kernel(sess32, betas, n_inner=6,
                                     n_walkers=W, interpret=True,
                                     thin=3, partner="roll")
    x, lp, acc, sacc, chain, chain_lp = step(x0, lp0,
                                             jnp.zeros((K, W)), 31)
    for k in range(K):
        lp_re = core(jnp.asarray(x[k]))
        np.testing.assert_allclose(np.asarray(lp[k]),
                                   np.asarray(lp_re), rtol=2e-5,
                                   atol=1e-2)
    assert np.any(np.asarray(x) != np.asarray(x0))
    assert np.asarray(acc).mean() > 0
    assert np.all(np.asarray(sacc) >= 0)
    assert np.all(np.asarray(sacc) <= 6 * W)


def test_tempered_kernel_hbm_chain_matches_vmem(sess32):
    """Tempered chain_space='hbm' (per-half DMA of the cold rung) is
    bit-identical to the VMEM-output path."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16
    betas = [1.0, 0.6, 0.36]
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (K, W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = jnp.stack([core(x0[k]) for k in range(K)])

    outs = {}
    for space in ("vmem", "hbm"):
        step = make_tempered_step_kernel(sess32, betas, n_inner=6,
                                         n_walkers=W, interpret=True,
                                         thin=3, chain_space=space)
        outs[space] = step(x0, lp0, jnp.zeros((K, W)), 5)
    for a, b in zip(outs["vmem"], outs["hbm"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tempered_kernel_ll_loop_matches_unrolled(sess32):
    """The tempered kernel's fori_loop likelihood tiling is bit-identical
    to the single-call evaluation."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16                 # KH = 24
    betas = [1.0, 0.6, 0.36]
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(10)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (K, W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = jnp.stack([core(x0[k]) for k in range(K)])

    outs = {}
    for tile in (256, 8):        # 256: single call; 8: loop (3 tiles)
        step = make_tempered_step_kernel(sess32, betas, n_inner=4,
                                         n_walkers=W, interpret=True,
                                         thin=2, ll_tile=tile)
        outs[tile] = step(x0, lp0, jnp.zeros((K, W)), 17)
    for a, b in zip(outs[256], outs[8]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tempered_step_kernel(sess32):
    """Tempered step kernel (interpret mode): stored log-probs are
    UNtempered and match recomputation on every rung, cold-chain frames
    match the cold rung, swap counters are sane."""
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    K, W = 3, 16
    betas = [1.0, 0.6, 0.36]
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(8)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (K, W, theta0.size))), jnp.float32)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    lp0 = jnp.stack([core(x0[k]) for k in range(K)])
    assert np.all(np.isfinite(np.asarray(lp0)))

    step = make_tempered_step_kernel(sess32, betas, n_inner=6,
                                     n_walkers=W, interpret=True, thin=3)
    x, lp, acc, sacc, chain, chain_lp = step(x0, lp0, jnp.zeros((K, W)), 5)
    assert x.shape == (K, W, theta0.size)
    assert sacc.shape == (K - 1,)
    assert chain.shape == (2, W, theta0.size)
    # stored lp is the UNtempered log-likelihood on every rung
    for k in range(K):
        lp_re = core(jnp.asarray(x[k]))
        np.testing.assert_allclose(np.asarray(lp[k]), np.asarray(lp_re),
                                   rtol=2e-5, atol=1e-2)
    # last cold-chain frame is the final cold rung
    np.testing.assert_array_equal(np.asarray(chain[-1]), np.asarray(x[0]))
    np.testing.assert_array_equal(np.asarray(chain_lp[-1]),
                                  np.asarray(lp[0]))
    for k in range(2):
        lp_re = core(jnp.asarray(chain[k]))
        np.testing.assert_allclose(np.asarray(chain_lp[k]),
                                   np.asarray(lp_re), rtol=2e-5, atol=1e-2)
    assert np.all(np.asarray(acc) >= 0) and np.all(np.asarray(acc) <= 6)
    assert np.all(np.asarray(sacc) >= 0)
    assert np.all(np.asarray(sacc) <= 6 * W)


def test_run_tempered_kernel_chunking(sess32):
    """Chunked tempered-kernel runner: chain/statistics shapes, remainder
    kernel, cold-chain lp consistency."""
    from joxsz_tpu.sampling.kernel import run_tempered_kernel

    K, W = 3, 16
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(9)
    p0 = jnp.asarray(theta0[None] * (1 + 0.02 * rng.standard_normal(
        (W, theta0.size))), jnp.float32)      # (W, D): replicated to rungs

    res = run_tempered_kernel(sess32, p0, [1.0, 0.6, 0.36], n_steps=10,
                              key=jax.random.PRNGKey(0), thin=2,
                              chunk_steps=4, interpret=True)
    assert res is not None
    assert res.chain.shape == (5, W, theta0.size)       # 10/2 saved
    assert res.log_prob.shape == (5, W)
    assert res.swap_acceptance.shape == (K - 1,)
    assert res.acceptance_fraction.shape == (K, W)
    assert np.all(res.acceptance_fraction >= 0)
    assert np.all(res.acceptance_fraction <= 1)
    core = make_joint_core(sess32, block_b=8, interpret=True)
    for k in range(5):
        lp_re = core(jnp.asarray(res.chain[k]))
        np.testing.assert_allclose(res.log_prob[k], np.asarray(lp_re),
                                   rtol=2e-5, atol=1e-2)


def test_multicluster_kernel_declines_heterogeneous_stack(sess32):
    """Stacks whose baked-in statics differ (e.g. conversion tables) must
    fall back to the XLA path (builder returns None)."""
    import dataclasses
    from joxsz_tpu.models.multicluster import stack_sz_data, stack_xray_data
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    sz0 = sess32.model.sz_data
    sz_stack = stack_sz_data([
        sz0, dataclasses.replace(sz0, conv_val=sz0.conv_val * 1.01)
    ])
    xr_stack = stack_xray_data([sess32.model.xray_data] * 2)
    step = make_multicluster_step_kernel(sess32, sz_stack, xr_stack,
                                         n_inner=2, n_walkers=8,
                                         interpret=True)
    assert step is None


def test_multicluster_kernel_ll_loop_matches_unrolled(sess32):
    """The multicluster kernel's fori_loop likelihood tiling is
    bit-identical to the single-call evaluation (same compile-time fix
    as the plain/tempered kernels)."""
    import dataclasses
    from joxsz_tpu.models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    sz0 = sess32.model.sz_data
    C, W = 2, 16
    sz_stack = stack_sz_data([
        dataclasses.replace(sz0, flux=sz0.flux * (1 + 0.05 * c))
        for c in range(C)
    ])
    xr_stack = stack_xray_data([sess32.model.xray_data] * C)
    ref_ll = make_multicluster_log_like(sess32.model, sz_stack, xr_stack,
                                        flatten=False)
    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(23)
    x0 = jnp.asarray(theta0[None, None] * (1 + 0.02 * rng.standard_normal(
        (C, W, theta0.size))), jnp.float32)
    lp0 = jnp.asarray(ref_ll(x0), jnp.float32)

    outs = {}
    for tile in (256, 4):        # 256: single call; 4: loop (H=8, 2 tiles)
        step = make_multicluster_step_kernel(
            sess32, sz_stack, xr_stack, n_inner=4, n_walkers=W,
            interpret=True, thin=2, ll_tile=tile)
        outs[tile] = step(x0, lp0, jnp.zeros((C, W)), 33)
    for a, b in zip(outs[256], outs[4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_kernel_hlo_data_independent(sess32):
    """Dataset constants enter the jitted step program as runtime
    arguments, never closure capture: two surveys with different data
    but identical shapes lower to byte-identical HLO, so the persistent
    compile cache serves every dataset at a given shape (closure capture
    embeds the arrays as HLO literals — one full Mosaic recompile per
    dataset, measured at ~7 s per kernel on hardware)."""
    import dataclasses
    from joxsz_tpu.models.multicluster import (stack_sz_data,
                                               stack_xray_data)
    from joxsz_tpu.ops.pallas_joint import make_multicluster_step_kernel

    sz0 = sess32.model.sz_data
    C, W = 2, 16
    D = len(sess32.params.thawed)
    texts = []
    for bump in (0.03, 0.11):
        sz_stack = stack_sz_data([
            dataclasses.replace(sz0, flux=sz0.flux * (1 + bump * (c + 1)))
            for c in range(C)])
        xr_stack = stack_xray_data([sess32.model.xray_data] * C)
        step = make_multicluster_step_kernel(sess32, sz_stack, xr_stack,
                                             n_inner=4, n_walkers=W,
                                             interpret=True, thin=2)
        lowered = step._jitted.lower(
            jax.ShapeDtypeStruct((C, W, D), jnp.float32),
            jax.ShapeDtypeStruct((C, W), jnp.float32),
            jax.ShapeDtypeStruct((C, W), jnp.float32),
            0, step._consts)
        texts.append(lowered.as_text())
    assert texts[0] == texts[1]


def test_xray_fuse_packed_matches_legacy(sess32, monkeypatch):
    """The packed X-ray hat layout (SPG shells per 128-aligned lane
    group + one fused (NSK, 2*NBS) Z=0/Z=1 table operator) is the same
    math as the legacy layout (one shell per group, two table matmuls):
    identical batch through both interpret-mode kernels must agree to
    f32 roundoff of the ~1e4-magnitude log-like, with exact vetoes."""
    import joxsz_tpu.ops.pallas_joint as pj

    theta0 = np.asarray(sess32.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(3)
    batch = (theta0[None] * (1 + 0.03 * rng.standard_normal(
        (16, theta0.size)))).astype(np.float32)

    outs = {}
    for fuse in ("packed", "legacy"):
        monkeypatch.setattr(pj, "XRAY_FUSE", fuse)
        core = make_joint_core(sess32, block_b=8, interpret=True)
        outs[fuse] = np.asarray(core(jnp.asarray(batch)))
    fin = np.isfinite(outs["legacy"])
    assert np.array_equal(np.isfinite(outs["packed"]), fin)
    assert np.allclose(outs["packed"][fin], outs["legacy"][fin],
                       rtol=2e-5, atol=0.05), (
        np.max(np.abs(outs["packed"][fin] - outs["legacy"][fin])))


@pytest.mark.parametrize("pm", ["gnfw", "knots"])
def test_recip_mul_matches_base(ref_data, pm, monkeypatch):
    """The RECIP_MUL knob (divide/sqrt -> reciprocal-multiply/rsqrt in
    the shared profile/veto chunk, with the dpress->veto-mass algebraic
    fold) is the same math as the base kernel: identical batches through
    both interpret-mode kernels agree to f32 roundoff with exact vetoes,
    for both pressure families (the knots family exercises the
    segment-midpoint veto's rsqrt form)."""
    import joxsz_tpu.ops.pallas_joint as pj

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.pressure_model = pm
    sess = build_session(cfg)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(11)
    batch = jnp.asarray(theta0[None] * (1 + 0.05 * rng.standard_normal(
        (32, theta0.size))), jnp.float32)

    outs = {}
    for knob in (False, True):
        monkeypatch.setattr(pj, "RECIP_MUL", knob)
        core = make_joint_core(sess, block_b=8, interpret=True)
        outs[knob] = np.asarray(core(batch))
    fin = np.isfinite(outs[False])
    assert fin.any()
    assert np.array_equal(np.isfinite(outs[True]), fin)
    assert np.allclose(outs[True][fin], outs[False][fin],
                       rtol=2e-5, atol=0.05), (
        np.max(np.abs(outs[True][fin] - outs[False][fin])))


@pytest.mark.parametrize("pm", ["gnfw", "knots"])
def test_ilv_bit_exact(ref_data, pm, monkeypatch):
    """The ILV knob (issue the X-ray table matmul before the veto+SZ
    blocks) moves COMPUTATION only — the op set and the total-update
    order are unchanged — so its log-likes must be BIT-EXACT against
    the linear order, for both pressure families (the knots family
    exercises the AKM-midpoint branch of xray_pre)."""
    import joxsz_tpu.ops.pallas_joint as pj

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    cfg.pressure_model = pm
    sess = build_session(cfg)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    rng = np.random.default_rng(23)
    batch = jnp.asarray(theta0[None] * (1 + 0.05 * rng.standard_normal(
        (32, theta0.size))), jnp.float32)

    outs = {}
    for knob in (False, True):
        monkeypatch.setattr(pj, "ILV", knob)
        core = make_joint_core(sess, block_b=8, interpret=True)
        outs[knob] = np.asarray(core(batch))
    assert np.isfinite(outs[False]).any()
    assert np.array_equal(outs[False], outs[True]), (
        np.max(np.abs(outs[False] - outs[True])))


def test_auto_half_tile_picks_valid_divisor():
    """r5 review: requiring exactly 4096 silently built the untiled
    kernel (a no-message Mosaic crash) for any large W whose half is
    not 4096-divisible; the heuristic must pick the largest valid
    ll_tile-multiple divisor instead."""
    from joxsz_tpu.ops.pallas_joint import _auto_half_tile

    # below the threshold: untiled
    assert _auto_half_tile(32768, 16384, 256, threshold=32768) is None
    # the proven peak config: exactly 4096
    assert _auto_half_tile(65536, 32768, 256, threshold=32768) == 4096
    # H = 18432 (W = 36864): 4096 does not divide, 3072 does
    assert _auto_half_tile(36864, 18432, 256, threshold=32768) == 3072
    # no valid divisor at all -> None (documented failure mode):
    # 32768 = 2^15 has no factor divisible by 3, so no multiple of 384
    # divides it
    assert _auto_half_tile(65536, 32768, 384, threshold=32768) is None
    # tempered rung-tile: tile == H (whole rung per tile) is allowed
    assert _auto_half_tile(16384, 512, 256, threshold=8192) == 512


def test_tempered_kernel_rejects_single_rung(sess32):
    from joxsz_tpu.ops.pallas_joint import make_tempered_step_kernel

    with pytest.raises(ValueError, match="at least 2 betas"):
        make_tempered_step_kernel(sess32, [1.0], n_inner=4, n_walkers=8,
                                  interpret=True)
