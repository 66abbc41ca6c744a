"""Multi-process (multi-host) survey parallelism tests.

Fast tests exercise ``parallel.multihost`` helpers in-process on the
virtual 8-device mesh (a single-process job is the num_processes=1
degenerate case of a jax.distributed job — the same code paths run, with
every shard addressable).  The slow test launches the REAL multi-process
demo (``scripts/multihost_survey_demo.py``): 2 OS processes x 2 virtual
CPU devices joined via jax.distributed + gloo, checked bit-exact against
the identical single-process mesh run.

TPU-native replacement for the reference's multiprocessing.Pool
concurrency (/root/reference/joxsz_main.py:203-208; SURVEY.md §5.8).
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.parallel import make_mesh, run_multi_cluster
from joxsz_tpu.parallel.multihost import (
    local_block, replicated_to_global, run_multihost_multi_cluster,
)

REPO = pathlib.Path(__file__).resolve().parents[1]

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _toy_lp_cb():
    def lp(x):
        return -0.5 * jnp.sum(x * x)

    return jax.jit(jax.vmap(jax.vmap(lp)))


@needs_devices
def test_replicated_to_global_roundtrip():
    mesh = make_mesh(8, axis_names=("cluster",))
    x = np.arange(8 * 3, dtype=np.float64).reshape(8, 3)
    from jax.sharding import PartitionSpec as P

    g = replicated_to_global(x, mesh, P("cluster"))
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g), x)
    # single process: every shard addressable, block covers everything
    c0, c1, loc = local_block(g)
    assert (c0, c1) == (0, 8)
    np.testing.assert_array_equal(loc, x)


@needs_devices
def test_local_block_replicated_dedup():
    mesh = make_mesh(8, axis_names=("cluster",))
    x = np.linspace(0.0, 1.0, 12).reshape(4, 3)
    g = replicated_to_global(x, mesh)  # P(): fully replicated
    c0, c1, loc = local_block(g)
    assert (c0, c1) == (0, 4)
    np.testing.assert_array_equal(loc, x)


@needs_devices
def test_local_block_assembles_cross_axis_sharding():
    """Shards split along the walker axis too (('cluster','walker') mesh)
    are stitched back into whole local clusters."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8, axis_names=("cluster", "walker"), shape=(4, 2))
    x = np.arange(4 * 8, dtype=np.float64).reshape(4, 8)
    g = jax.device_put(jnp.asarray(x),
                       NamedSharding(mesh, P("cluster", "walker")))
    c0, c1, loc = local_block(g, axis=0)
    assert (c0, c1) == (0, 4)
    np.testing.assert_array_equal(loc, x)


class _FakeShard:
    def __init__(self, index, data):
        self.index, self.data = index, data


class _FakeArr:
    """Duck-typed stand-in to exercise multi-process shard layouts that a
    single-process job cannot produce."""

    def __init__(self, shape, shards):
        self.shape, self.ndim = shape, len(shape)
        self.addressable_shards = shards


def test_local_block_rejects_gap_and_partial_coverage():
    blk = np.zeros((2, 4))
    # non-contiguous along the block axis: rows [0,2) and [6,8) of 8
    arr = _FakeArr((8, 4), [
        _FakeShard((slice(0, 2), slice(None)), blk),
        _FakeShard((slice(6, 8), slice(None)), blk),
    ])
    with pytest.raises(ValueError, match="not contiguous"):
        local_block(arr, axis=0)
    # other axis only partially covered locally
    arr = _FakeArr((4, 8), [
        _FakeShard((slice(0, 2), slice(0, 4)), blk.T),
    ])
    with pytest.raises(ValueError, match="partially covered"):
        local_block(arr, axis=0)


@needs_devices
def test_multihost_runner_matches_single_process_mesh():
    """num_processes=1 multihost runner == run_multi_cluster bit-exact:
    same step (make_multicluster_step), same PRNG schedule, same mesh."""
    mesh = make_mesh(8, axis_names=("cluster", "walker"), shape=(4, 2))
    lp_cb = _toy_lp_cb()
    C, W, D = 4, 16, 3
    rng = np.random.default_rng(7)
    p0 = rng.standard_normal((C, W, D))
    key = jax.random.PRNGKey(5)
    ref = run_multi_cluster(lp_cb, p0, 64, key, mesh, thin=8)
    out = run_multihost_multi_cluster(lp_cb, p0, 64, key, mesh, thin=8)
    assert out["cluster_range"] == (0, C)
    np.testing.assert_array_equal(out["positions"], ref["positions"])
    np.testing.assert_array_equal(out["log_prob"], ref["log_prob"])
    np.testing.assert_array_equal(out["acceptance_fraction"],
                                  ref["acceptance_fraction"])
    # new-style typed PRNG keys are accepted (canonicalized to key data),
    # and the cached driver serves the repeat call
    out2 = run_multihost_multi_cluster(lp_cb, p0, 64, jax.random.key(5),
                                       mesh, thin=8)
    np.testing.assert_array_equal(out2["positions"], ref["positions"])


@needs_devices
def test_multihost_runner_burn_and_record():
    """n_burn prepends unrecorded steps in the same program; record=True
    returns thinned process-local chain blocks whose last frame is the
    final state."""
    mesh = make_mesh(8, axis_names=("cluster",))
    lp_cb = _toy_lp_cb()
    C, W, D = 8, 16, 3
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((C, W, D)) * 2.0
    key = jax.random.PRNGKey(9)
    out = run_multihost_multi_cluster(lp_cb, p0, 48, key, mesh, thin=8,
                                      n_burn=32, record=True)
    assert out["chain"].shape == (48 // 8, C, W, D)
    assert out["chain_log_prob"].shape == (48 // 8, C, W)
    np.testing.assert_array_equal(out["chain"][-1], out["positions"])
    np.testing.assert_array_equal(out["chain_log_prob"][-1],
                                  out["log_prob"])
    # burn must change the stream vs a no-burn run of the same schedule
    out0 = run_multihost_multi_cluster(lp_cb, p0, 48, key, mesh, thin=8)
    assert not np.array_equal(out0["positions"], out["positions"])
    # acceptance counts only the recorded phase
    assert 0.0 < out["acceptance_fraction"].mean() <= 1.0


@pytest.mark.slow
def test_survey_cli_multihost_launch(tmp_path):
    """`python -m joxsz_tpu.survey --multihost-launch 2`: a real
    2-process distributed survey fit through the CLI — summary written
    by the coordinator, one chain file per cluster written by its
    owning process, acceptance healthy."""
    import os

    out = tmp_path / "mh_survey.json"
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    rc = subprocess.run(
        [sys.executable, "-m", "joxsz_tpu.survey", "--mock", "2",
         "--walkers", "16", "--burn", "40", "--steps", "40", "--thin",
         "8", "--multihost-launch", "2", "--save-chains",
         "--out", str(out)],
        cwd=str(tmp_path), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=900)
    assert rc.returncode == 0, rc.stdout.decode()[-3000:]
    report = json.loads(out.read_text())
    assert report["multihost"]["num_processes"] == 2
    assert report["multihost"]["global_devices"] == 2
    assert sorted(tuple(r) for r in report["multihost"]["ranges"]) == \
        [(0, 1), (1, 2)]
    assert len(report["clusters"]) == 2
    for c in report["clusters"]:
        assert 0.05 < c["acceptance"] < 0.9
        assert (tmp_path / f"{c['name']}_chain.hdf5").exists()


@pytest.mark.slow
def test_survey_cli_multihost_kernel(tmp_path):
    """The multihost CLI production path: cluster-grid Pallas step kernel
    (interpret mode) sharded across 2 real processes."""
    import os

    out = tmp_path / "mh_k.json"
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    rc = subprocess.run(
        [sys.executable, "-m", "joxsz_tpu.survey", "--mock", "2",
         "--walkers", "8", "--burn", "8", "--steps", "8", "--thin", "8",
         "--multihost-launch", "2", "--step-kernel", "--kernel-interpret",
         "--out", str(out)],
        cwd=str(tmp_path), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=900)
    assert rc.returncode == 0, rc.stdout.decode()[-3000:]
    text = rc.stdout.decode()
    assert "kernel path: cluster-grid Pallas step sharded" in text
    report = json.loads(out.read_text())
    assert report["multihost"]["num_processes"] == 2
    assert len(report["clusters"]) == 2


@pytest.mark.slow
def test_multiprocess_demo_toy(tmp_path):
    """Real 2-process jax.distributed job (gloo) reproduces the
    single-process mesh run bit-exactly on the toy survey."""
    out = tmp_path / "mh.json"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/multihost_survey_demo.py"),
         "--nprocs", "2", "--devices-per-proc", "2", "--model", "toy",
         "--steps", "20", "--out", str(out)],
        cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900)  # > the launcher's own 600s worker deadline: let it
                      # fail fast and clean up its children itself
    assert rc.returncode == 0, rc.stdout.decode()[-3000:]
    report = json.loads(out.read_text())
    assert report["pass"]
    assert report["checks"]["xla"]["pass"]
    assert report["global_devices"] == 4
    assert sorted(tuple(r) for r in report["per_worker_ranges"]) == \
        [(0, 2), (2, 4)]


@pytest.mark.slow
def test_multiprocess_demo_ensemble(tmp_path):
    """Real 2-process jax.distributed job (gloo) reproduces the
    single-process mesh run bit-exactly for the SINGLE-ensemble
    multi-chip samplers — run_coupled_sharded_ensemble +
    run_hybrid_coupled_ensemble over a 'walker' mesh, interpret-mode
    kernels (VERDICT r4 #4; the sharded-survey path was already
    validated by test_multiprocess_demo_toy)."""
    out = tmp_path / "mh_ens.json"
    rc = subprocess.run(
        [sys.executable, str(REPO / "scripts/multihost_survey_demo.py"),
         "--nprocs", "2", "--devices-per-proc", "2", "--ensemble",
         "--walkers", "32", "--steps", "6", "--out", str(out)],
        cwd=str(REPO), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=900)
    assert rc.returncode == 0, rc.stdout.decode()[-3000:]
    report = json.loads(out.read_text())
    assert report["pass"]
    for name in ("coupled", "hybrid"):
        assert report["checks"][name]["bit_exact"], report["checks"]
    # each worker owns half the walkers (its A-half + B-half blocks)
    spans = sorted(len(r) for r in report["per_worker_ranges"])
    assert spans == [16, 16]
