"""Workflow-level tests: new-cluster configuration (auto table
generation + metadata guards), named SZ outputs, knot-pressure mass veto
via autodiff, multistart MLE."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session


def test_new_cluster_config_gets_own_table(ref_data, tmp_path):
    """A config with a different redshift must NOT silently reuse the
    bundled CL J1226 table: a fresh config-keyed artifact is generated
    with matching metadata."""
    import joxsz_tpu.build as build_mod

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.redshift = 0.45            # different cluster
    cfg.xray.table_path = None     # let the build pick/create a table
    # (keeping the explicit cl1226 table_path instead raises a clear
    # mismatch error — covered by test_table_mismatch_raises)
    sess = build_session(cfg, use_cache=False)
    # session builds and the likelihood is finite
    ll = float(jax.jit(sess.log_like)(jnp.asarray(
        sess.params.thawed_values())))
    assert np.isfinite(ll)
    # the generated artifact records the new redshift
    import glob, json, pathlib
    repo = pathlib.Path(build_mod.__file__).resolve().parents[1]
    tables = glob.glob(str(repo / "data" / "tables" / "ctrate_*.npz"))
    metas = [json.loads(bytes(np.load(t)["meta"]).decode()) for t in tables]
    assert any(abs(m["z"] - 0.45) < 1e-9 for m in metas)


def test_table_mismatch_raises(ref_data):
    from joxsz_tpu.models.xray import CountRateTable
    import pathlib

    repo = pathlib.Path(__file__).resolve().parents[1]
    path = repo / "data" / "tables" / "cl1226_ctrate.npz"
    with pytest.raises(ValueError, match="different setup"):
        CountRateTable.from_npz(str(path), expect={"z": 0.3,
                                                   "NH_1022pcm2": 0.0183})


def test_table_nonuniform_grid_rejected(tmp_path):
    """Regression (r4 review #4): the hat-basis interpolation assumes a
    uniform log-T grid (dt = Tlog[1]-Tlog[0]); a hand-built table with a
    non-uniform Tlog must fail loudly at load, not skew every predicted
    count silently."""
    import numpy as np

    from joxsz_tpu.models.xray import CountRateTable

    nT = 16
    good = np.linspace(np.log(0.1), np.log(20.0), nT)
    bad = np.sort(np.concatenate([good[:8], good[8:] * 1.1]))
    path = tmp_path / "bad.npz"
    np.savez(path, Tlog=bad,
             lograte_Z0=np.zeros((2, nT)), lograte_Z1=np.zeros((2, nT)),
             logflux_Z0=np.zeros(nT), logflux_Z1=np.zeros(nT))
    with pytest.raises(ValueError, match="NON-UNIFORM"):
        CountRateTable.from_npz(str(path))
    np.savez(path, Tlog=good,
             lograte_Z0=np.zeros((2, nT)), lograte_Z1=np.zeros((2, nT)),
             logflux_Z0=np.zeros(nT), logflux_Z1=np.zeros(nT))
    CountRateTable.from_npz(str(path))     # uniform grid loads fine


def test_table_model_version_guard(ref_data, tmp_path):
    """A pre-versioning (stale-physics) fallback table must be rejected;
    XSPEC-backend tables are exact physics and exempt from the check."""
    import json
    import pathlib

    from joxsz_tpu.models.xray import CountRateTable
    from joxsz_tpu.tablegen import SPECTRAL_MODEL_VERSION

    repo = pathlib.Path(__file__).resolve().parents[1]
    src = repo / "data" / "tables" / "cl1226_ctrate.npz"
    d = dict(np.load(str(src)))
    meta = json.loads(bytes(d["meta"]).decode())
    assert meta["model_version"] == SPECTRAL_MODEL_VERSION  # bundled is current

    def save_with_meta(m, name):
        d2 = dict(d)
        d2["meta"] = np.bytes_(json.dumps(m).encode())
        p = tmp_path / name
        np.savez_compressed(p, **d2)
        return str(p)

    expect = {"z": meta["z"], "NH_1022pcm2": meta["NH_1022pcm2"],
              "model_version": SPECTRAL_MODEL_VERSION}

    # stale: fallback-backend table with no (or old) version field
    stale = {k: v for k, v in meta.items() if k != "model_version"}
    with pytest.raises(ValueError, match="model_version"):
        CountRateTable.from_npz(save_with_meta(stale, "stale.npz"),
                                expect=expect)
    old = dict(meta, model_version=SPECTRAL_MODEL_VERSION - 1)
    with pytest.raises(ValueError, match="model_version"):
        CountRateTable.from_npz(save_with_meta(old, "old.npz"),
                                expect=expect)

    # xspec-backend tables load regardless of the fallback-model version
    xs = dict(stale, backend="xspec", model="phabs(apec)")
    CountRateTable.from_npz(save_with_meta(xs, "xspec.npz"), expect=expect)


def test_sz_outputs_named(ref_data):
    from joxsz_tpu.models import sz_outputs

    sess = build_session(JoXSZConfig.cl1226(str(ref_data)), sz_only=True)
    pars = sess.params.unpack(jnp.asarray(sess.params.thawed_values()))
    m = sess.model
    pp = np.asarray(sz_outputs(pars, m.sz_data, m.pressure, m.temperature,
                               "pp"))
    bright = np.asarray(sz_outputs(pars, m.sz_data, m.pressure,
                                   m.temperature, "bright"))
    chisq = float(sz_outputs(pars, m.sz_data, m.pressure, m.temperature,
                             "chisq"))
    ll = float(sz_outputs(pars, m.sz_data, m.pressure, m.temperature, "ll"))
    integ = float(sz_outputs(pars, m.sz_data, m.pressure, m.temperature,
                             "integ"))
    assert pp.shape == (313,) and np.all(pp > 0)
    assert bright.shape == (86,)
    assert np.isclose(ll, -chisq / 2)
    assert integ > 0
    with pytest.raises(ValueError):
        sz_outputs(pars, m.sz_data, m.pressure, m.temperature, "nope")


def test_knot_pressure_mass_veto_ad(ref_data):
    """Knot-pressure sessions keep the physicality veto (in its
    segment-averaged form, JointModel._mass_veto_ok): the default init
    is finite under it and gradients flow through the AD pressure
    derivative (the veto is a where-mask, so AD stays clean)."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.pressure_model = "knots"
    cfg.n_pressure_knots = 5
    sess = build_session(cfg)
    assert sess.model.exclude_unphysical_mass
    theta = jnp.asarray(sess.params.thawed_values())
    ll = float(jax.jit(sess.log_like)(theta))
    assert np.isfinite(ll)
    # gradient flows through the AD derivative too
    g = np.asarray(jax.jit(jax.grad(sess.log_like))(theta))
    assert g.shape == theta.shape
    assert np.all(np.isfinite(g))


def test_multistart_mle_improves():
    from joxsz_tpu.sampling.mle import find_mle_multistart

    mu = np.array([1.0, -2.0, 0.5])

    def lp(x):
        return -0.5 * jnp.sum((x - jnp.asarray(mu)) ** 2) * 20.0

    theta, ll = find_mle_multistart(
        lp, np.zeros(3), np.full(3, -10.0), np.full(3, 10.0),
        n_starts=16, n_steps=400, lr=0.05)
    assert np.allclose(theta, mu, atol=0.05)
    assert ll > -0.1
