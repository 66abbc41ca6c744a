"""--postprocess CLI mode: rebuild summary/figures from a saved chain.

The reference can only produce its figures inside a live ``main()`` run
(/root/reference/joxsz_main.py:213-246 drives joxsz_plots.py from the
in-memory sampler); this framework re-postprocesses any emcee-layout
chain file against a freshly built session (joxsz_tpu/run.py
``_postprocess_saved_chain``).
"""

import json

import numpy as np
import pytest

from joxsz_tpu.build import build_session
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.io.checkpoint import save_chain_hdf5
from joxsz_tpu.run import _postprocess_saved_chain


@pytest.fixture(scope="module")
def session(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)))


def _write_chain(path, names, theta0, n_saved=40, n_walkers=8, seed=0):
    rng = np.random.default_rng(seed)
    ndim = len(names)
    chain = theta0[None, None, :] * (
        1 + 0.01 * rng.standard_normal((n_saved, n_walkers, ndim)))
    log_prob = rng.standard_normal((n_saved, n_walkers))
    save_chain_hdf5(str(path), chain, log_prob,
                    acceptance=np.full(n_walkers, 0.25),
                    param_names=names, nburn=100, nthin=5)
    return chain, log_prob


def test_postprocess_writes_summary(session, ref_data, tmp_path,
                                    monkeypatch, capsys):
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.save_dir = str(tmp_path)
    names = list(session.params.thawed)
    theta0 = np.asarray(session.params.thawed_values(), dtype=np.float64)
    chain, log_prob = _write_chain(tmp_path / "c.hdf5", names, theta0)

    res = _postprocess_saved_chain(session, cfg, str(tmp_path / "c.hdf5"),
                                   no_plots=True)
    assert res.chain.shape == chain.shape
    # MLE carrier = argmax of the saved log-prob
    flat_i = np.argmax(log_prob.reshape(-1))
    np.testing.assert_allclose(
        res.mle_theta, chain.reshape(-1, chain.shape[2])[flat_i])
    out = capsys.readouterr().out
    assert "postprocessing" in out and names[0] in out

    # summary JSON exists and mentions every parameter
    summary = json.loads((tmp_path / f"{cfg.name}_summary.json").read_text())
    text = json.dumps(summary)
    for n in names:
        assert n in text


def test_ppc_report_writes_json(session, ref_data, tmp_path, capsys):
    from joxsz_tpu.run import _ppc_report
    from joxsz_tpu.sampling.driver import FitResult

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.save_dir = str(tmp_path)
    names = list(session.params.thawed)
    theta0 = np.asarray(session.params.thawed_values(), dtype=np.float64)
    rng = np.random.default_rng(3)
    chain = theta0[None, None, :] * (
        1 + 1e-3 * rng.standard_normal((20, 6, len(names))))
    res = FitResult(chain=chain,
                    log_prob=np.zeros((20, 6)),
                    acceptance_fraction=np.full(6, np.nan),
                    mle_theta=theta0, mle_loglike=0.0,
                    param_names=names, timings={})
    r = _ppc_report(session, cfg, res, n_draws=50)
    assert 0.0 <= r.p_sz <= 1.0 and 0.0 <= r.p_xray <= 1.0
    out = json.loads((tmp_path / f"{cfg.name}_ppc.json").read_text())
    assert out["p_sz"] == r.p_sz and out["n_draws"] == 50
    assert "posterior-predictive check" in capsys.readouterr().out


def test_postprocess_rejects_mismatched_params(session, ref_data, tmp_path):
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.save_dir = str(tmp_path)
    names = list(session.params.thawed)
    wrong = ["not_a_param"] + names[1:]
    theta0 = np.asarray(session.params.thawed_values(), dtype=np.float64)
    _write_chain(tmp_path / "w.hdf5", wrong, theta0)
    with pytest.raises(SystemExit, match="model-family flags"):
        _postprocess_saved_chain(session, cfg, str(tmp_path / "w.hdf5"),
                                 no_plots=True)
