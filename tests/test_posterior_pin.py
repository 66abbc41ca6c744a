"""Posterior regression pin (VERDICT r2 missing #2).

The converged CL J1226 posterior — the r3 FLAGLESS hardware fit
(results/tpu_r3/, split-Rhat 1.0063, post gNFW-derivative fix) — is
frozen into tests/fixtures/cl1226_posterior_pin.json
(scripts/refreeze_pin.py; re-pin ONLY for intended physics changes).
A physics/table/kernel change that silently moves the posterior
previously passed the entire suite; now the --postprocess path must
reproduce the pinned medians/widths from the stored chain.  A FRESH
hardware fit is checked against the same pin by scripts/tpu_pin_check.py
(fresh mode, MC-error tolerances) — that half cannot run under pytest
because tests force the CPU platform (conftest.py).  See VALIDATION.md
for the evidence chain.
"""

import json
import pathlib

import numpy as np
import pytest

from joxsz_tpu.postproc.pin import load_pin, check_pin

REPO = pathlib.Path(__file__).resolve().parents[1]
CONV_CHAIN = REPO / "results" / "tpu_r3" / "joxsz_chain.hdf5"


def test_pin_fixture_is_converged():
    pin = load_pin()
    assert pin["_provenance"]["split_rhat_max"] <= 1.01
    assert len(pin["parameters"]) == 13
    # every entry carries what the tolerance math needs
    for p in pin["parameters"].values():
        assert p["std"] > 0 and p["n_eff"] > 1000


@pytest.mark.skipif(not CONV_CHAIN.exists(),
                    reason="stored converged chain not present")
def test_postprocess_reproduces_pinned_summary(ref_data, tmp_path):
    """Fast regression check: recompute the posterior summary from the
    stored converged chain through the real --postprocess path and
    require it to reproduce the pinned medians/stds exactly.  Catches
    changes to the flat-chain layout, the summary statistics, or the
    chain loader that would silently redefine the reported posterior."""
    from joxsz_tpu.build import build_session
    from joxsz_tpu.config import JoXSZConfig
    from joxsz_tpu.run import _postprocess_saved_chain

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.save_dir = str(tmp_path)
    sess = build_session(cfg)
    _postprocess_saved_chain(sess, cfg, str(CONV_CHAIN), no_plots=True)
    summary = json.loads((tmp_path / f"{cfg.name}_summary.json").read_text())
    ok, report = check_pin(summary, mode="exact")
    assert ok, "\n".join(report)
    # and the stored chain still certifies convergence under the current
    # diagnostics (a diagnostics change that breaks this must re-pin)
    rhat = max(p["rhat"] for p in summary["parameters"].values())
    assert rhat <= 1.01


def test_check_pin_detects_shift_and_width_change():
    """The fresh-mode tolerance machinery must actually flag a shifted
    median and a blown-up width, and pass a statistically compatible
    re-fit."""
    pin = load_pin()
    base = {n: dict(p) for n, p in pin["parameters"].items()}

    ok, report = check_pin({"parameters": base}, mode="fresh")
    assert ok, report

    names = list(base)
    shifted = {n: dict(p) for n, p in base.items()}
    shifted[names[0]]["median"] = (base[names[0]]["median"]
                                   + 0.5 * base[names[0]]["std"])
    ok, report = check_pin({"parameters": shifted}, mode="fresh")
    assert not ok and names[0] in report[0]

    wide = {n: dict(p) for n, p in base.items()}
    wide[names[1]]["std"] = 2.0 * base[names[1]]["std"]
    ok, report = check_pin({"parameters": wide}, mode="fresh")
    assert not ok and "width ratio" in report[0]

    dropped = {n: dict(p) for n, p in base.items() if n != names[2]}
    ok, report = check_pin({"parameters": dropped}, mode="fresh")
    assert not ok and "parameter set differs" in report[0]


def test_check_pin_missing_neff_tightens_not_loosens():
    """r5 review: a summary missing n_eff must NOT fall back to n_eff=1
    (which made the MC term ~1.25 sd/side and the median tolerance
    ~7.5 sigma — a vacuous gate).  With the inf-n_eff default the
    0.20-sd floor governs, so a 1-sd median shift must FAIL."""
    pin = load_pin()
    names = list(pin["parameters"])
    stripped = {}
    for n, p in pin["parameters"].items():
        q = dict(p)
        q.pop("n_eff", None)
        stripped[n] = q
    ok, report = check_pin({"parameters": stripped}, mode="fresh")
    assert ok, report      # identical medians still pass

    shifted = {n: dict(p) for n, p in stripped.items()}
    shifted[names[0]]["median"] = (stripped[names[0]]["median"]
                                   + 1.0 * stripped[names[0]]["std"])
    ok, report = check_pin({"parameters": shifted}, mode="fresh")
    assert not ok and names[0] in report[0]
