"""Multi-cluster survey fitting (joxsz_tpu/survey.py).

The reference runs one cluster per process invocation
(/root/reference/joxsz_main.py); the survey module fits C clusters
simultaneously as one batched device program.
"""

import json

import numpy as np
import pytest

from joxsz_tpu.build import build_session
from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.simulate import simulate_survey
from joxsz_tpu.survey import SurveyResult, fit_survey, _build_spec_survey


@pytest.fixture(scope="module")
def session(ref_data):
    return build_session(JoXSZConfig.cl1226(str(ref_data)))


def test_fit_survey_mock_recovery(session):
    C, W, D = 2, 16, len(session.params.thawed)
    theta0 = np.asarray(session.params.thawed_values())
    names = list(session.params.thawed)
    truths = np.tile(theta0, (C, 1))
    truths[:, names.index("P_0")] *= [0.8, 1.2]
    rng = np.random.default_rng(7)
    survey = simulate_survey(session.model, truths, rng)

    res = fit_survey(session.model, survey.sz_stack, survey.xray_stack,
                     truths, n_walkers=W, n_burn=60, n_steps=60, thin=5,
                     seed=1, truths=truths)
    n_saved = 60 // 5
    assert res.chain.shape == (n_saved, C, W, D)
    assert res.log_prob.shape == (n_saved, C, W)
    assert res.medians.shape == (C, D) and res.sds.shape == (C, D)
    assert np.all(np.isfinite(res.log_prob))
    assert res.flat_chain(0).shape == (n_saved * W, D)
    # the injected P_0 ordering must be resolved even by a short fit
    i = names.index("P_0")
    assert res.medians[0, i] < res.medians[1, i]

    d = res.to_dict()
    json.dumps(d)                       # serialisable
    assert [c["name"] for c in d["clusters"]] == res.cluster_names
    assert d["clusters"][0]["truth"]["P_0"] == pytest.approx(truths[0, i])


def test_fit_survey_kernel_path_interpret(ref_data):
    """step_kernel=True routes through the cluster-grid Pallas kernel
    (interpret mode on CPU) and returns the same result structure."""
    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    C, W, D = 2, 16, len(sess.params.thawed)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    truths = np.tile(theta0, (C, 1))
    truths[:, list(sess.params.thawed).index("P_0")] *= [0.9, 1.1]
    survey = simulate_survey(sess.model, truths, np.random.default_rng(2))

    res = fit_survey(sess.model, survey.sz_stack, survey.xray_stack,
                     truths, n_walkers=W, n_burn=4, n_steps=4, thin=2,
                     seed=3, session=sess, step_kernel=True,
                     kernel_interpret=True)
    assert res.chain.shape == (2, C, W, D)
    assert res.log_prob.shape == (2, C, W)
    assert np.all(np.isfinite(res.log_prob))
    assert np.all(res.acceptance >= 0) and np.all(res.acceptance <= 1)


def test_fit_survey_kernel_requires_session(session):
    with pytest.raises(ValueError, match="session"):
        fit_survey(session.model, None, None,
                   np.zeros((2, len(session.params.thawed))),
                   n_walkers=8, n_burn=0, n_steps=10, step_kernel=True)


def test_fit_survey_rejects_bad_centers(session):
    with pytest.raises(ValueError, match="centers"):
        fit_survey(session.model, None, None, np.zeros((2, 3)),
                   n_walkers=8, n_burn=0, n_steps=10)


def test_spec_survey_rejects_empty(tmp_path):
    spec = tmp_path / "s.json"
    spec.write_text(json.dumps({"clusters": []}))

    class _Args:
        sz_only = False
        mle = False

    with pytest.raises(SystemExit, match="no 'clusters'"):
        _build_spec_survey(str(spec), _Args())


def test_survey_chain_roundtrips_through_checkpoint(session, tmp_path):
    """--save-chains output loads back as a valid emcee-layout chain."""
    from joxsz_tpu.io.checkpoint import save_chain_hdf5, load_chain_hdf5

    names = list(session.params.thawed)
    D = len(names)
    rng = np.random.default_rng(0)
    res = SurveyResult(
        cluster_names=["x"], param_names=names,
        chain=rng.standard_normal((4, 1, 6, D)),
        log_prob=rng.standard_normal((4, 1, 6)),
        acceptance=np.full((1, 6), 0.3),
        medians=np.zeros((1, D)), sds=np.ones((1, D)))
    p = tmp_path / "x_chain.hdf5"
    save_chain_hdf5(str(p), res.chain[:, 0], res.log_prob[:, 0],
                    res.acceptance[0], names, nburn=10, nthin=5)
    saved = load_chain_hdf5(str(p))
    np.testing.assert_array_equal(saved["chain"], res.chain[:, 0])
    assert saved["param_names"] == names


def test_fit_survey_kernel_mesh_path(ref_data):
    """step_kernel + a 2-device 'cluster' mesh (virtual CPU devices,
    interpret mode): the sharded cluster-grid path returns the same
    result structure and finite log-probs."""
    from joxsz_tpu.parallel import make_mesh

    cfg = JoXSZConfig.cl1226(str(ref_data))
    cfg.dtype = "float32"
    sess = build_session(cfg)
    C, W, D = 2, 16, len(sess.params.thawed)
    theta0 = np.asarray(sess.params.thawed_values(), dtype=np.float32)
    truths = np.tile(theta0, (C, 1))
    truths[:, list(sess.params.thawed).index("P_0")] *= [0.9, 1.1]
    survey = simulate_survey(sess.model, truths, np.random.default_rng(6))
    mesh = make_mesh(2, axis_names=("cluster",))

    res = fit_survey(sess.model, survey.sz_stack, survey.xray_stack,
                     truths, n_walkers=W, n_burn=4, n_steps=4, thin=2,
                     seed=3, session=sess, step_kernel=True,
                     kernel_interpret=True, mesh=mesh)
    assert res.chain.shape == (2, C, W, D)
    assert np.all(np.isfinite(res.log_prob))
    assert res.timings is not None


# ---- heterogeneous surveys (auto-grouping, VERDICT r2 #5) -------------------


def _write_hetero_spec(tmp_path, ref_data):
    """3-cluster spec in TWO stack groups: clusters 0 and 2 use the full
    bundled 10-band configuration, cluster 1 drops the two softest bands
    (different n_band leaf shapes -> different stack signature)."""
    cfgs = []
    for i, nb in enumerate((10, 8, 10)):
        cfg = JoXSZConfig.cl1226(str(ref_data))
        cfg.name = f"cl{i}"
        if nb != 10:
            cfg.xray.bands_eV = tuple(cfg.xray.bands_eV[10 - nb:])
            cfg.xray.table_path = None      # force the per-band artifact
        p = tmp_path / f"cl{i}.json"
        p.write_text(cfg.to_json())
        cfgs.append({"name": f"cl{i}", "config": str(p)})
    spec = tmp_path / "survey.json"
    spec.write_text(json.dumps({"clusters": cfgs}))
    return spec


def test_spec_survey_groups_heterogeneous(ref_data, tmp_path):
    """_build_spec_survey groups by stack signature instead of failing:
    the 10-band clusters batch together, the 8-band one fits alone."""

    class _Args:
        sz_only = False
        mle = False

    spec = _write_hetero_spec(tmp_path, ref_data)
    groups = _build_spec_survey(str(spec), _Args())
    assert len(groups) == 2
    idx_sets = sorted(tuple(g[6]) for g in groups)
    assert idx_sets == [(0, 2), (1,)]
    for g in groups:
        assert g[1].flux.shape[0] == len(g[6])       # stacked SZ leaves
        n_band = g[2].counts.shape[1]
        assert n_band == (10 if len(g[6]) == 2 else 8)


def test_survey_cli_heterogeneous_merged_summary(ref_data, tmp_path):
    """End-to-end CLI on a 2-group heterogeneous spec: one merged
    summary in spec order, no StackMismatch/shape error user-facing."""
    from joxsz_tpu.survey import main

    spec = _write_hetero_spec(tmp_path, ref_data)
    out = tmp_path / "hetero_summary.json"
    main(["--spec", str(spec), "--cpu", "--walkers", "16",
          "--burn", "30", "--steps", "30", "--thin", "5",
          "--seed", "4", "--out", str(out)])
    summary = json.loads(out.read_text())
    assert [c["name"] for c in summary["clusters"]] == ["cl0", "cl1",
                                                        "cl2"]
    for c in summary["clusters"]:
        assert np.isfinite(list(c["median"].values())).all()
        assert 0.0 <= c["acceptance"] <= 1.0


def test_survey_cli_spec_population_stage_runs(ref_data, tmp_path):
    """Regression (r4 full-package review #2): --spec --population
    crashed with UnboundLocalError('sess') AFTER the whole survey fit —
    the population stage referenced a name bound only on the --mock
    branch.  The stage must complete and write its summary block."""
    from joxsz_tpu.survey import main

    spec = _write_hetero_spec(tmp_path, ref_data)
    out = tmp_path / "pop_summary.json"
    main(["--spec", str(spec), "--cpu", "--walkers", "16",
          "--burn", "20", "--steps", "20", "--thin", "5",
          "--seed", "4", "--population", "P_0", "--out", str(out)])
    summary = json.loads(out.read_text())
    assert "population" in summary
    assert np.isfinite(summary["population"]["mu"])


def _write_hetero_family_spec(tmp_path, ref_data):
    """3-cluster spec mixing MODEL FAMILIES: clusters 0 and 2 use the
    default gNFW pressure, cluster 1 uses the knot-pressure family
    (different thawed parameter vectors)."""
    cfgs = []
    for i, fam in enumerate(("gnfw", "knots", "gnfw")):
        cfg = JoXSZConfig.cl1226(str(ref_data))
        cfg.name = f"cl{i}"
        cfg.pressure_model = fam
        p = tmp_path / f"cl{i}.json"
        p.write_text(cfg.to_json())
        cfgs.append({"name": f"cl{i}", "config": str(p)})
    spec = tmp_path / "survey.json"
    spec.write_text(json.dumps({"clusters": cfgs}))
    return spec


def test_spec_survey_groups_mixed_families(ref_data, tmp_path):
    """A spec mixing model families (gnfw vs knots) splits into
    per-family groups instead of hard-erroring (VERDICT r4 #6): each
    group's session thaws its own family's parameter vector, so each
    reaches its own fused kernel specialisation downstream."""

    class _Args:
        sz_only = False
        mle = False

    spec = _write_hetero_family_spec(tmp_path, ref_data)
    groups = _build_spec_survey(str(spec), _Args())
    assert len(groups) == 2
    by_idx = {tuple(g[6]): g for g in groups}
    assert sorted(by_idx) == [(0, 2), (1,)]
    gnfw_names = list(by_idx[(0, 2)][0].params.thawed)
    knot_names = list(by_idx[(1,)][0].params.thawed)
    assert "P_0" in gnfw_names and "P_0" not in knot_names
    assert any(n.startswith("logP_") for n in knot_names)
    # per-group centers are rectangular in the group's own width
    assert by_idx[(0, 2)][3].shape == (2, len(gnfw_names))
    assert by_idx[(1,)][3].shape == (1, len(knot_names))


@pytest.mark.slow
def test_survey_cli_mixed_families_kernel_path(ref_data, tmp_path):
    """End-to-end mixed-family spec ON THE KERNEL PATH (interpret mode
    on CPU): both family groups must reach their fused cluster-grid
    kernel — no 'outside the specialisation' fallback warning — and the
    merged summary carries per-family parameter vectors in spec order
    (VERDICT r4 #6)."""
    import warnings as _warnings
    from joxsz_tpu.survey import main

    spec = _write_hetero_family_spec(tmp_path, ref_data)
    out = tmp_path / "mixed_summary.json"
    with _warnings.catch_warnings(record=True) as wrec:
        _warnings.simplefilter("always")
        bundles = main(["--spec", str(spec), "--cpu", "--step-kernel",
                        "--kernel-interpret", "--walkers", "16",
                        "--burn", "4", "--steps", "4", "--thin", "2",
                        "--seed", "5", "--out", str(out)])
    assert not [w for w in wrec
                if "step-kernel specialisation" in str(w.message)], (
        "a family group fell back to the XLA sampler")
    # both family bundles ran the kernel path (kernel timings present)
    assert isinstance(bundles, list) and len(bundles) == 2
    for fres, specs in bundles:
        assert fres.timings is not None and "setup_s" in fres.timings
        assert np.all(np.isfinite(fres.log_prob))
    summary = json.loads(out.read_text())
    assert summary["param_names"] is None
    assert len(summary["families"]) == 2
    assert [c["name"] for c in summary["clusters"]] == ["cl0", "cl1",
                                                        "cl2"]
    med0 = summary["clusters"][0]["median"]
    med1 = summary["clusters"][1]["median"]
    assert "P_0" in med0 and "P_0" not in med1
    assert med0.keys() == summary["clusters"][2]["median"].keys()
    for c in summary["clusters"]:
        assert np.isfinite(list(c["median"].values())).all()


def test_survey_cli_mixed_families_population_rejected(ref_data,
                                                       tmp_path):
    """--population pools ONE parameter across a shared family; a
    mixed-family spec must be rejected with a clear message, not crash
    downstream."""
    from joxsz_tpu.survey import main

    spec = _write_hetero_family_spec(tmp_path, ref_data)
    out = tmp_path / "pop.json"
    with pytest.raises(SystemExit, match="shared model family"):
        main(["--spec", str(spec), "--cpu", "--walkers", "16",
              "--burn", "4", "--steps", "4", "--thin", "2",
              "--population", "P_0", "--out", str(out)])


def test_merge_survey_results_restores_spec_order():
    from joxsz_tpu.survey import _merge_survey_results

    rng = np.random.default_rng(5)
    D, W, n_saved = 3, 4, 6

    def mk(names, idxs):
        C = len(idxs)
        return SurveyResult(
            cluster_names=names, param_names=["a", "b", "c"],
            chain=rng.standard_normal((n_saved, C, W, D)),
            log_prob=rng.standard_normal((n_saved, C, W)),
            acceptance=np.full((C, W), 0.25),
            medians=np.arange(C * D, dtype=float).reshape(C, D)
            + idxs[0] * 100,
            sds=np.ones((C, D)))

    r1 = mk(["c0", "c2"], [0, 2])
    r2 = mk(["c1"], [1])
    merged = _merge_survey_results([r1, r2], [[0, 2], [1]], 3)
    assert merged.cluster_names == ["c0", "c1", "c2"]
    np.testing.assert_array_equal(merged.chain[:, 0], r1.chain[:, 0])
    np.testing.assert_array_equal(merged.chain[:, 1], r2.chain[:, 0])
    np.testing.assert_array_equal(merged.chain[:, 2], r1.chain[:, 1])
    np.testing.assert_array_equal(merged.medians[1], r2.medians[0])
    assert merged.flat_chain(1).shape == (n_saved * W, D)


def test_spec_survey_splits_on_model_settings(ref_data, tmp_path):
    """r5 review: clusters sharing shapes and family but differing in
    MODEL-level settings (the physicality veto, prior boxes) must not
    batch — the group fit silently applied the first cluster's model to
    all."""

    class _Args:
        sz_only = False
        mle = False

    cfgs = []
    for i, veto in enumerate((True, False, True)):
        cfg = JoXSZConfig.cl1226(str(ref_data))
        cfg.name = f"cl{i}"
        cfg.exclude_unphysical_mass = veto
        p = tmp_path / f"cl{i}.json"
        p.write_text(cfg.to_json())
        cfgs.append({"name": f"cl{i}", "config": str(p)})
    spec = tmp_path / "survey.json"
    spec.write_text(json.dumps({"clusters": cfgs}))
    groups = _build_spec_survey(str(spec), _Args())
    assert sorted(tuple(g[6]) for g in groups) == [(0, 2), (1,)]


def test_spec_survey_splits_on_calc_integ(ref_data, tmp_path):
    """r5 review: calc_integ is static pytree metadata (no leaf-shape
    change) — mixed specs previously grouped together and died inside
    stack_sz_data, the error the docstring promises users never see."""

    class _Args:
        sz_only = False
        mle = False

    cfgs = []
    for i, integ in enumerate((False, True)):
        cfg = JoXSZConfig.cl1226(str(ref_data))
        cfg.name = f"cl{i}"
        cfg.sz.calc_integ = integ
        p = tmp_path / f"cl{i}.json"
        p.write_text(cfg.to_json())
        cfgs.append({"name": f"cl{i}", "config": str(p)})
    spec = tmp_path / "survey.json"
    spec.write_text(json.dumps({"clusters": cfgs}))
    groups = _build_spec_survey(str(spec), _Args())
    assert sorted(tuple(g[6]) for g in groups) == [(0,), (1,)]
