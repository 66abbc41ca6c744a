"""Tests for the reference-stack XSPEC cache importer
(tablegen.import_xspec_cache): exact roundtrip from a synthetic
countrate_cache.hdf5 written the way the reference writes it
(/root/reference/joxsz_funcs.py:660-678), loud failures on missing or
mismatched keys, and loadability of the imported artifact."""

import json

import numpy as np
import pytest

from joxsz_tpu.tablegen.generate import (SPECTRAL_MODEL_VERSION, TableSpec,
                                         save_table)
from joxsz_tpu.tablegen.import_xspec_cache import (CacheKeyError,
                                                   import_cache, read_cache)

BANDS = ((700, 1000), (1000, 1300), (2000, 2700))
Z, NH = 0.888, 0.0183
# paths as they'd look on the HEASOFT box: different from ours, with
# underscores inside, '/' replaced by '@' in the textkey
RMF_REMOTE = "/heasoft/work/cl_1226/source_v2.rmf"
ARF_REMOTE = "/heasoft/work/cl_1226/source_v2.arf"
NT = 64


def _reference_textkey(emin_keV, emax_keV, z, nh, rmf, arf):
    """Exactly the reference's construction (joxsz_funcs.py:661)."""
    key = (emin_keV, emax_keV, z, nh, rmf, arf)
    return "_".join(str(x) for x in key).replace("/", "@")


def _synthetic_rates(seed, nT=NT):
    rng = np.random.default_rng(seed)
    rates = np.exp(rng.normal(-3.0, 1.0, size=(2, nT)))
    rates[0, 0] = 5e-301          # exercise the 1e-300 floor
    return np.clip(rates, 1e-300, None)


@pytest.fixture
def cache_file(tmp_path):
    import h5py

    path = tmp_path / "countrate_cache.hdf5"
    truth = {}
    with h5py.File(path, "w") as f:
        for i, (lo, hi) in enumerate(BANDS):
            rates = _synthetic_rates(i)
            tk = _reference_textkey(lo / 1000.0, hi / 1000.0, Z, NH,
                                    RMF_REMOTE, ARF_REMOTE)
            f[tk] = rates
            truth[(lo, hi)] = rates
    return path, truth


def _spec(bands=BANDS, z=Z, nh=NH):
    return TableSpec(rmf="data/X/source_v2.rmf", arf="data/X/source_v2.arf",
                     bands_eV=bands, z=z, NH_1022pcm2=nh)


def test_roundtrip_exact(cache_file, tmp_path):
    path, truth = cache_file
    table = import_cache(str(path), _spec())
    for i, (lo, hi) in enumerate(BANDS):
        np.testing.assert_allclose(table["lograte_Z0"][i],
                                   np.log(truth[(lo, hi)][0]), rtol=0, atol=0)
        np.testing.assert_allclose(table["lograte_Z1"][i],
                                   np.log(truth[(lo, hi)][1]), rtol=0, atol=0)
    assert table["Tlog"].shape == (NT,)
    np.testing.assert_allclose(table["Tlog"][0], np.log(0.06))
    np.testing.assert_allclose(table["Tlog"][-1], np.log(60.0))
    meta = json.loads(table["meta"].item())
    assert meta["backend"] == "xspec-cache"
    assert meta["z"] == Z and meta["NH_1022pcm2"] == NH
    assert len(meta["source_keys"]) == len(BANDS)

    # the artifact loads under the full metadata guard: xspec-cache is
    # exact physics and exempt from the fallback model_version check
    from joxsz_tpu.models.xray import CountRateTable

    out = tmp_path / "imported.npz"
    save_table(str(out), table)
    tbl = CountRateTable.from_npz(str(out), expect={
        "z": Z, "NH_1022pcm2": NH, "bands_eV": BANDS,
        "model_version": SPECTRAL_MODEL_VERSION + 99})
    assert tbl.lograte_Z0.shape == (len(BANDS), NT)


def test_imported_rates_interpolate(cache_file, tmp_path):
    """The runtime lerp over an imported table hits the stored grid
    values exactly at the nodes."""
    import jax.numpy as jnp

    from joxsz_tpu.models.xray import CountRateTable

    path, truth = cache_file
    save_table(str(tmp_path / "t.npz"), import_cache(str(path), _spec()))
    tbl = CountRateTable.from_npz(str(tmp_path / "t.npz"))
    Tlog = np.asarray(tbl.Tlog)
    got = np.asarray(tbl.rates(jnp.exp(jnp.asarray(Tlog[7])), 0.0))
    want = np.array([truth[b][0][7] for b in BANDS])
    np.testing.assert_allclose(got.ravel(), want, rtol=1e-6)
    got1 = np.asarray(tbl.rates(jnp.exp(jnp.asarray(Tlog[7])), 1.0))
    want1 = np.array([truth[b][1][7] for b in BANDS])
    np.testing.assert_allclose(got1.ravel(), want1, rtol=1e-6)


def test_float_string_tolerance(tmp_path):
    """str(float) formatting differences ('0.7' vs '0.70') between the
    generating box and our config must not break matching."""
    import h5py

    path = tmp_path / "c.hdf5"
    with h5py.File(path, "w") as f:
        f["0.70_1.00_0.8880_0.01830_src.rmf_src.arf"] = _synthetic_rates(0)
    table = import_cache(str(path), TableSpec(
        rmf="src.rmf", arf="src.arf", bands_eV=((700, 1000),), z=0.888,
        NH_1022pcm2=0.0183))
    assert table["lograte_Z0"].shape == (1, NT)


def test_missing_band_fails_loudly(cache_file):
    path, _ = cache_file
    with pytest.raises(CacheKeyError, match="not found"):
        import_cache(str(path), _spec(bands=BANDS + ((5000, 7000),)))


def test_wrong_z_or_nh_fails_loudly(cache_file):
    path, _ = cache_file
    with pytest.raises(CacheKeyError, match="not found"):
        import_cache(str(path), _spec(z=0.3))
    with pytest.raises(CacheKeyError, match="not found"):
        import_cache(str(path), _spec(nh=0.1))


def test_wrong_response_fails_loudly(cache_file):
    path, _ = cache_file
    spec = TableSpec(rmf="other.rmf", arf="other.arf", bands_eV=BANDS,
                     z=Z, NH_1022pcm2=NH)
    with pytest.raises(CacheKeyError, match="different responses"):
        import_cache(str(path), spec)


def test_basename_suffix_does_not_match(cache_file):
    """Regression (r4 self-review #3): the cache holds source_v2.rmf;
    asking for the SUFFIX v2.rmf (a different file) must NOT silently
    match — response matching is exact-basename, not substring."""
    path, _ = cache_file
    spec = TableSpec(rmf="v2.rmf", arf="v2.arf", bands_eV=BANDS,
                     z=Z, NH_1022pcm2=NH)
    with pytest.raises(CacheKeyError, match="different responses"):
        import_cache(str(path), spec)


def test_underscored_basenames_match(tmp_path):
    """Basenames containing '_' (and '@'-mapped directories) still match
    exactly through the unknown rmf/arf join boundary."""
    import h5py

    path = tmp_path / "cache.hdf5"
    with h5py.File(path, "w") as f:
        f[_reference_textkey(0.7, 1.0, Z, NH, "/d_a/xmm_source.rmf",
                             "/d_a/xmm_source.arf")] = _synthetic_rates(0)
    ok = TableSpec(rmf="xmm_source.rmf", arf="xmm_source.arf",
                   bands_eV=((700, 1000),), z=Z, NH_1022pcm2=NH)
    table = import_cache(str(path), ok)
    assert table["lograte_Z0"].shape[0] == 1
    bad = TableSpec(rmf="source.rmf", arf="source.arf",
                    bands_eV=((700, 1000),), z=Z, NH_1022pcm2=NH)
    with pytest.raises(CacheKeyError, match="different responses"):
        import_cache(str(path), bad)


def test_inconsistent_nT_fails(tmp_path):
    import h5py

    path = tmp_path / "c.hdf5"
    with h5py.File(path, "w") as f:
        f[_reference_textkey(0.7, 1.0, Z, NH, "s.rmf", "s.arf")] = \
            _synthetic_rates(0, nT=64)
        f[_reference_textkey(1.0, 1.3, Z, NH, "s.rmf", "s.arf")] = \
            _synthetic_rates(1, nT=32)
    spec = TableSpec(rmf="s.rmf", arf="s.arf",
                     bands_eV=((700, 1000), (1000, 1300)), z=Z,
                     NH_1022pcm2=NH)
    with pytest.raises(CacheKeyError, match="inconsistent"):
        import_cache(str(path), spec)


def test_bad_shape_fails(tmp_path):
    import h5py

    path = tmp_path / "c.hdf5"
    with h5py.File(path, "w") as f:
        f[_reference_textkey(0.7, 1.0, Z, NH, "s.rmf", "s.arf")] = \
            np.zeros((3, 5, 2))
    with pytest.raises(CacheKeyError, match="shape"):
        read_cache(str(path))


def test_empty_cache_fails(tmp_path):
    import h5py

    path = tmp_path / "c.hdf5"
    with h5py.File(path, "w") as f:
        f["not_a_valid_key"] = np.zeros(3)
    with pytest.raises(CacheKeyError, match="no parseable"):
        read_cache(str(path))


def test_ambiguous_duplicate_fails(tmp_path):
    """Two textkeys that parse to the same numeric key + responses (a
    hand-edited cache) must be rejected, not silently picked from."""
    import h5py

    path = tmp_path / "c.hdf5"
    with h5py.File(path, "w") as f:
        f["0.7_1.0_0.888_0.0183_s.rmf_s.arf"] = _synthetic_rates(0)
        f["0.70_1.00_0.888_0.0183_s.rmf_s.arf"] = _synthetic_rates(1)
    spec = TableSpec(rmf="s.rmf", arf="s.arf", bands_eV=((700, 1000),),
                     z=Z, NH_1022pcm2=NH)
    with pytest.raises(CacheKeyError, match="ambiguous"):
        import_cache(str(path), spec)


def test_cli_roundtrip(cache_file, tmp_path):
    from joxsz_tpu.tablegen import import_xspec_cache as mod

    path, truth = cache_file
    out = tmp_path / "out.npz"
    mod.main(["--cache", str(path), "--rmf", "data/X/source_v2.rmf",
              "--arf", "data/X/source_v2.arf", "--z", str(Z),
              "--nh", str(NH),
              "--bands", ",".join(f"{a}:{b}" for a, b in BANDS),
              "--out", str(out)])
    d = np.load(str(out))
    np.testing.assert_allclose(d["lograte_Z1"][2],
                               np.log(truth[BANDS[2]][1]))
