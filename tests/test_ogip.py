"""Direct OGIP response-parsing tests on the bundled Chandra files."""

import numpy as np
import pytest

from joxsz_tpu.io.ogip import read_rmf, read_arf, load_response


def test_rmf_dense_expansion(ref_data):
    r = read_rmf(str(ref_data / "X/source.rmf"))
    assert r.matrix.shape == (1070, 1024)
    # a redistribution matrix row is a probability distribution
    sums = r.matrix.sum(axis=1)
    assert np.all(sums > 0.97) and np.all(sums < 1.03)
    assert np.all(r.energ_hi > r.energ_lo)
    # response is concentrated near the diagonal: the peak output channel
    # energy tracks the input energy
    peak_chan = r.matrix.argmax(axis=1)
    peak_e = 0.5 * (r.chan_e_min + r.chan_e_max)[peak_chan]
    mid = r.energ_mid
    sel = (mid > 1.0) & (mid < 8.0)
    assert np.all(np.abs(peak_e[sel] - mid[sel]) / mid[sel] < 0.15)


def test_arf_and_folding(ref_data):
    lo, hi, area = read_arf(str(ref_data / "X/source.arf"))
    assert area.shape == (1070,)
    assert area.max() > 100.0          # Chandra ACIS effective area (cm^2)
    resp = load_response(str(ref_data / "X/source.rmf"),
                         str(ref_data / "X/source.arf"))
    folded = resp.folded()
    assert folded.shape == (1070, 1024)
    assert np.isclose(folded.sum(axis=1), resp.specresp * resp.matrix.sum(axis=1)).all()


def test_channel_masks_partition(ref_data):
    resp = load_response(str(ref_data / "X/source.rmf"),
                         str(ref_data / "X/source.arf"))
    bands = ((700, 1000), (1000, 1300), (1300, 1600))
    masks = [resp.channel_mask(lo / 1e3, hi / 1e3) for lo, hi in bands]
    for m in masks:
        assert m.sum() > 0
    # contiguous bands must not share channels
    assert not np.any(masks[0] & masks[1])
    assert not np.any(masks[1] & masks[2])


# ---- F_CHAN channel-origin conventions (r5 review finding) -------------

from tests.test_fitsio_hardening import _card, _header, _pad_block


def _write_rmf(path, *, f_chan, tlmin4=None, eb_first=1):
    """Minimal synthetic RMF: 2 energy rows x 4 channels, one group per
    row of 2 values, with controllable F_CHAN values, optional TLMIN on
    the F_CHAN column, and a controllable EBOUNDS first channel."""
    nE, nC = 2, 4
    primary = _header([_card("SIMPLE", True), _card("BITPIX", 8),
                       _card("NAXIS", 0)])
    mat_cards = [
        _card("XTENSION", "BINTABLE", string=True), _card("BITPIX", 8),
        _card("NAXIS", 2), _card("NAXIS1", 28),
        _card("NAXIS2", nE), _card("PCOUNT", 0), _card("GCOUNT", 1),
        _card("TFIELDS", 6),
        _card("TTYPE1", "ENERG_LO", string=True),
        _card("TFORM1", "1E", string=True),
        _card("TTYPE2", "ENERG_HI", string=True),
        _card("TFORM2", "1E", string=True),
        _card("TTYPE3", "N_GRP", string=True),
        _card("TFORM3", "1J", string=True),
        _card("TTYPE4", "F_CHAN", string=True),
        _card("TFORM4", "1J", string=True),
        _card("TTYPE5", "N_CHAN", string=True),
        _card("TFORM5", "1J", string=True),
        _card("TTYPE6", "MATRIX", string=True),
        _card("TFORM6", "2E", string=True),
        _card("EXTNAME", "MATRIX", string=True),
    ]
    if tlmin4 is not None:
        mat_cards.append(_card("TLMIN4", tlmin4))
    rows = b""
    vals = [(0.7, 0.3), (0.6, 0.4)]
    for e in range(nE):
        rows += np.array([1.0 + e, 1.5 + e], dtype=">f4").tobytes()
        rows += np.array([1], dtype=">i4").tobytes()            # N_GRP
        rows += np.array([f_chan[e]], dtype=">i4").tobytes()
        rows += np.array([2], dtype=">i4").tobytes()            # N_CHAN
        rows += np.array(vals[e], dtype=">f4").tobytes()
    eb_cards = [
        _card("XTENSION", "BINTABLE", string=True), _card("BITPIX", 8),
        _card("NAXIS", 2), _card("NAXIS1", 4 + 4 + 4),
        _card("NAXIS2", nC), _card("PCOUNT", 0), _card("GCOUNT", 1),
        _card("TFIELDS", 3),
        _card("TTYPE1", "CHANNEL", string=True),
        _card("TFORM1", "1J", string=True),
        _card("TTYPE2", "E_MIN", string=True),
        _card("TFORM2", "1E", string=True),
        _card("TTYPE3", "E_MAX", string=True),
        _card("TFORM3", "1E", string=True),
        _card("EXTNAME", "EBOUNDS", string=True),
    ]
    eb_rows = b""
    for c in range(nC):
        eb_rows += np.array([eb_first + c], dtype=">i4").tobytes()
        eb_rows += np.array([0.5 + 0.5 * c, 1.0 + 0.5 * c],
                            dtype=">f4").tobytes()
    path.write_bytes(primary + _header(mat_cards) + _pad_block(rows)
                     + _header(eb_cards) + _pad_block(eb_rows))
    return str(path)


def test_rmf_fchan_origin_from_tlmin(tmp_path):
    """0-based F_CHAN (TLMIN4=0) with 1-based EBOUNDS numbering: the
    F_CHAN origin must come from TLMIN, not EBOUNDS CHANNEL[0] — the
    old code shifted every row by one channel (and wrapped a -1 start
    to the row END, silently corrupting the response)."""
    p = _write_rmf(tmp_path / "a.rmf", f_chan=[0, 2], tlmin4=0,
                   eb_first=1)
    r = read_rmf(p)
    np.testing.assert_allclose(r.matrix[0], [0.7, 0.3, 0.0, 0.0])
    np.testing.assert_allclose(r.matrix[1], [0.0, 0.0, 0.6, 0.4])


def test_rmf_fchan_origin_fallback_to_ebounds(tmp_path):
    """Without TLMIN the EBOUNDS first channel stays the origin (the
    bundled-Chandra convention)."""
    p = _write_rmf(tmp_path / "b.rmf", f_chan=[1, 3], eb_first=1)
    r = read_rmf(p)
    np.testing.assert_allclose(r.matrix[0], [0.7, 0.3, 0.0, 0.0])
    np.testing.assert_allclose(r.matrix[1], [0.0, 0.0, 0.6, 0.4])


def test_rmf_inconsistent_channel_numbering_rejected(tmp_path):
    """0-based F_CHAN with NO TLMIN and 1-based EBOUNDS: the origin is
    genuinely ambiguous and the computed start is negative — must raise
    loudly instead of wrap-writing response values."""
    p = _write_rmf(tmp_path / "c.rmf", f_chan=[0, 2], eb_first=1)
    with pytest.raises(ValueError, match="channel numbering"):
        read_rmf(p)
