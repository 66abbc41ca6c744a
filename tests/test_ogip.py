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
