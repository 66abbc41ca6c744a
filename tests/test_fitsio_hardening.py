"""fitsio hardening: FITS features the minimal parser does not
implement must raise UnsupportedFITSError loudly instead of silently
misreading (VERDICT r3 #6; astropy generality being replaced is
/root/reference/joxsz_funcs.py:16-28).  All files are synthetic."""

import numpy as np
import pytest

from joxsz_tpu.io.fitsio import (BLOCK, UnsupportedFITSError, find_hdu,
                                 read_fits)


def _card(key, value=None, string=False):
    if value is None:
        return key.ljust(80)
    v = f"'{value}'" if string else (
        "T" if value is True else "F" if value is False else str(value))
    return f"{key.ljust(8)}= {v}".ljust(80)


def _header(cards):
    text = "".join(cards) + "END".ljust(80)
    pad = (-len(text)) % BLOCK
    return (text + " " * pad).encode("ascii")


def _pad_block(data: bytes) -> bytes:
    return data + b"\0" * ((-len(data)) % BLOCK)


def write_fits(path, extra_table_cards=(), extra_primary_cards=(),
               tform2="1J", naxis1=None):
    """Minimal 2-column BINTABLE (3E array col + scalar col) with
    injectable header cards."""
    nrows = 2
    col1 = np.arange(6, dtype=">f4").reshape(nrows, 3)
    col2 = np.array([7, 9], dtype=">i4")
    rowlen = naxis1 if naxis1 is not None else 12 + col2.itemsize
    primary = _header([_card("SIMPLE", True), _card("BITPIX", 8),
                       _card("NAXIS", 0), *extra_primary_cards])
    table_hdr = _header([
        _card("XTENSION", "BINTABLE", string=True), _card("BITPIX", 8),
        _card("NAXIS", 2), _card("NAXIS1", rowlen), _card("NAXIS2", nrows),
        _card("PCOUNT", 0), _card("GCOUNT", 1), _card("TFIELDS", 2),
        _card("TTYPE1", "ARR", string=True),
        _card("TFORM1", "3E", string=True),
        _card("TTYPE2", "VAL", string=True),
        _card("TFORM2", tform2, string=True),
        _card("EXTNAME", "TAB", string=True),
        *extra_table_cards,
    ])
    rows = b"".join(col1[i].tobytes() + col2[i:i+1].tobytes()
                    for i in range(nrows))
    path.write_bytes(primary + table_hdr + _pad_block(rows))
    return path


def test_baseline_synthetic_roundtrip(tmp_path):
    """The builder itself produces a file the parser reads exactly —
    guards every rejection test below against testing a broken file."""
    hdus = read_fits(str(write_fits(tmp_path / "ok.fits")))
    tab = find_hdu(hdus, "TAB")
    np.testing.assert_array_equal(tab.column("ARR"),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(tab.column("VAL"), [7, 9])


@pytest.mark.parametrize("cards,msg", [
    ([_card("TSCAL2", 2.0)], "TSCAL2"),
    ([_card("TZERO2", 32768)], "TZERO2"),        # unsigned-int convention
    ([_card("TNULL2", -999)], "TNULL2"),
    ([_card("ZIMAGE", True)], "compressed"),
    ([_card("ZTABLE", True)], "compressed"),
])
def test_unscaled_only_columns(tmp_path, cards, msg):
    hdus = read_fits(str(write_fits(tmp_path / "f.fits",
                                    extra_table_cards=cards)))
    with pytest.raises(UnsupportedFITSError, match=msg):
        find_hdu(hdus, "TAB").column("VAL")


def test_trivial_scaling_accepted(tmp_path):
    """TSCAL=1/TZERO=0 are identity — must still read."""
    cards = [_card("TSCAL2", 1.0), _card("TZERO2", 0)]
    hdus = read_fits(str(write_fits(tmp_path / "f.fits",
                                    extra_table_cards=cards)))
    np.testing.assert_array_equal(find_hdu(hdus, "TAB").column("VAL"),
                                  [7, 9])


@pytest.mark.parametrize("tform", ["1X", "1C", "1M", "1QE(5)", "??"])
def test_unimplemented_column_types(tmp_path, tform):
    # rowlen is wrong for these types, but the TFORM rejection fires
    # first (layout is parsed before width validation uses it)
    hdus = read_fits(str(write_fits(tmp_path / "f.fits", tform2=tform)))
    with pytest.raises(UnsupportedFITSError,
                       match="TFORM|not implemented"):
        find_hdu(hdus, "TAB").column("ARR")


def test_row_width_mismatch(tmp_path):
    hdus = read_fits(str(write_fits(tmp_path / "f.fits", naxis1=99)))
    with pytest.raises(UnsupportedFITSError, match="NAXIS1"):
        find_hdu(hdus, "TAB").column("ARR")


def test_random_groups_rejected(tmp_path):
    p = write_fits(tmp_path / "f.fits",
                   extra_primary_cards=[_card("GROUPS", True),
                                        _card("PCOUNT", 1),
                                        _card("GCOUNT", 3)])
    with pytest.raises(UnsupportedFITSError, match="random-groups"):
        read_fits(str(p))


def test_bundled_files_still_parse(ref_data):
    """The hardening must not reject the real NIKA products."""
    from joxsz_tpu.io.readers import read_beam_profile

    r, b = read_beam_profile(str(ref_data / "SZ/Beam150GHz.fits"))
    assert r.size > 10 and np.all(np.isfinite(b))
