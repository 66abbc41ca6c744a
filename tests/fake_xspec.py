"""A stand-in XSPEC binary for end-to-end tests of the ``--backend xspec``
table driver (joxsz_tpu/tablegen/generate.py::_generate_with_xspec).

Executed as ``xspec -`` via a shim on PATH, it reads the driver's emitted
Tcl script from stdin and interprets exactly the command subset the driver
produces (``set fp [open ...]``, ``notice``, ``model phabs(apec) & ...``,
``tclout rate 1``, ``puts $fp "... [lindex $xspec_tclout 2]"``), writing the
same rates file a real HEASOFT XSPEC would — with a deterministic synthetic
rate in place of APEC physics.  This exercises the REAL subprocess path
(``shutil.which`` discovery, ``subprocess.run(["xspec", "-"], input=...)``,
output-file parsing and table assembly), unlike the mocked-``subprocess.run``
unit test, and pins the driver's Tcl against the command grammar documented
in the reference stack's XSPEC usage (/root/reference/joxsz_funcs.py:652-681
via mbproj2's XSpecHelper).

The synthetic rate is a smooth positive function of every model parameter
and the noticed band so that wrong wiring (swapped Z/T loops, band mixups,
parameter misordering) changes the answer.
"""

from __future__ import annotations

import re
import sys


def fake_rate(NH: float, T: float, Z: float, z: float,
              lo_keV: float, hi_keV: float) -> float:
    """Deterministic stand-in for the phabs(apec) model rate.

    Depends monotonically and distinctly on each argument; shared with the
    test, which recomputes it from the driver's TableSpec to verify the
    round trip bit-for-bit (the file carries full repr precision).
    """
    width = hi_keV - lo_keV
    return (1e-3 * (1.0 + T) ** 0.5 * (1.0 + 2.0 * Z)
            * (1.0 + 10.0 * NH) / (1.0 + z) * width * (1.0 + 0.1 * lo_keV))


def main() -> int:
    script = sys.stdin.read()
    fp = None
    lo = hi = None
    params = None          # (NH, T, Z, z) of the current model
    last_rate = None

    for raw in script.splitlines():
        line = raw.strip()
        if not line:
            continue
        m = re.match(r"set fp \[open (\S+) w\]$", line)
        if m:
            fp = open(m.group(1), "w")
            continue
        m = re.match(r"notice ([0-9.]+)-([0-9.]+)$", line)
        if m:
            lo, hi = float(m.group(1)), float(m.group(2))
            continue
        if line.startswith("model phabs(apec)"):
            fields = [f.strip() for f in line.split("&")]
            # model phabs(apec) & NH & T & Z & z & norm & /*
            NH, T, Z, z, norm = (float(fields[1]), float(fields[2]),
                                 float(fields[3]), float(fields[4]),
                                 float(fields[5]))
            if norm != 1.0:
                print(f"fake_xspec: expected unit norm, got {norm}",
                      file=sys.stderr)
                return 2
            params = (NH, T, Z, z)
            continue
        if line == "tclout rate 1":
            if params is None or lo is None:
                print("fake_xspec: tclout before model/notice",
                      file=sys.stderr)
                return 2
            NH, T, Z, z = params
            last_rate = fake_rate(NH, T, Z, z, lo, hi)
            continue
        m = re.match(r'puts \$fp "(\d+) (\d+) (\d+) '
                     r'\[lindex \$xspec_tclout 2\]"$', line)
        if m:
            if fp is None or last_rate is None:
                print("fake_xspec: puts before open/tclout", file=sys.stderr)
                return 2
            fp.write(f"{m.group(1)} {m.group(2)} {m.group(3)} "
                     f"{last_rate!r}\n")
            continue
        if line == "close $fp":
            if fp is not None:
                fp.close()
                fp = None
            continue
        if line in ("exit", "query yes", "abund angr", "ignore **-**"):
            continue
        if line.startswith("fakeit none"):
            continue
        print(f"fake_xspec: unrecognized command: {line!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
