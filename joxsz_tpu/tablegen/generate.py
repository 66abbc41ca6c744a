"""Offline count-rate table generation (the only XSPEC-adjacent tool).

Produces the versioned artifact the runtime X-ray model interpolates
(``models.xray.CountRateTable``): per band, cts/s per unit XSPEC norm on a
log-T grid at Z = 0 and Z = 1 solar, plus bolometric flux tables for
cooling-time profiles.  Replaces the reference's delete-and-rebuild XSPEC
cache cycle (/root/reference/joxsz_main.py:113, joxsz_funcs.py:652-681) with
an explicit, reusable artifact.

Backends:
  * 'native'  — C++ core (native/tablegen, via ctypes), the default when the
                shared library is built;
  * 'numpy'   — pure-Python reference implementation (always available,
                cross-checked against the native core in tests);
  * 'xspec'   — drives a real HEASOFT XSPEC binary via subprocess when one
                is installed, for APEC-exact tables (not available in CI).

CLI:
    python -m joxsz_tpu.tablegen.generate \
        --rmf data/X/source.rmf --arf data/X/source.arf \
        --z 0.888 --nh 0.0183 --out data/tables/cl1226_ctrate.npz
"""

from __future__ import annotations

import ctypes
import dataclasses
import json
import os
import pathlib
import shutil
import subprocess

import numpy as np

from ..io.ogip import Response, load_response
from . import spectrum as sp

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native" / "tablegen"
_NATIVE_LIB = _NATIVE_DIR / "libjoxsz_tablegen.so"

# mbproj2-compatible default grid: log-spaced temperatures spanning the
# physical range of cluster plasmas
DEFAULT_TMIN = 0.06
DEFAULT_TMAX = 60.0
DEFAULT_NT = 64


def _load_native():
    if not _NATIVE_LIB.exists():
        return None
    lib = ctypes.CDLL(str(_NATIVE_LIB))
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.jx_count_rate_table.argtypes = [
        dptr, dptr, dptr, ctypes.c_int64, ctypes.c_int64,
        dptr, ctypes.c_int64, dptr, ctypes.c_int64, dptr, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, dptr,
    ]
    lib.jx_observed_spectrum.argtypes = [
        dptr, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, dptr,
    ]
    lib.jx_bolometric_flux.restype = ctypes.c_double
    lib.jx_bolometric_flux.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int64,
    ]
    return lib


def build_native(force: bool = False) -> bool:
    """Compile the C++ core if a toolchain is available.

    Always invokes make when a toolchain exists — make's own mtime check
    decides whether to rebuild, so an edited ``tablegen.cpp`` can never
    be shadowed by a stale committed ``.so`` (r4 review; the old
    existence short-circuit did exactly that).  Without a toolchain the
    committed binary is used as-is."""
    if shutil.which("make") is None or shutil.which("g++") is None:
        return _NATIVE_LIB.exists() and not force
    try:
        cmd = ["make", "-C", str(_NATIVE_DIR)]
        if force:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "clean"],
                           check=True, capture_output=True)
        subprocess.run(cmd, check=True, capture_output=True)
        return _NATIVE_LIB.exists()
    except subprocess.CalledProcessError:
        return _NATIVE_LIB.exists() and not force


def _rates_numpy(resp: Response, band_masks: np.ndarray, T_grid, Z_grid,
                 z: float, NH_1022: float) -> np.ndarray:
    """(nZ, nT, n_band) count rates per unit norm, numpy path."""
    folded = resp.folded()                       # (nE, nC)
    e_mid, e_wid = resp.energ_mid, resp.energ_width
    out = np.zeros((len(Z_grid), len(T_grid), band_masks.shape[0]))
    for iz, Z in enumerate(Z_grid):
        for it, T in enumerate(T_grid):
            f = sp.observed_photon_flux(e_mid, T, Z, z, NH_1022) * e_wid
            chan = f @ folded                    # (nC,)
            out[iz, it] = band_masks @ chan
    return out


def _rates_native(lib, resp: Response, band_masks: np.ndarray, T_grid,
                  Z_grid, z: float, NH_1022: float) -> np.ndarray:
    folded = np.ascontiguousarray(resp.folded())
    e_mid = np.ascontiguousarray(resp.energ_mid)
    e_wid = np.ascontiguousarray(resp.energ_width)
    bm = np.ascontiguousarray(band_masks, dtype=float)
    T = np.ascontiguousarray(T_grid, dtype=float)
    Z = np.ascontiguousarray(Z_grid, dtype=float)
    nE, nC = folded.shape
    out = np.zeros((Z.size, T.size, bm.shape[0]))
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.jx_count_rate_table(p(folded), p(e_mid), p(e_wid), nE, nC,
                            p(bm), bm.shape[0], p(T), T.size, p(Z), Z.size,
                            z, NH_1022, p(out))
    return out


# bump when the spectral model changes: the value is part of TableSpec's
# repr, which keys the auto-generated artifact filenames (build.py), so
# stale tables regenerate instead of silently serving old physics.
# v2 = calibrated 18-complex line model (Fe XXV/XXVI split, asymmetric
# log-T responses, published-EW anchors).
SPECTRAL_MODEL_VERSION = 2


@dataclasses.dataclass(frozen=True)
class TableSpec:
    rmf: str
    arf: str
    bands_eV: tuple
    z: float
    NH_1022pcm2: float
    Tmin: float = DEFAULT_TMIN
    Tmax: float = DEFAULT_TMAX
    nT: int = DEFAULT_NT
    model_version: int = SPECTRAL_MODEL_VERSION


def generate_table(spec: TableSpec, backend: str = "auto") -> dict:
    """Generate all table arrays.  Returns a dict ready for np.savez."""
    resp = load_response(spec.rmf, spec.arf)
    band_masks = np.stack([
        resp.channel_mask(lo / 1000.0, hi / 1000.0).astype(float)
        for lo, hi in spec.bands_eV
    ])
    if np.any(band_masks.sum(axis=1) == 0):
        raise ValueError("a band selects no channels")

    Tlog = np.linspace(np.log(spec.Tmin), np.log(spec.Tmax), spec.nT)
    T_grid = np.exp(Tlog)
    Z_grid = np.array([0.0, 1.0])

    lib = None
    if backend in ("auto", "native"):
        build_native()
        lib = _load_native()
        if lib is None and backend == "native":
            raise RuntimeError("native tablegen core not built")
    if backend == "xspec":
        return _generate_with_xspec(spec, resp, band_masks, Tlog)

    if lib is not None:
        rates = _rates_native(lib, resp, band_masks, T_grid, Z_grid,
                              spec.z, spec.NH_1022pcm2)
    else:
        rates = _rates_numpy(resp, band_masks, T_grid, Z_grid,
                             spec.z, spec.NH_1022pcm2)
    rates = np.clip(rates, 1e-300, None)

    if lib is not None:
        bolo = np.array([
            [lib.jx_bolometric_flux(float(T), float(Z), spec.z, 0.01, 100.0,
                                    4000) for T in T_grid]
            for Z in Z_grid
        ])
    else:
        bolo = np.array([
            [sp.bolometric_flux_per_norm(T, Z, spec.z) for T in T_grid]
            for Z in Z_grid
        ])
    bolo = np.clip(bolo, 1e-300, None)

    return {
        "Tlog": Tlog,
        "lograte_Z0": np.log(rates[0]).T,   # (n_band, nT)
        "lograte_Z1": np.log(rates[1]).T,
        "logflux_Z0": np.log(bolo[0]),
        "logflux_Z1": np.log(bolo[1]),
        "bands_eV": np.asarray(spec.bands_eV, dtype=float),
        "meta": np.bytes_(json.dumps({
            "z": spec.z, "NH_1022pcm2": spec.NH_1022pcm2,
            "rmf": os.path.basename(spec.rmf),
            "arf": os.path.basename(spec.arf),
            "backend": "native" if lib is not None else "numpy",
            "model_version": spec.model_version,
            "model": "ff+lines fallback (regenerate with --backend xspec "
                     "for APEC-exact rates)",
        }).encode()),
    }


def _generate_with_xspec(spec, resp, band_masks, Tlog):
    """Drive a real XSPEC binary (HEASOFT) to tabulate phabs*apec count
    rates — the parity path for production tables (matches the reference's
    use of XSPEC through mbproj2, /root/reference/joxsz_funcs.py:664-676).

    For each band we load a fake spectrum bound to the real RMF/ARF,
    restrict to the band's energy range, set ``model phabs(apec)`` with
    norm = 1, step the temperature over the grid at Z = 0 and Z = 1, and
    read the predicted model rate from ``tclout rate``.  Requires a
    HEASOFT environment (not present in CI — the analytic backend covers
    that); the emitted script is plain XSPEC/Tcl.
    """
    if shutil.which("xspec") is None:
        raise RuntimeError("xspec binary not found on PATH")
    import tempfile

    T_grid = np.exp(Tlog)
    Z_grid = (0.0, 1.0)
    n_band = len(spec.bands_eV)
    rates = np.zeros((len(Z_grid), len(T_grid), n_band))

    with tempfile.TemporaryDirectory() as td:
        script = pathlib.Path(td) / "rates.xcm"
        out_path = pathlib.Path(td) / "rates.dat"
        lines = [
            "query yes",
            "abund angr",
            # fake 1-count spectrum so XSPEC accepts the responses
            f"fakeit none & {spec.rmf} & {spec.arf} & y & & "
            f"{td}/fake.pha & 1.0",
        ]
        lines.append(f"set fp [open {out_path} w]")
        for ib, (lo, hi) in enumerate(spec.bands_eV):
            lines += [
                "ignore **-**",
                f"notice {lo/1000.0:.6f}-{hi/1000.0:.6f}",
            ]
            for iz, Z in enumerate(Z_grid):
                for it, T in enumerate(T_grid):
                    lines += [
                        f"model phabs(apec) & {spec.NH_1022pcm2} & "
                        f"{T:.6g} & {Z} & {spec.z} & 1.0 & /*",
                        "tclout rate 1",
                        # field 3 of tclout rate = predicted model rate
                        f'puts $fp "{iz} {it} {ib} [lindex $xspec_tclout 2]"',
                    ]
        lines += ["close $fp", "exit"]
        script.write_text("\n".join(lines) + "\n")
        subprocess.run(["xspec", "-"], input=script.read_text(),
                       capture_output=True, text=True, timeout=3600,
                       check=True)
        for row in out_path.read_text().split("\n"):
            if not row.strip():
                continue
            iz, it, ib, r = row.split()
            rates[int(iz), int(it), int(ib)] = float(r)

    rates = np.clip(rates, 1e-300, None)
    bolo = np.array([
        [sp.bolometric_flux_per_norm(T, Z, spec.z) for T in T_grid]
        for Z in Z_grid
    ])
    bolo = np.clip(bolo, 1e-300, None)
    return {
        "Tlog": Tlog,
        "lograte_Z0": np.log(rates[0]).T,
        "lograte_Z1": np.log(rates[1]).T,
        "logflux_Z0": np.log(bolo[0]),
        "logflux_Z1": np.log(bolo[1]),
        "bands_eV": np.asarray(spec.bands_eV, dtype=float),
        "meta": np.bytes_(json.dumps({
            "z": spec.z, "NH_1022pcm2": spec.NH_1022pcm2,
            "rmf": os.path.basename(spec.rmf),
            "arf": os.path.basename(spec.arf),
            # model_version tracks the FALLBACK spectral model; XSPEC
            # tables are exact-physics and exempt from the version check
            "backend": "xspec", "model": "phabs(apec)",
            "model_version": spec.model_version,
        }).encode()),
    }


def save_table(path: str, table: dict):
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **table)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--rmf", required=True)
    ap.add_argument("--arf", required=True)
    ap.add_argument("--z", type=float, required=True)
    ap.add_argument("--nh", type=float, required=True,
                    help="column density in 1e22 cm^-2")
    ap.add_argument("--bands", default="700:1000,1000:1300,1300:1600,"
                    "1600:2000,2000:2700,2700:3400,3400:3800,3800:4300,"
                    "4300:5000,5000:7000",
                    help="comma-separated eV bands lo:hi")
    ap.add_argument("--out", required=True)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "native", "numpy", "xspec"])
    ap.add_argument("--nT", type=int, default=DEFAULT_NT)
    args = ap.parse_args(argv)

    bands = tuple(tuple(int(x) for x in b.split(":"))
                  for b in args.bands.split(","))
    spec = TableSpec(rmf=args.rmf, arf=args.arf, bands_eV=bands, z=args.z,
                     NH_1022pcm2=args.nh, nT=args.nT)
    table = generate_table(spec, backend=args.backend)
    save_table(args.out, table)
    print(f"wrote {args.out}: {len(bands)} bands, nT={args.nT}, "
          f"backend={json.loads(table['meta'].item())['backend']}")


if __name__ == "__main__":
    main()
