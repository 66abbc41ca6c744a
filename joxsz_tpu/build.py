"""Assembly: config -> data products -> fused operators -> JointModel.

This is the framework's equivalent of the reference's ``main()`` setup
phase (/root/reference/joxsz_main.py:93-188, SURVEY.md §3.1), done once on
the host.  The output is a ``FitSession`` holding the jittable joint
log-likelihood plus everything post-processing needs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import pathlib

import numpy as np
import jax.numpy as jnp

from .config import JoXSZConfig
from .cosmology import Cosmology
from .io.readers import (
    read_xy, read_transfer_function, read_conversion_table, load_band,
)
from .geometry import (
    build_beam, build_map_geometry, build_filter_image, Annuli, MapGeometry,
)
from .ops.szkernel import build_sz_operator, SZOperator
from .models import (
    GNFWPressure, KnotPressure, VikhlininDensity, UPPTemperature,
    VikhlininTemperature, SZData, XrayData, CountRateTable, JointModel,
    build_reference_params,
)
from .tablegen import (SPECTRAL_MODEL_VERSION, TableSpec, generate_table,
                       save_table)


_DTYPES = {"float64": jnp.float64, "float32": jnp.float32,
           "bfloat16": jnp.bfloat16}


@dataclasses.dataclass
class FitSession:
    """Everything a fit run needs, fully constructed."""

    config: JoXSZConfig
    cosmology: Cosmology
    geometry: MapGeometry
    beam_2d: np.ndarray
    fwhm_arcsec: float
    filter_image: np.ndarray
    sz_operator: SZOperator
    model: JointModel
    annuli: Annuli | None = None
    bands: list | None = None

    @property
    def log_like(self):
        return self.model.log_like

    @property
    def params(self):
        return self.model.params


# bump when the operator-build NUMERICS change (cache files key on the
# config hash only; v2 = transcription-faithful PyAbel row N-2 weight)
_SZOP_VERSION = 2


def _operator_cache_path(cfg: JoXSZConfig) -> pathlib.Path:
    """Cache file keyed on ONLY the inputs the SZ operator depends on:
    map geometry (step, extent, flux-file radii), cosmology (kpc/arcsec),
    beam/TF provenance, and the Abel scheme.  Hashing the full config
    (the old scheme) rebuilt the identical operator for every sampling-
    schedule or X-ray-option tweak — data/cache accumulated byte-identical
    entries under different hashes."""
    import json as _json

    sz_inputs = dataclasses.asdict(cfg.sz)
    # fields the OPERATOR does not depend on must not key the cache:
    # conversion_file feeds the likelihood's y->mJy lerp, and the
    # integrated-Y prior options only shape SZData — hashing them
    # rebuilt byte-identical operators into duplicate cache files (the
    # exact failure mode this keying scheme was introduced to fix)
    for k in ("conversion_file", "calc_integ", "integ_mu", "integ_sig"):
        sz_inputs.pop(k, None)
    op_inputs = dict(
        step_arcsec=cfg.step_arcsec,
        cluster_extent_kpc=cfg.cluster_extent_kpc,
        redshift=cfg.redshift, H0=cfg.H0, WM=cfg.WM, WV=cfg.WV,
        abel_scheme=cfg.abel_scheme,
        sz=sz_inputs,
    )
    key = hashlib.sha256(
        (_json.dumps(op_inputs, sort_keys=True)
         + f"|szop_v{_SZOP_VERSION}").encode()
    ).hexdigest()[:16]
    repo = pathlib.Path(__file__).resolve().parents[1]
    return repo / "data" / "cache" / f"szop_{key}.npz"


def build_session(cfg: JoXSZConfig, sz_only: bool = False,
                  use_cache: bool = True) -> FitSession:
    dtype = _DTYPES[cfg.dtype]
    cosmo = Cosmology(z=cfg.redshift, H0=cfg.H0, WM=cfg.WM, WV=cfg.WV)

    # --- SZ geometry + operators -------------------------------------------
    flux = read_xy(cfg.sz.flux_file, ncol=3)
    max_r = flux[0][-1]
    beam_2d, fwhm = build_beam(
        cfg.step_arcsec, max_r, approx=cfg.sz.beam_approx,
        filename=cfg.sz.beam_file, fwhm_arcsec=cfg.sz.fwhm_beam_arcsec,
    )
    geom = build_map_geometry(cfg.step_arcsec, max_r, fwhm,
                              cosmo.kpc_per_arcsec, cfg.cluster_extent_kpc)
    if geom.r_press_kpc.size < geom.sep:
        # the SZ chain needs P (and T_SZ = P/ne) on every positive map
        # radius: map radii in kpc are exactly the first `sep` pressure
        # radii (both are multiples of step_kpc, reference convention).
        # The bundled R_b = 5000 kpc always satisfies this; a compact
        # custom extent would otherwise die in a cryptic broadcast error
        # (found by the geometry-generalization sweep, r4).
        need = geom.sep * cfg.step_arcsec * cosmo.kpc_per_arcsec
        raise ValueError(
            f"cluster_extent_kpc={cfg.cluster_extent_kpc:g} yields a "
            f"{geom.r_press_kpc.size}-point pressure grid, shorter than "
            f"the map half-axis (sep={geom.sep}): the SZ forward model "
            f"needs the pressure profile on every positive map radius. "
            f"Increase cluster_extent_kpc to >= {need:.0f} kpc (or "
            "shrink the map via step_arcsec / the flux-profile extent).")
    wn, tf = read_transfer_function(
        cfg.sz.tf_file, approx=cfg.sz.tf_approx, loc=cfg.sz.tf_loc,
        scale=cfg.sz.tf_scale, c=cfg.sz.tf_c,
    )
    filt = build_filter_image(wn, tf, geom.side, cfg.step_arcsec)

    cache = _operator_cache_path(cfg)
    op = None
    if use_cache and cache.exists():
        d = np.load(cache)
        op = SZOperator(L=d["L"], G=d["G"], w_T0=d["w_T0"], w_y0=d["w_y0"],
                        integ_w=d["integ_w"], y_prefactor=float(d["y_pref"]),
                        n_pix=int(d["n_pix"]), n_press=int(d["n_press"]))
    if op is None:
        op = build_sz_operator(geom, beam_2d, filt, flux[0],
                               abel_scheme=cfg.abel_scheme)
        if use_cache:
            cache.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(
                cache, L=op.L, G=op.G, w_T0=op.w_T0, w_y0=op.w_y0,
                integ_w=op.integ_w, y_pref=op.y_prefactor,
                n_pix=op.n_pix, n_press=op.n_press)

    conv_table = read_conversion_table(cfg.sz.conversion_file)
    sz_data = SZData.build(
        op, conv_table, flux, geom.r_press_kpc, geom.sep, dtype=dtype,
        calc_integ=cfg.sz.calc_integ, integ_mu=cfg.sz.integ_mu,
        integ_sig=cfg.sz.integ_sig,
    )

    # --- components + parameters -------------------------------------------
    if cfg.pressure_model == "gnfw":
        pressure = GNFWPressure("p")
    elif cfg.pressure_model == "knots":
        knots = np.geomspace(geom.r_press_kpc[0], geom.r_press_kpc[-1],
                             cfg.n_pressure_knots)
        pressure = KnotPressure(knots, name="p")
    else:
        raise ValueError(f"unknown pressure_model {cfg.pressure_model!r}")
    density = VikhlininDensity("ne", mode=cfg.density_mode)
    if cfg.temperature_model == "upp":
        temperature = UPPTemperature(pressure, density, "T")
    elif cfg.temperature_model == "vikhlinin":
        temperature = VikhlininTemperature("T")
    else:
        raise ValueError(
            f"unknown temperature_model {cfg.temperature_model!r}")

    annuli = None
    bands = None
    xray_data = None
    edges_logkpc = None
    if cfg.xray is not None and not sz_only:
        bands = [load_band(cfg.xray.fg_template, cfg.xray.bg_template, b)
                 for b in cfg.xray.bands_eV]
        # edges derive from the already-loaded band (BandData.edges_arcmin
        # is the same construction as annuli_edges_arcmin without
        # re-reading the file)
        annuli = Annuli(edges_arcmin=bands[0].edges_arcmin,
                        cosmology=cosmo)
        edges_logkpc = annuli.edges_logkpc
        expect = {"z": cfg.redshift, "NH_1022pcm2": cfg.xray.NH_1022pcm2,
                  "bands_eV": tuple(cfg.xray.bands_eV),
                  "model_version": SPECTRAL_MODEL_VERSION}
        table_path = cfg.xray.table_path
        if table_path is None or not pathlib.Path(table_path).exists():
            # no explicit table: use (or create) a config-keyed artifact;
            # the metadata check below guards against a stale/mismatched
            # file silently providing wrong-physics rates
            repo = pathlib.Path(__file__).resolve().parents[1]
            spec = TableSpec(
                rmf=cfg.xray.rmf, arf=cfg.xray.arf,
                bands_eV=tuple(cfg.xray.bands_eV), z=cfg.redshift,
                NH_1022pcm2=cfg.xray.NH_1022pcm2)
            key = hashlib.sha256(repr(spec).encode()).hexdigest()[:12]
            candidates = [
                repo / "data" / "tables" / f"ctrate_{key}.npz",
                repo / "data" / "tables" / "cl1226_ctrate.npz",
            ]
            table_path = None
            for cand in candidates:
                if cand.exists():
                    try:
                        CountRateTable.from_npz(str(cand), dtype=dtype,
                                                expect=expect)
                        table_path = str(cand)
                        break
                    except ValueError:
                        continue
            if table_path is None:
                table_path = str(candidates[0])
                save_table(table_path, generate_table(spec))
        table = CountRateTable.from_npz(table_path, dtype=dtype,
                                        expect=expect)
        xray_data = XrayData.build(bands, annuli, table, dtype=dtype)

    params = build_reference_params(
        pressure, density, temperature,
        Z_solar=cfg.xray.Z_solar if cfg.xray else 0.3,
        edges_logkpc=edges_logkpc,
    )
    if xray_data is None:
        # SZ-only (preprofit) mode: parameters that only the X-ray
        # likelihood constrains would wander on their priors — freeze them
        # (the density shape stays free: T_SZ = P/ne feeds the conversion)
        for name in ("Z", "backscale", "log(T_X/T_{SZ})", "line_scale"):
            if name in params:
                params.freeze(name)
    elif cfg.xray is not None and cfg.xray.line_systematic:
        # marginalize the fallback spectral model's line-emissivity
        # systematic (N(1, 0.25) nuisance on the metal-line table
        # component — see build_reference_params)
        params.thaw("line_scale")

    model = JointModel(
        pressure=pressure, density=density, temperature=temperature,
        params=params, sz_data=sz_data, xray_data=xray_data,
        exclude_unphysical_mass=cfg.exclude_unphysical_mass,
    )
    return FitSession(
        config=cfg, cosmology=cosmo, geometry=geom, beam_2d=beam_2d,
        fwhm_arcsec=fwhm, filter_image=filt, sz_operator=op, model=model,
        annuli=annuli, bands=bands,
    )
