"""Synthetic-instrument dataset builder for the geometry-generalization
sweep (VERDICT r3 task 3).

Every current test orbits the bundled CL J1226 shapes (map side 173,
313-point pressure grid, 15 annuli, 10 bands, nT=64).  A *framework*
claim requires shape generality, so this builder fabricates a complete
instrument configuration — SZ flux profile, beam, transfer function,
conversion table, per-band X-ray foreground/background annular profiles,
and a count-rate table at an arbitrary nT — with every dimension
randomizable, writing the same text/table formats the real readers
consume (io/readers.py).  The RMF/ARF are the bundled real responses
(fabricating OGIP products adds nothing: the folded matrix enters only
through table generation, which is swept via nT/bands/z/NH).
"""

import numpy as np

from joxsz_tpu.config import JoXSZConfig, SZConfig, XrayConfig
from joxsz_tpu.tablegen.generate import TableSpec, generate_table, save_table

REF_X = "/root/reference/data/X"


def make_synthetic_config(tmp_path, rng, *, step_arcsec=4.0,
                          flux_rmax_arcsec=300.0, n_flux=40,
                          fwhm_arcsec=15.0, extent_kpc=2500.0,
                          n_ann=12, n_bands=5, nT=64, redshift=0.5,
                          NH_1022=0.03, sz_only=False, **cfg_overrides):
    """Write a full synthetic dataset under tmp_path and return a
    JoXSZConfig pointing at it.  The count-rate table is pre-generated
    into tmp_path (so sweeps never pollute data/tables/)."""
    tmp_path = str(tmp_path)

    # the SZ chain requires the pressure grid to cover the map half-axis
    # (build_session validates this loudly): raise the extent when the
    # random draw is too compact for the drawn map geometry
    from joxsz_tpu.cosmology import Cosmology

    # JoXSZConfig's default cosmology parameters, not Cosmology's own
    # (H0 70 vs 67.32 — a 4% kpc/arcsec mismatch underestimated the
    # needed extent in the first sweep run); honour cosmology overrides
    # the caller passes through cfg_overrides, and keep a margin of a
    # few grid steps over build_map_geometry's exact requirement (the
    # session measures the beam FWHM from the written file, which can
    # drift a hair from the nominal value) — r4 review
    kpc_as = Cosmology(z=redshift,
                       H0=cfg_overrides.get("H0", 67.32),
                       WM=cfg_overrides.get("WM", 0.3158),
                       WV=cfg_overrides.get("WV", 0.6842)).kpc_per_arcsec
    max_r = ((flux_rmax_arcsec + 3.0 * fwhm_arcsec)
             // step_arcsec * step_arcsec)
    sep = int(max_r // step_arcsec)
    extent_kpc = max(extent_kpc, (sep + 6) * step_arcsec * kpc_as)

    # --- SZ flux profile: smooth decrement + noise, honest errors --------
    r = np.linspace(step_arcsec, flux_rmax_arcsec, n_flux)
    signal = -2.0 / (1.0 + (r / (0.3 * flux_rmax_arcsec)) ** 2)
    err = np.full(n_flux, 0.08)
    y = signal + rng.normal(0.0, err)
    flux_file = f"{tmp_path}/flux.dat"
    np.savetxt(flux_file, np.column_stack([r, y, err]))

    # --- beam: Gaussian radial profile as a 2-column text table ----------
    rb = np.arange(0.0, 4.0 * fwhm_arcsec, step_arcsec / 2.0)
    sig = fwhm_arcsec / 2.355
    beam_file = f"{tmp_path}/beam.dat"
    np.savetxt(beam_file, np.column_stack(
        [rb, np.exp(-0.5 * (rb / sig) ** 2)]))

    # --- transfer function: smooth high-pass in wavenumber ---------------
    wn = np.linspace(0.0, 0.5 / step_arcsec, 128)
    tf = 0.95 / (1.0 + np.exp(-(wn - 0.01) / 0.004))
    tf_file = f"{tmp_path}/tf.dat"
    np.savetxt(tf_file, np.column_stack([wn, tf]))

    # --- Compton-to-Jy/beam conversion: wide T grid (0.1-100 keV so the
    # sweep never exercises out-of-grid extrapolation differences) -------
    t_grid = np.geomspace(0.1, 100.0, 50)
    conv = -11.0 * (1.0 + 0.02 * np.log(t_grid))    # Jy/beam, T-dependent
    conv_file = f"{tmp_path}/conv.dat"
    np.savetxt(conv_file, np.column_stack([t_grid, conv]),
               header="T_keV Jy_per_beam")

    sz = SZConfig(beam_file=beam_file, tf_file=tf_file,
                  flux_file=flux_file, conversion_file=conv_file)

    xray = None
    if not sz_only:
        # --- bands: contiguous random edges inside the response range ----
        # replace=False cannot duplicate, and np.sort orders the edges;
        # a request for more bands than grid values fails loudly inside
        # rng.choice itself
        edges_eV = np.sort(rng.choice(
            np.arange(700, 7001, 100), size=n_bands + 1, replace=False))
        bands = tuple((int(a), int(b))
                      for a, b in zip(edges_eV[:-1], edges_eV[1:]))

        # --- annular profiles: shared radial grid across bands -----------
        ann_edges = np.linspace(0.02, 1.5, n_ann + 1)   # arcmin
        rc = 0.5 * (ann_edges[:-1] + ann_edges[1:])
        hw = 0.5 * np.diff(ann_edges)
        geom_area = np.pi * ((rc + hw) ** 2 - (rc - hw) ** 2)
        area = geom_area * rng.uniform(0.85, 1.0, n_ann)  # pixelisation
        expo = np.full(n_ann, 1.2e4)
        fg_template = f"{tmp_path}/fg_%04i_%04i.dat"
        bg_template = f"{tmp_path}/bg_%04i_%04i.dat"
        for lo, hi in bands:
            cts = rng.poisson(np.maximum(
                200.0 * np.exp(-rc / 0.4), 3.0)).astype(float)
            np.savetxt(fg_template % (lo, hi), np.column_stack(
                [rc, hw, cts, area, expo]))
            bgrate = np.full(n_ann, 2e-5 * (hi - lo) / 1000.0)
            np.savetxt(bg_template % (lo, hi), np.column_stack(
                [rc, hw, np.zeros(n_ann), area, bgrate]))

        # --- count-rate table at the requested nT ------------------------
        import pathlib

        import pytest

        if not pathlib.Path(f"{REF_X}/source.rmf").exists():
            # mirror conftest's ref_data fixture: skip, don't
            # FileNotFoundError deep inside load_response
            pytest.skip("reference data not mounted")
        spec = TableSpec(rmf=f"{REF_X}/source.rmf", arf=f"{REF_X}/source.arf",
                         bands_eV=bands, z=redshift, NH_1022pcm2=NH_1022,
                         nT=nT)
        table_path = f"{tmp_path}/table.npz"
        save_table(table_path, generate_table(spec))

        xray = XrayConfig(fg_template=fg_template, bg_template=bg_template,
                          rmf=spec.rmf, arf=spec.arf, bands_eV=bands,
                          NH_1022pcm2=NH_1022, table_path=table_path)

    return JoXSZConfig(step_arcsec=step_arcsec,
                       cluster_extent_kpc=extent_kpc, redshift=redshift,
                       sz=sz, xray=xray, **cfg_overrides)
