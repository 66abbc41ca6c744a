"""X-ray forward model + Cash likelihood (JAX, jittable, vmappable).

TPU-native replacement for the mbproj2 pipeline the reference drives through
``Fit.calcProfiles`` + ``mylikeFromProfs`` (/root/reference/joxsz_funcs.py:495-546,
SURVEY.md §2.3):

    ne, T_X, Z at the shell midpoints
      -> per-band count rate per unit XSPEC norm (table lookup: linear in
         log T of the log-rate, linear in Z between the Z=0 and Z=1 grids)
      -> emissivity density = rate * ne^2 * [1e-14 / (4 pi (D_A (1+z))^2 ne_nH)]
      -> shell-to-annulus projection: one (n_ann, n_shell) matmul per band
      -> x exposure x areascale + backscale * backrate * exposure * area
      -> Cash log-likelihood sum(d ln m - m) over non-NaN counts.

The count-rate table is an offline artifact (see ``joxsz_tpu.tablegen``);
at runtime it is a pure gather+lerp — no XSPEC anywhere near the hot path.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.splines import lerp_lookup
from ..geometry.annuli import Annuli
from ..io.readers import BandData


def uniform_hat_weights(grid, x):
    """Dense (..., n) hat-basis lerp weights on a UNIFORM grid:
    w[j] = (1-frac)[j==k] + frac[j==k+1] with end-clamping, so
    ``w @ table`` is the linear interpolation of ``table`` at ``x``.

    THE one implementation of the uniform-grid log-T lerp weights —
    shared by :meth:`CountRateTable.rates` and the flat multicluster
    path (models/multicluster.py), so the subtle numerics (the
    ``n-1-1e-6`` end clip, floor/frac construction) cannot drift
    between copies.  ``grid`` may carry leading batch axes; only its
    first row's spacing is used (callers guarantee shared grids)."""
    g = grid.reshape(-1, grid.shape[-1])[0]
    n = g.shape[0]
    dt = g[1] - g[0]
    pos = jnp.clip((x - g[0]) / dt, 0.0, n - 1 - 1e-6)
    k = jnp.floor(pos)
    frac = pos - k
    j = jnp.arange(n, dtype=pos.dtype)
    shape = x.shape + (n,)
    kb = jnp.broadcast_to(k[..., None], shape)
    fb = jnp.broadcast_to(frac[..., None], shape)
    return (jnp.where(j == kb, 1.0 - fb, 0.0)
            + jnp.where(j == kb + 1.0, fb, 0.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CountRateTable:
    """Per-band count rates (cts/s per unit XSPEC norm) on a log-T grid,
    tabulated at Z=0 and Z=1 solar; plus bolometric flux tables (erg/cm^2/s
    per unit norm) for cooling-time profiles."""

    Tlog: jnp.ndarray          # (nT,) natural-log temperature grid
    lograte_Z0: jnp.ndarray    # (n_band, nT)
    lograte_Z1: jnp.ndarray    # (n_band, nT)
    logflux_Z0: jnp.ndarray    # (nT,) bolometric
    logflux_Z1: jnp.ndarray    # (nT,)

    def rates(self, T_keV, Z_solar, use_matmul: bool = True):
        """cts/s per unit norm, broadcast over bands x shells.

        ``use_matmul=True`` evaluates the log-T linear interpolation as a
        (one-hot segment weights) x (table) matmul instead of
        searchsorted+gather — on TPU the compare+matmul form maps onto
        VPU+MXU with no gather, which measurably helps large walker
        batches."""
        tl = jnp.log(T_keV)
        if not use_matmul:
            # clamped at the grid ends (np.interp semantics, matching
            # mbproj2's runtime interpolation of the cached tables)
            r0 = jnp.exp(lerp_lookup(self.Tlog, self.lograte_Z0, tl,
                                     extrapolate=False))
            r1 = jnp.exp(lerp_lookup(self.Tlog, self.lograte_Z1, tl,
                                     extrapolate=False))
            return r0 * (1.0 - Z_solar) + r1 * Z_solar
        w = uniform_hat_weights(self.Tlog, tl)
        # lerp-lookup semantics beyond the grid: clamp-with-end-slope is
        # unnecessary here (the grid spans 0.06-60 keV; T is clipped by
        # `pos`), so clamping to the end segment matches lerp_lookup's
        # behaviour inside the physical range
        logr0 = jnp.einsum("...j,bj->...b", w, self.lograte_Z0)
        logr1 = jnp.einsum("...j,bj->...b", w, self.lograte_Z1)
        r0 = jnp.exp(jnp.moveaxis(logr0, -1, 0))
        r1 = jnp.exp(jnp.moveaxis(logr1, -1, 0))
        return r0 * (1.0 - Z_solar) + r1 * Z_solar

    def flux(self, T_keV, Z_solar, ne_cm3, norm_per_cm3):
        """Observed bolometric flux per cm^3 of emitting plasma
        (erg/cm^2/s/cm^3), for cooling-time profiles
        (cf. reference joxsz_plots.py:243)."""
        tl = jnp.log(T_keV)
        f0 = jnp.exp(lerp_lookup(self.Tlog, self.logflux_Z0, tl))
        f1 = jnp.exp(lerp_lookup(self.Tlog, self.logflux_Z1, tl))
        f = f0 * (1.0 - Z_solar) + f1 * Z_solar
        return f * ne_cm3**2 * norm_per_cm3

    @classmethod
    def from_npz(cls, path: str, dtype=jnp.float64,
                 expect: dict | None = None) -> "CountRateTable":
        """Load a table artifact.  Pass ``expect={'z':..,
        'NH_1022pcm2':.., 'bands_eV':..}`` to validate the stored
        generation metadata against the fit configuration — a table built
        for a different redshift/column/band-set silently produces wrong
        X-ray physics otherwise."""
        d = np.load(path)
        if expect is not None:
            import json as _json

            meta = _json.loads(bytes(d["meta"]).decode()) if "meta" in d \
                else {}
            errs = []
            for key, tol in (("z", 1e-6), ("NH_1022pcm2", 1e-9)):
                want = expect.get(key)
                got = meta.get(key)
                if want is not None and got is not None and \
                        abs(float(want) - float(got)) > tol:
                    errs.append(f"{key}: table {got} != config {want}")
            want_ver = expect.get("model_version")
            if want_ver is not None and \
                    not str(meta.get("backend", "")).startswith("xspec"):
                # fallback-model tables must carry the current spectral
                # model version; a missing field means a pre-versioning
                # (stale-physics) artifact.  XSPEC-backend tables
                # ('xspec' = driven binary, 'xspec-cache' = imported
                # reference countrate_cache.hdf5) are exact physics and
                # exempt.
                got_ver = meta.get("model_version")
                if got_ver != want_ver:
                    errs.append(f"spectral model_version: table "
                                f"{got_ver} != current {want_ver}")
            want_bands = expect.get("bands_eV")
            if want_bands is not None and "bands_eV" in d:
                got_bands = np.asarray(d["bands_eV"], dtype=float)
                if got_bands.shape != np.asarray(want_bands, float).shape \
                        or not np.allclose(got_bands,
                                           np.asarray(want_bands, float)):
                    errs.append("bands_eV differ between table and config")
            if errs:
                raise ValueError(
                    f"count-rate table {path} was generated for a "
                    f"different setup: {'; '.join(errs)}. Regenerate with "
                    "python -m joxsz_tpu.tablegen.generate or point "
                    "xray.table_path at the right artifact.")
        # the hat-basis matmul interpolation (rates/flux) positions every
        # hat from dt = Tlog[1] - Tlog[0]; a non-uniform grid would
        # silently interpolate at wrong temperatures (r4 review #4)
        tl = np.asarray(d["Tlog"], dtype=float)
        if tl.size >= 2 and not np.allclose(np.diff(tl), tl[1] - tl[0],
                                            rtol=1e-6, atol=1e-12):
            raise ValueError(
                f"count-rate table {path} has a NON-UNIFORM Tlog grid; "
                "the runtime interpolation assumes uniform log-T "
                "spacing. Regenerate the table on a uniform grid "
                "(tablegen and import_xspec_cache always produce one).")
        asx = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            Tlog=asx(d["Tlog"]),
            lograte_Z0=asx(d["lograte_Z0"]),
            lograte_Z1=asx(d["lograte_Z1"]),
            logflux_Z0=asx(d["logflux_Z0"]),
            logflux_Z1=asx(d["logflux_Z1"]),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class XrayData:
    """Device-resident constants for the X-ray likelihood of one cluster.

    Registered as a JAX pytree (see SZData) for multi-cluster vmapping."""

    counts: jnp.ndarray          # (n_band, n_ann), NaN for missing
    counts_mask: jnp.ndarray     # 1.0 where counts valid
    counts_filled: jnp.ndarray   # counts with NaN -> 0
    exposures: jnp.ndarray       # (n_band, n_ann) s
    areascales: jnp.ndarray      # (n_band, n_ann)
    areas: jnp.ndarray           # (n_band, n_ann) arcmin^2 (pixelised)
    backrates: jnp.ndarray       # (n_band, n_ann) cts/s/arcmin^2
    vols_norm: jnp.ndarray       # (n_ann, n_shell): projection volumes x
                                 # the per-cm^3 XSPEC norm prefactor — O(0.1)
                                 # values, float32-safe (raw vols ~1e69 cm^3
                                 # and the norm ~1e-71 both overflow f32)
    midpt_kpc: jnp.ndarray       # (n_shell,)
    # data leaf (differs per cluster via D_A(z)); host code reads it with
    # float(...) where a scalar is needed
    norm_per_cm3: float = 1.0
    table: CountRateTable = dataclasses.field(default=None)

    @classmethod
    def build(cls, bands: list[BandData], annuli: Annuli,
              table: CountRateTable, dtype=jnp.float64) -> "XrayData":
        asx = lambda a: jnp.asarray(np.asarray(a, dtype=float), dtype=dtype)
        cts = np.stack([b.counts for b in bands])
        mask = ~np.isnan(cts)
        norm = float(annuli.xspec_norm_per_cm3())
        return cls(
            counts=asx(cts),
            counts_mask=asx(mask.astype(float)),
            counts_filled=asx(np.where(mask, cts, 0.0)),
            exposures=asx(np.stack([b.exposures_s for b in bands])),
            areascales=asx(np.stack([b.areascales for b in bands])),
            areas=asx(np.stack([b.areas_arcmin2 for b in bands])),
            backrates=asx(np.stack([b.backrates for b in bands])),
            vols_norm=asx(annuli.vols_cm3 * norm),
            midpt_kpc=asx(annuli.midpt_kpc),
            norm_per_cm3=norm,
            table=table,
        )


def predicted_counts(pars: dict, x: XrayData, density, temperature,
                     Z_name: str = "Z") -> jnp.ndarray:
    """(n_band, n_ann) predicted counts for the current parameters."""
    ne = density(pars, x.midpt_kpc)                      # (n_shell,)
    T = temperature.t_x(pars, x.midpt_kpc)               # (n_shell,)
    # line_scale nuisance (optional, default 1): the tables are linear in
    # Z (rate = r_Z0 + Z*(r_Z1 - r_Z0)), so scaling Z scales exactly the
    # metal-line component — marginalizes the fallback spectral model's
    # line-emissivity systematic when thawed (build_reference_params)
    Z = pars[Z_name] * pars.get("line_scale", 1.0) * jnp.ones_like(T)
    rates = x.table.rates(T, Z)                          # (n_band, n_shell)
    emiss = rates * (ne * ne)                            # (n_band, n_shell)
    proj = emiss @ x.vols_norm.T                         # (n_band, n_ann)
    signal = proj * x.exposures * x.areascales
    background = pars["backscale"] * x.backrates * x.exposures * x.areas
    return signal + background


def cash_log_like(counts_filled, mask, pred) -> jnp.ndarray:
    """Poisson (Cash) log-likelihood sum(d ln m - m) over valid annuli,
    dropping the data-only constant terms (mbproj2 convention)."""
    logm = jnp.log(pred)
    return jnp.sum(mask * (counts_filled * logm - pred))


def xray_log_like(pars: dict, x: XrayData, density, temperature,
                  Z_name: str = "Z") -> jnp.ndarray:
    """Cash log-likelihood with the reference's positivity veto: any
    non-positive predicted profile value => -inf
    (/root/reference/joxsz_funcs.py:529-532).

    The veto is evaluated over VALID cells only (counts_mask): a
    masked-out annulus (counts=NaN, exposure=0 — the standard exclusion
    convention) has pred=0 for every theta, and an unmasked min would
    make the whole fit -inf with no diagnostic.  The reference takes
    the raw min, but its one dataset has no masked annuli; the fused
    kernel and the flat multicluster path apply the same masked form."""
    pred = predicted_counts(pars, x, density, temperature, Z_name)
    ok = jnp.min(jnp.where(x.counts_mask > 0, pred, 1.0)) > 0.0
    safe_pred = jnp.where(pred > 0.0, pred, 1.0)
    ll = cash_log_like(x.counts_filled, x.counts_mask, safe_pred)
    return jnp.where(ok, ll, -jnp.inf)
