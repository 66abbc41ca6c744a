"""Session-generic numpy/scipy replica of the reference likelihood math.

Extracted from test_likelihood.py so the geometry-generalization sweep
(test_geometry_sweep.py) can assert the same golden parity at arbitrary
instrument shapes, not just the bundled CL J1226 ones.  Ground-truth
semantics follow SURVEY.md §4/§7.2: a from-first-principles host
implementation of each stage (the SZ side is the exact ``sz_map_pipeline``
scipy path the operators were built from).

Covers the flagship family (gNFW pressure x UPP temperature x single
Vikhlinin density) — the family the analytic expressions below encode.
"""

import numpy as np


def pars_numpy(session, theta):
    import jax.numpy as jnp

    return {n: float(v) for n, v in
            session.params.unpack(jnp.asarray(theta)).items()}


def vikh_numpy(pars, r):
    n0 = 10.0 ** pars["log(n_0)"]
    rc = 10.0 ** pars["log(r_c)"]
    rs = 10.0 ** pars["log(r_s)"]
    ne2 = (n0**2 * (r / rc) ** (-pars[r"\alpha"])
           / ((1 + (r / rc) ** 2) ** (3 * pars[r"\beta"] - pars[r"\alpha"] / 2)
              * (1 + (r / rs) ** pars[r"\gamma"]) ** (pars[r"\epsilon"]
                                                      / pars[r"\gamma"])))
    return np.sqrt(ne2)


def gnfw_numpy(pars, r):
    x = r / pars["r_p"]
    return pars["P_0"] / (x ** pars["c"] * (1 + x ** pars["a"])
                          ** ((pars["b"] - pars["c"]) / pars["a"]))


def sz_loglike_numpy(session, theta):
    """Full SZ chain: explicit scipy pipeline + interp chain + chi^2."""
    from scipy.interpolate import interp1d

    from joxsz_tpu.io.readers import read_conversion_table, read_xy
    from joxsz_tpu.ops.szkernel import sz_map_pipeline

    pars = pars_numpy(session, theta)
    geom = session.geometry
    r = geom.r_press_kpc

    pp = gnfw_numpy(pars, r)
    raw = sz_map_pipeline(pp, geom, session.beam_2d, session.filter_image)

    ne = vikh_numpy(pars, r)
    t_prof = (pp / ne)[: geom.sep]
    rpos = r[: geom.sep]
    h = interp1d(np.append(-rpos, rpos), np.append(t_prof, t_prof),
                 kind="cubic", bounds_error=False,
                 fill_value=(t_prof[-1], t_prof[-1]))
    t_all = np.append(h(0.0), t_prof)
    t_tab, v_tab = read_conversion_table(session.config.sz.conversion_file)
    conv = interp1d(t_tab, v_tab, kind="linear",
                    fill_value="extrapolate")(t_all)
    prof = raw * conv * pars["calibration"]
    g = interp1d(geom.radius_arcsec[geom.sep:], prof, kind="cubic",
                 fill_value="extrapolate")
    flux = read_xy(session.config.sz.flux_file, 3)
    chisq = np.nansum(((flux[1] - g(flux[0])) / flux[2]) ** 2)
    return -chisq / 2


def xray_pred_numpy(session, theta):
    """(n_band, n_ann) predicted X-ray counts via independent folding."""
    pars = pars_numpy(session, theta)
    x = session.model.xray_data
    mid = np.asarray(x.midpt_kpc)
    ne = vikh_numpy(pars, mid)
    press = gnfw_numpy(pars, mid)
    T = press / ne * 10.0 ** pars["log(T_X/T_{SZ})"]
    Z = pars["Z"]

    tab = x.table
    Tlog = np.asarray(tab.Tlog)
    lr0 = np.asarray(tab.lograte_Z0)
    lr1 = np.asarray(tab.lograte_Z1)
    # np.interp clamps at the ends — the mbproj2 runtime convention
    r0 = np.exp(np.stack([np.interp(np.log(T), Tlog, lr0[b])
                          for b in range(lr0.shape[0])]))
    r1 = np.exp(np.stack([np.interp(np.log(T), Tlog, lr1[b])
                          for b in range(lr1.shape[0])]))
    # line_scale nuisance folds into Z exactly as the runtime does
    # (models/xray.py: Z_eff = Z * line_scale; tables linear in Z)
    Z_eff = Z * pars.get("line_scale", 1.0)
    rates = r0 * (1 - Z_eff) + r1 * Z_eff
    emiss = rates * ne**2
    proj = emiss @ np.asarray(x.vols_norm).T
    return (proj * np.asarray(x.exposures) * np.asarray(x.areascales)
            + pars["backscale"] * np.asarray(x.backrates)
            * np.asarray(x.exposures) * np.asarray(x.areas))


def xray_cash_numpy(session, theta):
    x = session.model.xray_data
    pred = xray_pred_numpy(session, theta)
    cts = np.asarray(x.counts)
    mask = ~np.isnan(cts)
    # the runtime's positivity veto (models/xray.py::xray_log_like):
    # without it a theta outside the support returned NaN with a
    # RuntimeWarning, so a parity check there failed as 'nan != -inf'
    # with no hint the point is simply vetoed
    if np.any(pred[mask] <= 0):
        return float("-inf")
    return float(np.sum(cts[mask] * np.log(pred[mask]) - pred[mask]))
