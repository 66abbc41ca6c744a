"""Posterior summaries: tables, equal-tailed intervals, autocorrelation.

Covers the reference's posterior table (joxsz_main.py:217-223), the
commented-out ``mcmc.acor`` diagnostic (joxsz_main.py:212) via the standard
Goodman-Weare/Sokal windowed integrated autocorrelation time, and JSON
export of the full summary."""

from __future__ import annotations

import json
import pathlib

import numpy as np

from .profiles import equal_tailed


def autocorr_function(x: np.ndarray) -> np.ndarray:
    """Normalised autocorrelation of a 1-D series via FFT."""
    x = np.asarray(x, dtype=float)
    n = x.size
    x = x - x.mean()
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acf = np.fft.irfft(f * np.conjugate(f), m)[:n]
    if acf[0] == 0:
        return np.zeros(n)
    return acf / acf[0]


def integrated_autocorr_time(chain: np.ndarray, c: float = 5.0) -> np.ndarray:
    """Integrated autocorrelation time per parameter.

    chain: (n_steps, n_walkers, ndim).  Walker-averaged ACF with Sokal's
    automatic windowing (the emcee v3 estimator): tau = 1 + 2 sum rho(t),
    truncated at the smallest M with M >= c * tau(M)."""
    chain = np.asarray(chain)
    n_steps, n_walkers, ndim = chain.shape
    taus = np.empty(ndim)
    for d in range(ndim):
        acf = np.zeros(n_steps)
        for w in range(n_walkers):
            acf += autocorr_function(chain[:, w, d])
        acf /= n_walkers
        tau_run = 2.0 * np.cumsum(acf) - 1.0
        window = np.arange(n_steps) < c * tau_run
        if window.all():
            m = n_steps - 1
        else:
            m = int(np.argmin(window))
        taus[d] = tau_run[max(m, 1)]
    return taus


def effective_samples(chain: np.ndarray) -> np.ndarray:
    """N_eff per parameter = total samples / tau."""
    n_steps, n_walkers, _ = chain.shape
    tau = integrated_autocorr_time(chain)
    return n_steps * n_walkers / np.maximum(tau, 1.0)


def summary_dict(flat_chain: np.ndarray, param_names: list[str],
                 units: list[str] | None = None, ci: float = 95.0,
                 chain_3d: np.ndarray | None = None) -> dict:
    lo, med, hi = equal_tailed(flat_chain, ci)
    std = np.std(flat_chain, axis=0)
    out = {
        "ci": ci,
        "parameters": {},
    }
    units = units or ["."] * len(param_names)
    taus = None
    neff = None
    if chain_3d is not None:
        taus = integrated_autocorr_time(chain_3d)
        neff = effective_samples(chain_3d)
    for i, name in enumerate(param_names):
        entry = {
            "median": float(med[i]),
            "std": float(std[i]),
            "ci_low": float(lo[i]),
            "ci_high": float(hi[i]),
            "unit": units[i],
        }
        if taus is not None:
            entry["autocorr_time"] = float(taus[i])
            entry["n_eff"] = float(neff[i])
        out["parameters"][name] = entry
    return out


def save_summary(path: str, summary: dict):
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    pathlib.Path(path).write_text(json.dumps(summary, indent=2))
