"""Simulation-based calibration (Talts et al. 2018, arXiv:1804.06788).

End-to-end statistical validation of the whole inference pipeline — a
capability the reference lacks entirely (its only validation is the
published-fit comparison, SURVEY §4).  The self-consistency identity:
if theta* ~ prior and data ~ p(data | theta*), then for each parameter
the rank of theta*_i among L posterior draws given that data is
uniform on {0, ..., L}.  Any miscalibration — a likelihood/simulator
mismatch, a sampler bias, a prior/veto inconsistency — shows up as a
non-uniform rank histogram (U-shape: posterior too narrow; hump:
too wide; slope: biased).

The whole study runs as ONE device program: N prior draws (exact, via
sampling/priors.py), N mock datasets through the likelihood's own
forward models (simulate.py), and N independent ensembles fit
simultaneously through the stacked multicluster likelihood
(models/multicluster.py, the flat widened-GEMM path on TPU) inside a
single jitted scan.  This turns the classic "SBC is too expensive for
real pipelines" objection into a few seconds of device time.

Rank-correlation caveat: posterior draws from one ensemble are
autocorrelated (tau ~ hundreds of steps on the CL J1226 posterior —
docs/PERFORMANCE.md), which does not bias the rank's distribution but
shrinks the effective number of independent draws; the chi^2 uniformity
test assumes L independent draws, so choose ``thin`` of order tau (or
treat the reported p-values as optimistic in spread).  The rank is
computed with the standard uniform tie-break so discrete ties (veto
plateaus) cannot fake uniformity.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .batched import batched_init as _batched_init, run_batched_ensembles  # noqa: F401 (re-exported)
from .priors import sample_prior


@dataclasses.dataclass
class SBCResult:
    ranks: np.ndarray          # (N, D) in {0..n_draws}
    n_draws: int               # L: posterior draws per replication
    thetas_true: np.ndarray    # (N, D) prior draws that generated the data
    p_values: np.ndarray       # (D,) chi^2 uniformity p-value per parameter
    counts: np.ndarray         # (D, B) binned rank histogram
    names: list[str]           # thawed parameter names
    acceptance: np.ndarray     # (N, W) sampler acceptance per replication

    def worst(self) -> tuple[str, float]:
        i = int(np.argmin(self.p_values))
        return self.names[i], float(self.p_values[i])


def sbc_uniformity(ranks: np.ndarray, n_draws: int,
                   n_bins: int | None = None):
    """Per-parameter chi^2 uniformity test of SBC ranks.

    Returns (p_values (D,), counts (D, B)).  ``n_bins`` defaults to the
    Talts et al. style N/20-capped choice so expected counts stay >= ~20.
    """
    from scipy import stats

    ranks = np.asarray(ranks)
    N, D = ranks.shape
    if n_bins is None:
        n_bins = int(np.clip(N // 20, 2, n_draws + 1))
    if not (2 <= n_bins <= n_draws + 1):
        raise ValueError(f"n_bins ({n_bins}) must be in [2, L+1]")
    # bin {0..L} into n_bins near-equal cells
    edges = np.floor(np.arange(1, n_bins) * (n_draws + 1) / n_bins)
    idx = np.searchsorted(edges, ranks, side="right")       # (N, D)
    counts = np.stack([np.bincount(idx[:, d], minlength=n_bins)
                       for d in range(D)])
    # expected per-bin mass follows the (near-)equal cell widths
    widths = np.diff(np.concatenate([[0], edges, [n_draws + 1]]))
    expected = N * widths / (n_draws + 1)
    chi2 = ((counts - expected) ** 2 / expected).sum(axis=1)
    p = stats.chi2.sf(chi2, df=n_bins - 1)
    return p, counts


def run_sbc(model, n_reps: int, *, n_walkers: int = 64,
            n_burn: int = 2000, n_steps: int = 500, thin: int = 50,
            seed: int = 0, sz_noise: bool = True, xray_noise: bool = True,
            init_spread: float = 0.05, n_bins: int | None = None,
            flatten: bool = True) -> SBCResult:
    """Full SBC study of a JointModel's pipeline.

    For each of ``n_reps`` replications: theta* ~ normalized prior,
    one mock dataset at theta*, a (``n_burn`` + ``n_steps``)-step
    ensemble fit, and the per-parameter rank of theta* among the
    L = (n_steps/thin) * n_walkers thinned post-burn draws.  All
    replications run stacked in one program.

    Prior draws that the forward model cannot evaluate (negative
    predicted X-ray counts at extreme-but-unvetoed corners) are
    resampled — the prior conditioned on simulability is the measure
    being calibrated, and the same positivity veto zeroes those points'
    likelihood, so the identity is preserved."""
    from ..simulate import simulate_survey, _jitted_profile
    from ..models.multicluster import (
        stack_sz_data, stack_xray_data, make_multicluster_log_like,
    )

    rng = np.random.default_rng(seed)
    lpri = jax.jit(jax.vmap(model.log_prior_only))

    # prior draws, resampling any the simulator rejects (guarded loop)
    thetas, tries = [], 0
    while len(thetas) < n_reps:
        tries += 1
        if tries > 16:
            raise RuntimeError("prior draws keep failing the simulator's "
                               "positivity check; inspect the prior")
        xrp = (None if model.xray_data is None
               else _jitted_profile(model, "xray_profiles"))
        for t in sample_prior(lpri, model.params, n_reps - len(thetas), rng):
            try:
                xr_ok = xrp is None or np.all(
                    np.asarray(xrp(jnp.asarray(t))) >= 0)
            except Exception:
                xr_ok = False
            if xr_ok:
                thetas.append(t)
    thetas_true = np.asarray(thetas)

    survey = simulate_survey(model, thetas_true, rng, sz_noise=sz_noise,
                             xray_noise=xray_noise)
    llcb = make_multicluster_log_like(model, survey.sz_stack,
                                      survey.xray_stack, flatten=flatten)

    key = jax.random.PRNGKey(seed)
    k_init, k_run = jax.random.split(key)
    dtype = (model.sz_data.flux.dtype if model.sz_data is not None
             else model.xray_data.counts.dtype)
    p0 = _batched_init(llcb, thetas_true.astype(dtype), n_walkers, k_init,
                       spread=init_spread)
    chain, acc, _ = run_batched_ensembles(llcb, p0, n_burn, n_steps,
                                          k_run, thin=thin)
    # (n_saved, C, W, D) -> (C, L, D)
    draws = chain.transpose(1, 0, 2, 3).reshape(n_reps, -1,
                                                thetas_true.shape[1])
    L = draws.shape[1]
    # uniform tie-break: rank = #{draw < theta*} + #{draw == theta*} * U
    lt = (draws < thetas_true[:, None, :]).sum(axis=1)
    eq = (draws == thetas_true[:, None, :]).sum(axis=1)
    u = np.random.default_rng(seed + 1).random(lt.shape)
    ranks = lt + np.floor(u * (eq + 1)).astype(int)

    p_values, counts = sbc_uniformity(ranks, L, n_bins=n_bins)
    return SBCResult(ranks=ranks, n_draws=L, thetas_true=thetas_true,
                     p_values=p_values, counts=counts,
                     names=list(model.params.thawed), acceptance=acc)
