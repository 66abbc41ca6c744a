"""Hierarchical population inference over a fitted survey.

The reference (fcastagna/JoXSZ) is a single-cluster tool — a survey
means C independent fits and no statement about the population.  This
module adds the second stage: given per-cluster posterior samples from
``survey.fit_survey`` (drawn under the per-cluster "interim" priors of
``models/params.py``), infer hyperparameters ``phi = (mu, sigma)`` of a
population distribution for one thawed parameter (e.g. is the gNFW
``P_0`` of these clusters drawn from a common log-normal? with what
intrinsic scatter?).

Method: the standard two-stage importance-reweighting hyper-likelihood
(Hogg, Myers & Bovy 2010, ApJ 725, 2166 eq. 9-13; the workhorse of
gravitational-wave population inference, e.g. Thrane & Talbot 2019):

    L(phi) = prod_c  (1/S) sum_s  p(theta_cs | phi) / p0(theta_cs)

where theta_cs are stage-1 posterior samples of cluster c and p0 is the
interim prior they were drawn under.  Because the framework's priors
factorize per parameter (models/params.py), the ratio reduces to the
modeled coordinate's 1-D marginal — the other 12 coordinates cancel.
The population density is truncated and renormalized to the parameter's
box support, so scatter estimates stay unbiased when the population
presses against the prior bounds.

Everything is jittable with static shapes: the (C, S) sample matrix is
device-resident, the hyper-likelihood is one logsumexp reduction, and
phi is sampled with the same Goodman-Weare ensemble driver as the main
fit (sampling/stretch.py) — a 2-D problem, so CPU or one TPU dispatch
handles it in seconds.

Validation: tests/test_population.py pins the sampled posterior against
direct 2-D grid integration of the same hyper-likelihood (normal-normal
conjugate structure), including truncated and Gaussian-interim-prior
variants, plus an injection-recovery on a simulated survey.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PopulationModel:
    """Population distribution for one thawed parameter.

    ``family``: 'gaussian' (population normal in theta) or 'lognormal'
    (normal in ln theta — the natural choice for positive scale
    parameters like P_0).  ``support``: the parameter's interim box
    (lo, hi); the population density is truncated+renormalized to it.
    ``interim``: None for a flat interim prior, or (mu0, sigma0) when
    the stage-1 prior on this parameter was Gaussian
    (models/params.py:42 — unnormalized -z^2/2, which is all the ratio
    needs)."""
    param: str
    family: str = "gaussian"
    support: tuple[float, float] = (-np.inf, np.inf)
    interim: tuple[float, float] | None = None

    def __post_init__(self):
        if self.family not in ("gaussian", "lognormal"):
            raise ValueError(f"family must be 'gaussian' or 'lognormal', "
                             f"got {self.family!r}")
        if self.family == "lognormal" and self.support[0] < 0:
            raise ValueError("lognormal population needs a positive "
                             f"support, got lo={self.support[0]}")


_LOG_SQRT_2PI = float(0.5 * np.log(2.0 * np.pi))


def _check_positive(samples, model: PopulationModel):
    """A lognormal family with a sample at exactly 0 would give
    log(0) - log(0) = NaN densities that poison every phi through the
    logsumexp (and silence the n_eff diagnostics) — fail loudly
    instead.  Parameters whose posterior piles at 0 (e.g. Z, epsilon)
    want the gaussian family."""
    if model.family == "lognormal" and np.min(samples) <= 0:
        raise ValueError(
            f"lognormal population for {model.param!r} needs strictly "
            f"positive stage-1 samples (min {np.min(samples):g}); "
            f"posteriors piling at 0 want family='gaussian'")


def _norm_logcdf_diff(lo, hi, mu, sigma):
    """log( Phi((hi-mu)/sig) - Phi((lo-mu)/sig) ), stable in BOTH tails
    at f32: an erf difference underflows to exactly 0 once both bounds
    sit a few sigma on the same side of mu (f32 eps ~1e-7), turning the
    truncation term into -inf and the log-density into +inf.  Compute
    via log_ndtr + log1p instead, flipping to the survival side when
    most mass lies above the interval."""
    alpha = (lo - mu) / sigma
    beta = (hi - mu) / sigma
    flip = alpha > -beta
    a = jnp.where(flip, -beta, alpha)
    b = jnp.where(flip, -alpha, beta)
    lcb = jax.scipy.special.log_ndtr(b)
    lca = jax.scipy.special.log_ndtr(a)
    # a < b always (lo < hi), so the ratio is < 1 and log1p is safe
    return lcb + jnp.log1p(-jnp.exp(jnp.minimum(lca - lcb, -1e-7)))


def make_population_log_like(samples, model: PopulationModel,
                             interim_logp=None):
    """Hyper-likelihood builder.

    ``samples``: (C, S) stage-1 posterior draws of the modeled
    parameter (same S per cluster; subsample to equalize).
    ``interim_logp``: (C, S) log p0 at each draw, up to per-cluster
    constants (constants cancel).  Derived from ``model.interim`` when
    None.  Returns ``log_like(phi_batch (W, 2)) -> (W,)`` with
    ``phi = (mu, log sigma)`` — jittable/vmappable, static shapes."""
    _check_positive(samples, model)
    x = jnp.asarray(samples, jnp.float64
                    if jax.config.jax_enable_x64 else jnp.float32)
    C, S = x.shape
    lo, hi = model.support
    if model.family == "lognormal":
        y = jnp.log(x)
        jac = -jnp.log(x)            # dN(ln x)/dx = N(ln x) / x
        ylo = -jnp.inf if lo <= 0 else float(np.log(lo))
        yhi = jnp.inf if not np.isfinite(hi) else float(np.log(hi))
    else:
        y, jac = x, jnp.zeros_like(x)
        ylo, yhi = float(lo), float(hi)

    if interim_logp is None:
        if model.interim is None:
            lp0 = jnp.zeros_like(x)          # flat box: x-independent
        else:
            m0, s0 = model.interim
            lp0 = -0.5 * ((x - m0) / s0) ** 2    # params.py gauss form
    else:
        lp0 = jnp.asarray(interim_logp, x.dtype)
        if lp0.shape != x.shape:
            raise ValueError(f"interim_logp shape {lp0.shape} != "
                             f"samples shape {x.shape}")

    log_s = float(np.log(S))

    def one(phi):
        mu, lsig = phi[0], phi[1]
        sig = jnp.exp(lsig)
        logpdf = (-0.5 * ((y - mu) / sig) ** 2 - lsig - _LOG_SQRT_2PI
                  + jac - _norm_logcdf_diff(ylo, yhi, mu, sig))
        lw = logpdf - lp0
        return jnp.sum(jax.scipy.special.logsumexp(lw, axis=1)) - C * log_s

    def log_like(phi_batch):
        return jax.vmap(one)(jnp.atleast_2d(phi_batch))

    return log_like


def weight_n_eff(samples, model: PopulationModel, phi,
                 interim_logp=None) -> np.ndarray:
    """Per-cluster effective sample size of the importance weights at
    hyperparameters ``phi`` — (sum w)^2 / sum w^2, in [1, S].  Small
    values mean the population density barely overlaps that cluster's
    stage-1 posterior and the estimator is noisy there."""
    _check_positive(samples, model)
    x = np.asarray(samples, float)
    mu, lsig = float(phi[0]), float(phi[1])
    sig = np.exp(lsig)
    if model.family == "lognormal":
        y, jac = np.log(x), -np.log(x)
    else:
        y, jac = x, 0.0
    lw = -0.5 * ((y - mu) / sig) ** 2 + jac
    if interim_logp is not None:
        lw = lw - np.asarray(interim_logp, float)
    elif model.interim is not None:
        m0, s0 = model.interim
        lw = lw + 0.5 * ((x - m0) / s0) ** 2
    lw = lw - lw.max(axis=1, keepdims=True)
    w = np.exp(lw)
    return (w.sum(axis=1) ** 2) / (w ** 2).sum(axis=1)


@dataclasses.dataclass
class PopulationResult:
    model: PopulationModel
    chain: np.ndarray            # (n_saved, W, 2) of (mu, log sigma)
    log_prob: np.ndarray
    acceptance: np.ndarray
    mu: float                    # posterior medians
    mu_sd: float
    sigma: float
    sigma_sd: float
    n_eff_weights: np.ndarray    # per-cluster, at the posterior median
    n_samples: int = 0           # stage-1 draws per cluster (n_eff cap)

    def flat_chain(self) -> np.ndarray:
        return self.chain.reshape(-1, 2)

    def to_dict(self) -> dict:
        return {
            "param": self.model.param,
            "family": self.model.family,
            "mu": self.mu, "mu_sd": self.mu_sd,
            "sigma": self.sigma, "sigma_sd": self.sigma_sd,
            "acceptance": float(self.acceptance.mean()),
            "n_samples": self.n_samples,
            "weight_n_eff_min": float(self.n_eff_weights.min()),
            "weight_n_eff": self.n_eff_weights.tolist(),
        }


def fit_population(samples, model: PopulationModel, *,
                   interim_logp=None, n_walkers: int = 64,
                   n_burn: int = 500, n_steps: int = 1000,
                   thin: int = 5, seed: int = 0,
                   mu_bounds=None, log_sigma_bounds=None,
                   warn_n_eff: float = 10.0) -> PopulationResult:
    """Sample the population posterior from stage-1 draws.

    Hyperpriors: flat on mu over ``mu_bounds``, flat on log sigma over
    ``log_sigma_bounds`` (scale-invariant).  Defaults bracket the data:
    mu spans the per-cluster means +- 5x their spread, sigma spans
    [spread/100, 10x spread] (in ln-theta space for lognormal)."""
    from .stretch import run_ensemble

    x = np.asarray(samples, float)
    if x.ndim != 2:
        raise ValueError(f"samples must be (C, S), got {x.shape}")
    if x.shape[0] < 2:
        raise ValueError(
            "population inference needs >= 2 clusters (with one, the "
            "population mean and intrinsic scatter are degenerate with "
            "the cluster's own posterior)")
    y = np.log(x) if model.family == "lognormal" else x
    cm = y.mean(axis=1)
    spread = max(float(cm.std()), float(y.std(axis=1).mean()), 1e-6)
    if mu_bounds is None:
        mu_bounds = (float(cm.min() - 5 * spread),
                     float(cm.max() + 5 * spread))
    if log_sigma_bounds is None:
        log_sigma_bounds = (float(np.log(spread / 100.0)),
                            float(np.log(10.0 * spread)))
    lo = jnp.asarray([mu_bounds[0], log_sigma_bounds[0]])
    hi = jnp.asarray([mu_bounds[1], log_sigma_bounds[1]])

    ll = make_population_log_like(x, model, interim_logp=interim_logp)

    def log_prob(phi_batch):
        inside = jnp.all((phi_batch >= lo) & (phi_batch <= hi), axis=1)
        return jnp.where(inside, ll(phi_batch), -jnp.inf)

    log_prob = jax.jit(log_prob)
    rng = np.random.default_rng(seed)
    # widen the mu init beyond the cluster-mean range: equal means
    # would otherwise freeze the coordinate (affine stretch proposals
    # cannot leave a degenerate subspace)
    p0 = np.column_stack([
        rng.uniform(cm.min() - 0.5 * spread, cm.max() + 0.5 * spread,
                    n_walkers),
        np.log(spread) + 0.2 * rng.standard_normal(n_walkers),
    ])
    p0 = np.clip(p0, np.asarray(lo) + 1e-9, np.asarray(hi) - 1e-9)
    key = jax.random.PRNGKey(seed)
    if n_burn:
        burn = run_ensemble(log_prob, jnp.asarray(p0), n_burn,
                            jax.random.fold_in(key, 1),
                            thin=n_burn, store_chain=False)
        p0, key = burn.final_state[0], jax.random.fold_in(key, 2)
    res = run_ensemble(log_prob, jnp.asarray(p0), n_steps, key, thin=thin)
    flat = res.chain.reshape(-1, 2)
    med = np.median(flat, axis=0)
    n_eff = weight_n_eff(x, model, med, interim_logp=interim_logp)
    if n_eff.min() < warn_n_eff:
        import warnings

        warnings.warn(
            f"population importance weights are thin for cluster(s) "
            f"{np.nonzero(n_eff < warn_n_eff)[0].tolist()} "
            f"(n_eff min {n_eff.min():.1f} of {x.shape[1]} samples): "
            f"the population density barely overlaps their stage-1 "
            f"posteriors; draw more stage-1 samples or widen the model",
            stacklevel=2)
    sig_flat = np.exp(flat[:, 1])
    return PopulationResult(
        model=model, chain=res.chain, log_prob=res.log_prob,
        acceptance=res.acceptance_fraction,
        mu=float(med[0]), mu_sd=float(flat[:, 0].std()),
        sigma=float(np.median(sig_flat)), sigma_sd=float(sig_flat.std()),
        n_eff_weights=n_eff, n_samples=int(x.shape[1]),
    )


def population_from_survey(result, params, param: str,
                           family: str = "lognormal", *,
                           max_samples: int = 2048,
                           seed: int = 0, **kw) -> PopulationResult:
    """Stage 2 straight from a :class:`~joxsz_tpu.survey.SurveyResult`.

    ``params``: the shared ParamSet (FitSession.params) — supplies the
    modeled parameter's box support and Gaussian interim prior, if any.
    Subsamples each cluster's flat chain to ``max_samples`` draws."""
    names = list(result.param_names)
    if param not in names:
        raise ValueError(f"{param!r} not in fitted parameters {names}")
    j = names.index(param)
    thawed = list(params.thawed)
    if thawed != names:
        raise ValueError("params.thawed does not match the survey's "
                         f"parameter vector: {thawed} vs {names}")
    support = (float(params.lo[j]), float(params.hi[j]))
    interim = None
    if bool(np.asarray(params.is_gauss)[j]):
        interim = (float(params.mu[j]), float(params.sigma[j]))
    model = PopulationModel(param=param, family=family, support=support,
                            interim=interim)

    C = len(result.cluster_names)
    rng = np.random.default_rng(seed)
    cols = []
    for c in range(C):
        draws = result.flat_chain(c)[:, j]
        if draws.size > max_samples:
            draws = rng.choice(draws, size=max_samples, replace=False)
        cols.append(draws)
    S = min(len(d) for d in cols)
    # equalise counts by RANDOM subsample, never d[:S]: the flat chain
    # is frame-major, so a head slice keeps the most burn-adjacent,
    # most autocorrelated block — an asymmetric bias against the
    # clusters that happened to have longer chains
    samples = np.stack([
        d if len(d) == S else rng.choice(d, size=S, replace=False)
        for d in cols])
    return fit_population(samples, model, seed=seed, **kw)
