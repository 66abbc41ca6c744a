"""Bayesian model evidence via an inverse-temperature ladder.

Capability beyond the reference (which has no model-comparison story):
with multiple model families on the same data (gNFW vs knot pressure,
single vs double-beta density — SURVEY §2.1 #14/#16 variants), the
quantity that ranks them is the evidence Z = ∫ prior(θ) L(θ) dθ.

The machinery is the tempered-ensemble path (sampling/tempered.py)
re-targeted at the melting path p_beta ∝ prior · L^beta, beta ∈ [0, 1]:
rung 0 samples the (normalized-by-construction) prior, rung K-1 the
posterior, and adjacent rungs exchange states so the cold end never
sticks.  Because MCMC never needs the prior's normalization, both
estimators below return the evidence w.r.t. the NORMALIZED
(veto-restricted) prior even when ``log_prior_batch`` is unnormalized —
exactly the Bayesian semantics a Bayes factor needs, with each model's
own prior normalization folded in automatically.

Two estimators from the same run:

* stepping-stone (Xie et al. 2011): log Z = Σ_k [ logsumexp((β_{k+1} −
  β_k) · logL_i^{(k)}) − log n ] over samples at rung k.  Robust to
  zero-likelihood prior regions (exp(−inf) = 0 terms just drop out);
  this is the headline estimate.
* thermodynamic integration (Friel & Pettitt 2008): trapezoid of
  E_beta[log L] over the ladder.  Reported as a cross-check; it is
  undefined (−inf) when the prior carries mass where L = 0 (e.g. the
  X-ray positivity veto at diffuse prior corners), which the result
  flags rather than hides.  Caveat: with very diffuse priors and a
  sharp likelihood (the CL J1226 joint fit: log L ~ −1e20 at prior
  corners vs +3.4e4 at the mode) the TI integrand near beta = 0 is
  astronomically negative and the trapezoid is worthless at any
  practical ladder size — that is a property of the TI path integral,
  not a bug; the stepping-stone sum stays well-conditioned because
  exp(dbeta·logL) simply vanishes for such samples.  Trust log_z; use
  log_z_ti only when the two are comparable.

Both need ladder density near beta = 0 where E[log L] varies fastest —
``power_betas`` (beta_k = (k/(K−1))^p, p ≈ 5, the Xie et al.
recommendation) is the default.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .stretch import stretch_half_update, validate_schedule


@dataclasses.dataclass
class EvidenceResult:
    log_z: float                   # stepping-stone estimate (headline)
    log_z_ti: float                # thermodynamic-integration cross-check
    log_z_err: float               # stepping-stone MC error (jackknife over walkers)
    betas: np.ndarray              # (K,) ascending, 0 .. 1
    mean_log_like: np.ndarray      # (K,) E_beta[log L] (TI integrand)
    ss_terms: np.ndarray           # (K-1,) per-bridge log contributions
    acceptance_fraction: np.ndarray  # (K, W)
    swap_acceptance: np.ndarray    # (K-1,)
    log_like_samples: np.ndarray   # (n_saved, K, W)
    final_state: tuple


def power_betas(n_rungs: int, power: float = 5.0) -> np.ndarray:
    """Ascending ladder beta_k = (k/(K-1))**power, 0 .. 1: clusters rungs
    near beta=0 where the TI integrand / stepping-stone bridges are
    steepest (Xie et al. 2011 use quantiles of Beta(1/p, 1); p=5 is in
    their recommended range)."""
    if n_rungs < 2:
        raise ValueError("need at least 2 rungs (prior and posterior)")
    return (np.arange(n_rungs) / (n_rungs - 1.0)) ** power


def _target(pri, lik, beta):
    """log p_beta up to a constant; beta=0 must ignore lik entirely
    (0 * (-inf) would poison the prior rung with NaNs)."""
    return pri + jnp.where(beta > 0.0, beta * lik, 0.0)


def run_evidence_ladder(
    log_prior_batch,
    log_like_batch,
    p0: jnp.ndarray,            # (W, D) replicated, or (K, W, D)
    betas,
    n_steps: int,
    key: jax.Array,
    n_burn: int = 0,
    thin: int = 1,
    a: float = 2.0,
) -> EvidenceResult:
    """Sample the melting path and estimate log Z.

    ``log_prior_batch`` / ``log_like_batch`` map (N, D) -> (N,): the
    UNnormalized log-prior (−inf outside support) and the data
    log-likelihood.  ``p0`` should lie in the prior support; rung 0 only
    ever sees the prior, so give it enough burn-in (``n_burn``) to
    expand a posterior-concentrated cloud to the prior scale."""
    betas_np = np.asarray(betas, dtype=float)
    if betas_np.ndim != 1 or betas_np[0] != 0.0 or betas_np[-1] != 1.0 \
            or np.any(np.diff(betas_np) <= 0):
        raise ValueError("betas must ascend strictly from 0.0 to 1.0")
    K = betas_np.shape[0]
    p0 = jnp.asarray(p0)
    if p0.ndim == 2:
        p0 = jnp.broadcast_to(p0[None], (K,) + p0.shape)
    if p0.shape[0] != K:
        raise ValueError(f"p0 leading dim {p0.shape[0]} != n_rungs {K}")
    _, W, D = p0.shape
    validate_schedule(n_steps, thin, W)
    if n_burn < 0:
        raise ValueError(f"n_burn ({n_burn}) must be >= 0")
    H = W // 2
    dtype = p0.dtype
    betas_j = jnp.asarray(betas_np, dtype)

    def parts_all(x):               # (K, N, D) -> two (K, N)
        flat = x.reshape(K * x.shape[1], D)
        return (log_prior_batch(flat).reshape(K, x.shape[1]),
                log_like_batch(flat).reshape(K, x.shape[1]))

    def lp_fn(y):                   # target + aux for the half-update
        pri, lik = parts_all(y)
        return _target(pri, lik, betas_j[:, None]), (pri, lik)

    def step(state, k):
        x, pri, lik, acc, sacc = state
        ku, ks = jax.random.split(k)
        u = jax.random.uniform(ku, (2, K, 3, H), dtype=dtype)

        def half(x, pri, lik, acc, u3, which):
            sl_m = slice(None, H) if which == 0 else slice(H, None)
            sl_f = slice(H, None) if which == 0 else slice(None, H)
            tgt_m = _target(pri[:, sl_m], lik[:, sl_m], betas_j[:, None])
            xm, _, (pm, lm), accept = stretch_half_update(
                lp_fn, u3, x[:, sl_m], tgt_m, x[:, sl_f], a, D,
                has_aux=True, aux_move=(pri[:, sl_m], lik[:, sl_m]))
            x = x.at[:, sl_m].set(xm)
            pri = pri.at[:, sl_m].set(pm)
            lik = lik.at[:, sl_m].set(lm)
            acc = acc.at[:, sl_m].add(accept.astype(dtype))
            return x, pri, lik, acc

        x, pri, lik, acc = half(x, pri, lik, acc, u[0], 0)
        x, pri, lik, acc = half(x, pri, lik, acc, u[1], 1)

        # swap sweep between adjacent rungs (random walker pairing);
        # priors cancel in the exchange ratio, only logL enters
        kp, kw = jax.random.split(ks)
        perm_u = jax.random.uniform(kp, (K - 1, W), dtype=dtype)
        jidx = jnp.argsort(perm_u, axis=1)
        u_sw = jax.random.uniform(kw, (K - 1, W), dtype=dtype)

        def swap_pair(carry, kk):
            x, pri, lik, sacc = carry
            idx = jidx[kk]
            lik_a, lik_b = lik[kk], lik[kk + 1][idx]
            # guard the -inf - -inf case (both rungs vetoed): no move
            dlik = jnp.where(jnp.isfinite(lik_b) | jnp.isfinite(lik_a),
                             lik_b - lik_a, 0.0)
            logr = (betas_j[kk] - betas_j[kk + 1]) * dlik
            accept = jnp.log(u_sw[kk]) < jnp.where(jnp.isnan(logr),
                                                   -jnp.inf, logr)

            def exch(arr):
                # exchange accepted pairs; scatter the swapped-out lower-
                # rung states back through the random pairing
                lo, hi = arr[kk], arr[kk + 1][idx]
                msk = accept[..., None] if arr.ndim == 3 else accept
                new_lo = jnp.where(msk, hi, lo)
                hi_block = arr[kk + 1].at[idx].set(jnp.where(msk, lo, hi))
                return arr.at[kk].set(new_lo).at[kk + 1].set(hi_block)

            x, pri, lik = exch(x), exch(pri), exch(lik)
            sacc = sacc.at[kk].add(accept.mean())
            return (x, pri, lik, sacc), None

        (x, pri, lik, sacc), _ = jax.lax.scan(
            swap_pair, (x, pri, lik, sacc), jnp.arange(K - 1))
        return (x, pri, lik, acc, sacc), None

    @jax.jit
    def drive(x, pri, lik, rkey):
        acc = jnp.zeros((K, W), dtype=dtype)
        sacc = jnp.zeros((K - 1,), dtype=dtype)
        state = (x, pri, lik, acc, sacc)
        if n_burn:
            kb, rkey = jax.random.split(rkey)
            state, _ = jax.lax.scan(step, state, jax.random.split(kb, n_burn))
            x, pri, lik, _, _ = state
            state = (x, pri, lik, jnp.zeros_like(acc), jnp.zeros_like(sacc))

        def outer(state, k):
            state, _ = jax.lax.scan(step, state, jax.random.split(k, thin))
            return state, state[2]          # lik (K, W)

        keys = jax.random.split(rkey, n_steps // thin)
        state, lik_saved = jax.lax.scan(outer, state, keys)
        return state, lik_saved

    pri0, lik0 = parts_all(p0)
    state, lik_saved = drive(p0, pri0, lik0, key)
    lik_np = np.asarray(lik_saved)                    # (n_saved, K, W)

    # --- estimators ---------------------------------------------------------
    dbeta = np.diff(betas_np)                         # (K-1,)
    # stepping stone: bridge k uses samples at rung k (the LOWER beta)
    ss_terms = np.empty(K - 1)
    samp = lik_np.transpose(1, 0, 2).reshape(K, -1)   # (K, n_saved*W)
    for k in range(K - 1):
        ss_terms[k] = _logmeanexp(dbeta[k] * samp[k])
    log_z_ss = float(ss_terms.sum())

    # jackknife over walkers (leave-one-walker-out keeps the within-
    # walker autocorrelation structure intact)
    jk = np.empty(lik_np.shape[2])
    for w in range(lik_np.shape[2]):
        sub = np.delete(lik_np, w, axis=2).transpose(1, 0, 2).reshape(K, -1)
        jk[w] = sum(_logmeanexp(dbeta[k] * sub[k]) for k in range(K - 1))
    nw = jk.size
    log_z_err = float(np.sqrt((nw - 1) / nw * ((jk - jk.mean()) ** 2).sum()))

    with np.errstate(invalid="ignore"):
        mean_ll = samp.mean(axis=1)                   # -inf/NaN propagate
    log_z_ti = float(np.trapezoid(mean_ll, betas_np)) \
        if np.isfinite(mean_ll).all() else float("-inf")

    x, pri, lik, acc, sacc = state
    return EvidenceResult(
        log_z=log_z_ss,
        log_z_ti=log_z_ti,
        log_z_err=log_z_err,
        betas=betas_np,
        mean_log_like=mean_ll,
        ss_terms=ss_terms,
        acceptance_fraction=np.asarray(acc) / float(n_steps),
        swap_acceptance=np.asarray(sacc) / float(n_steps),
        log_like_samples=lik_np,
        final_state=(x, pri, lik),
    )


def _logmeanexp(v: np.ndarray) -> float:
    """log(mean(exp(v))) with -inf entries contributing zero mass."""
    m = np.max(v)
    if not np.isfinite(m):
        return float(m)                      # all -inf (or an inf blow-up)
    return float(m + np.log(np.mean(np.exp(v - m))))


def model_evidence(model, n_rungs: int = 16, n_walkers: int = 128,
                   n_steps: int = 2000, n_burn: int = 2000,
                   thin: int = 10, seed: int = 0, power: float = 5.0,
                   p0=None) -> EvidenceResult:
    """Evidence of a JointModel on its bound data: splits the posterior
    into the prior/likelihood factors (JointModel.log_prior_only /
    log_data_like) and runs the ladder.  Compare families via
    log Bayes factor = result_A.log_z - result_B.log_z (each model's
    own normalized prior is the reference measure)."""
    lpri = jax.jit(jax.vmap(model.log_prior_only))
    llik = jax.jit(jax.vmap(model.log_data_like))
    if p0 is None:
        from .stretch import generate_init_positions

        theta0 = jnp.asarray(model.params.thawed_values())
        p0 = generate_init_positions(
            jax.jit(jax.vmap(model.log_like)), theta0, n_walkers,
            jax.random.PRNGKey(seed + 1))
    return run_evidence_ladder(
        lpri, llik, p0, power_betas(n_rungs, power), n_steps,
        jax.random.PRNGKey(seed), n_burn=n_burn, thin=thin)
