"""emcee-API compatibility shim (joxsz_tpu/emcee_compat.py): the
reference's post-processing consumes emcee.EnsembleSampler accessors
(/root/reference/joxsz_main.py:203-214); migrating scripts must find the
same surface here."""

import numpy as np
import pytest
import jax.numpy as jnp

from joxsz_tpu.emcee_compat import EnsembleSampler, State


def _log_prob(x):
    return -0.5 * jnp.sum(x * x)


def _log_prob_vec(x, scale=1.0):
    return -0.5 * jnp.sum((x / scale) ** 2, axis=-1)


def test_run_mcmc_and_accessors():
    W, D = 16, 3
    s = EnsembleSampler(W, D, _log_prob, seed=1)
    p0 = 0.1 * np.random.default_rng(0).normal(size=(W, D))
    last = s.run_mcmc(p0, 200, thin_by=2)
    assert isinstance(last, State)
    assert last.coords.shape == (W, D) and last.log_prob.shape == (W,)

    # emcee v3 accessors
    assert s.get_chain().shape == (200, W, D)
    assert s.get_chain(flat=True).shape == (200 * W, D)
    assert s.get_chain(discard=50, thin=3).shape == (50, W, D)
    assert s.get_log_prob().shape == (200, W)
    assert s.get_log_prob(flat=True).shape == (200 * W,)
    assert np.all((s.acceptance_fraction > 0) & (s.acceptance_fraction < 1))

    # emcee v2 accessors the reference uses (joxsz_main.py:213)
    assert s.chain.shape == (W, 200, D)
    assert s.flatchain.shape == (200 * W, D)
    assert s.lnprobability.shape == (W, 200)

    # continue from the stored state (emcee's initial_state=None)
    s.run_mcmc(None, 50, thin_by=2)
    assert s.get_chain().shape == (250, W, D)

    # posterior is the unit Gaussian
    flat = s.get_chain(flat=True, discard=100)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.15)
    assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.2)


def test_vectorized_log_prob_and_args():
    W, D = 12, 2
    s = EnsembleSampler(W, D, _log_prob_vec, vectorize=True,
                        kwargs={"scale": 2.0}, seed=3)
    p0 = 0.1 * np.random.default_rng(1).normal(size=(W, D))
    s.run_mcmc(p0, 300)
    flat = s.get_chain(flat=True, discard=150)
    assert np.all(np.abs(flat.std(axis=0) - 2.0) < 0.5)


def test_moves_spec_and_generator():
    W, D = 16, 2
    for moves in ["de", "snooker", ("stretch", 3.0), [("de", 1.0)]]:
        s = EnsembleSampler(W, D, _log_prob, moves=moves, seed=5)
        p0 = 0.3 * np.random.default_rng(2).normal(size=(W, D))
        states = list(s.sample(p0, iterations=5, thin_by=2))
        assert len(states) == 5
        assert s.get_chain().shape == (5, W, D)
    with pytest.raises(ValueError, match="mixtures"):
        EnsembleSampler(W, D, _log_prob, moves=[("de", 0.8),
                                                ("snooker", 0.2)])


def test_autocorr_time_guard():
    W, D = 16, 2
    s = EnsembleSampler(W, D, _log_prob, seed=7)
    p0 = 0.1 * np.random.default_rng(3).normal(size=(W, D))
    s.run_mcmc(p0, 10)
    with pytest.raises(RuntimeError, match="too short"):
        s.get_autocorr_time()
    tau_q = s.get_autocorr_time(quiet=True)
    assert tau_q.shape == (D,) and np.all(tau_q >= 1.0)
    s.run_mcmc(None, 1000)
    tau = s.get_autocorr_time(discard=100)
    assert tau.shape == (D,) and np.all(np.isfinite(tau))


def test_constructor_guards():
    with pytest.raises(ValueError, match="even"):
        EnsembleSampler(15, 3, _log_prob)
    with pytest.raises(ValueError, match="2\\*ndim"):
        EnsembleSampler(6, 3, _log_prob)
