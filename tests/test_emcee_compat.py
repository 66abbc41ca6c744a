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


def test_singleton_weight_is_not_a_scale():
    """emcee's canonical moves=[(StretchMove(), 1.0)] translates to
    [('stretch', 1.0)] — the 1.0 is a mixture WEIGHT.  Reading it as the
    stretch scale a=1.0 would make every proposal y = x (z == 1) and
    silently freeze the sampler."""
    from joxsz_tpu.emcee_compat import _resolve_move

    assert _resolve_move([("stretch", 1.0)]) == ("stretch", 2.0, None)
    assert _resolve_move([("de", 1.0)]) == ("de", 2.0, None)
    # bare tuples DO carry the move parameter
    assert _resolve_move(("stretch", 3.0)) == ("stretch", 3.0, None)
    name, a, g = _resolve_move(("de", 0.5))
    assert (name, a, g) == ("de", 2.0, 0.5)
    with pytest.raises(ValueError, match="must be > 1"):
        _resolve_move(("stretch", 1.0))

    # end-to-end: the singleton-weight form must actually move
    W, D = 16, 2
    s = EnsembleSampler(W, D, _log_prob, moves=[("stretch", 1.0)], seed=11)
    p0 = 0.3 * np.random.default_rng(5).normal(size=(W, D))
    s.run_mcmc(p0, 50)
    assert not np.allclose(s.get_chain()[-1], p0)
    assert np.any(s.acceptance_fraction < 1.0)


def test_reset_does_not_replay_prng_stream():
    """The canonical burn/reset/sample idiom must not replay the burn-in
    PRNG stream: the production chain's randomness would be correlated
    with its own starting state."""
    W, D = 16, 2
    s = EnsembleSampler(W, D, _log_prob, seed=13)
    p0 = 0.3 * np.random.default_rng(7).normal(size=(W, D))
    burn_last = s.run_mcmc(p0, 20)
    burn_chain = s.get_chain().copy()
    s.reset()
    s.run_mcmc(None, 20)
    # old behavior: fold_in counter reset to 0 -> identical uniforms ->
    # the production run re-traces the burn geometry from its own
    # endpoint; with an independent stream the first accepted states
    # must differ from a replayed-key run started at the same point
    s2 = EnsembleSampler(W, D, _log_prob, seed=13)
    replay = s2.run_mcmc(State(burn_last.coords), 20)
    assert not np.array_equal(s.get_chain(), s2.get_chain())


def test_default_dtype_follows_jax_float():
    s = EnsembleSampler(8, 2, _log_prob)
    assert s._dtype == jnp.result_type(float)


def test_autocorr_time_tiny_chain_clear_error():
    s = EnsembleSampler(8, 2, _log_prob, seed=17)
    p0 = 0.1 * np.random.default_rng(9).normal(size=(8, 2))
    s.run_mcmc(p0, 1)
    with pytest.raises(RuntimeError, match="too short"):
        s.get_autocorr_time(quiet=True)


def test_de_snooker_walker_floors():
    from joxsz_tpu.sampling.stretch import run_ensemble
    import jax

    p0 = jnp.asarray(0.1 * np.random.default_rng(11).normal(size=(4, 1)),
                     jnp.float32)
    lp = jax.vmap(_log_prob)
    with pytest.raises(ValueError, match="snooker move needs >= 6"):
        run_ensemble(lp, p0, 4, jax.random.PRNGKey(0), move="snooker")
    p2 = jnp.asarray(0.1 * np.random.default_rng(12).normal(size=(2, 1)),
                     jnp.float32)
    with pytest.raises(ValueError, match="DE move needs >= 4"):
        run_ensemble(lp, p2, 4, jax.random.PRNGKey(0), move="de")
