"""Posterior parity: the TPU-resident sampler vs an independent, plain
numpy implementation of the Goodman-Weare stretch move on the REAL joint
CL J1226 posterior (SURVEY.md §7.2's 'CPU emcee + scipy' parity strategy —
emcee is not installed, so the CPU reference is implemented here from the
published algorithm, sharing only the jitted likelihood).

Statistical power (VERDICT r4 #1): the r1-r4 version of this test
accepted median pulls up to 0.75 posterior widths — that detects only a
grossly broken sampler.  This version runs K fixed-seed REPLICATES of
both samplers and compares replicate-mean medians and replicate-median
widths against bands calibrated on this exact schedule
(scripts/parity_power_calibrate.py, three independent realisations
in results/parity_power_calibration_s{0,1000,2000}.json):

  * correct-vs-correct scatter: max |median diff| 0.058 / 0.086 /
    0.033 widths, max |log width ratio| 0.060 / 0.052 over THREE
    realisations (seed bases 0/1000/2000) — the bands below carry
    >= 1.6x margin;
  * a z-exponent (d-1) -> (d+1) broken move measures at
    max |log width ratio| 0.193 / 0.194 (stable across realisations) —
    the negative-control test asserts this FAILS the parity criteria;
  * the canonical subtler bug, (d-1) -> d, measures at only
    0.046-0.111 widths on this posterior (below any affordable test's
    resolution — two calibration realisations disagree on whether it is
    even visible), which is why the control uses the +2 offset: it is a
    genuine 0.2-sd-class move-law distortion.

Reference for the move law: /root/reference/joxsz_funcs.py:572-635.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joxsz_tpu.config import JoXSZConfig
from joxsz_tpu.build import build_session

# schedule the bands are calibrated for — changing any of these without
# re-running scripts/parity_power_calibrate.py invalidates the bands
W, BURN, STEPS = 256, 1000, 4000
K_REF, K_DEV, K_CTRL = 3, 3, 2
MED_BAND = 0.20     # max |median diff| in pooled posterior widths
WIDTH_BAND = 0.12   # max |log width ratio|


def numpy_stretch_sampler(log_prob_batch, p0, n_steps, rng, a=2.0,
                          z_exponent_offset=0):
    """Independent reference implementation of the red-black stretch
    move (Goodman & Weare 2010; emcee's algorithm).  Only the
    LIKELIHOOD is shared with the device sampler — proposal, partner
    draw and acceptance are plain numpy.  ``z_exponent_offset`` breaks
    the acceptance exponent (d-1) -> (d-1+offset) for the negative
    control."""
    x = np.array(p0, dtype=float)
    n_w, d = x.shape
    h = n_w // 2
    expo = d - 1 + z_exponent_offset
    lp = np.array(log_prob_batch(jnp.asarray(x)))
    chain = []
    for _ in range(n_steps):
        for (m0, m1), (f0, f1) in (((0, h), (h, n_w)), ((h, n_w), (0, h))):
            mv = slice(m0, m1)
            nm = m1 - m0
            z = (1 / np.sqrt(a) + rng.random(nm)
                 * (np.sqrt(a) - 1 / np.sqrt(a))) ** 2
            partner = rng.integers(0, f1 - f0, nm)
            xp = x[f0:f1][partner]
            y = xp + z[:, None] * (x[mv] - xp)
            lp_y = np.asarray(log_prob_batch(jnp.asarray(y)))
            accept = (np.log(rng.random(nm))
                      < expo * np.log(z) + lp_y - lp[mv])
            x[mv] = np.where(accept[:, None], y, x[mv])
            lp[mv] = np.where(accept, lp_y, lp[mv])
        chain.append(x.copy())
    return np.array(chain)


def _session(ref_data):
    sess = build_session(JoXSZConfig.cl1226(str(ref_data)))
    centre = {
        "log(n_0)": -1.39, r"\beta": 0.64, "log(r_c)": 2.0,
        "log(r_s)": 3.0, r"\epsilon": 0.5, "log(T_X/T_{SZ})": 0.09,
        "Z": 0.1, "P_0": 0.18, "a": 5.0, "b": 2.2, "r_p": 149.0,
        "backscale": 0.96, "calibration": 1.0,
    }
    theta_c = np.array([centre[n] for n in sess.params.thawed])
    ll_batch = jax.jit(jax.vmap(sess.log_like))
    return sess, theta_c, ll_batch


def _init(theta_c, rng):
    return theta_c[None] * (
        1 + 0.02 * rng.standard_normal((W, theta_c.size)))


def _np_replicates(ll_batch, theta_c, k, seed0, z_exponent_offset=0):
    meds, stds = [], []
    for r in range(k):
        rng = np.random.default_rng(seed0 + r)
        ch = numpy_stretch_sampler(ll_batch, _init(theta_c, rng),
                                   BURN + STEPS, rng,
                                   z_exponent_offset=z_exponent_offset)
        flat = ch[BURN:].reshape(-1, theta_c.size)
        meds.append(np.median(flat, axis=0))
        stds.append(np.std(flat, axis=0))
    return np.array(meds), np.array(stds)


def _device_replicates(ll_batch, theta_c, k, seed0):
    from joxsz_tpu.sampling.stretch import run_ensemble

    meds, stds = [], []
    for r in range(k):
        rng = np.random.default_rng(seed0 + r)
        # keys 50+r / 150+r match scripts/parity_power_calibrate.py's
        # device replicates exactly, so the test reproduces the
        # calibrated realisation rather than drawing a fresh one
        res = run_ensemble(ll_batch, jnp.asarray(_init(theta_c, rng)),
                           BURN, jax.random.PRNGKey(50 + r), thin=BURN)
        res = run_ensemble(ll_batch, res.final_state[0], STEPS,
                           jax.random.PRNGKey(150 + r), thin=1)
        flat = res.chain.reshape(-1, theta_c.size)
        meds.append(np.median(flat, axis=0))
        stds.append(np.std(flat, axis=0))
    return np.array(meds), np.array(stds)


def _parity_stats(ma, sa, mb, sb):
    """(max |median diff| / width, max |log width ratio|): replicate-mean
    medians, replicate-MEDIAN widths (posterior widths are heavy-tailed
    run to run — docs/PERFORMANCE.md — so a mean would let one tail
    replicate dominate)."""
    wa = np.median(sa, axis=0)
    wb = np.median(sb, axis=0)
    width = 0.5 * (wa + wb)
    dmed = np.max(np.abs(ma.mean(0) - mb.mean(0)) / width)
    dwidth = np.max(np.abs(np.log(wa / wb)))
    return dmed, dwidth


@pytest.fixture(scope="module")
def replicate_summaries(ref_data):
    sess, theta_c, ll_batch = _session(ref_data)
    del sess
    m_np, s_np = _np_replicates(ll_batch, theta_c, K_REF, 100)
    m_jx, s_jx = _device_replicates(ll_batch, theta_c, K_DEV, 500)
    m_bad, s_bad = _np_replicates(ll_batch, theta_c, K_CTRL, 7000,
                                  z_exponent_offset=2)
    return dict(np=(m_np, s_np), jx=(m_jx, s_jx), bad=(m_bad, s_bad))


@pytest.mark.slow
def test_joint_posterior_parity(replicate_summaries):
    """The device sampler agrees with the independent numpy referee
    within the calibrated correct-vs-correct bands (>= 1.6x margin over
    the measured replicate scatter on this schedule)."""
    dmed, dwidth = _parity_stats(*replicate_summaries["np"],
                                 *replicate_summaries["jx"])
    assert dmed < MED_BAND, (
        f"median disagreement {dmed:.3f} widths >= {MED_BAND} "
        f"(calibrated correct-case max 0.086)")
    assert dwidth < WIDTH_BAND, (
        f"width disagreement |log ratio| {dwidth:.3f} >= {WIDTH_BAND} "
        f"(calibrated correct-case max 0.060)")


@pytest.mark.slow
def test_joint_posterior_parity_negative_control(replicate_summaries):
    """Power check: a deliberately broken stretch move (z-exponent
    (d-1) -> (d+1), a 0.2-sd-class move-law distortion) MUST fail the
    parity criteria — otherwise the parity test is vacuous.  Measured
    signature: ~21% width inflation (|log ratio| 0.193/0.194 in both
    calibration realisations) vs the 0.12 band."""
    dmed, dwidth = _parity_stats(*replicate_summaries["bad"],
                                 *replicate_summaries["jx"])
    assert not (dmed < MED_BAND and dwidth < WIDTH_BAND), (
        "the broken-move control PASSED the parity criteria "
        f"(dmed {dmed:.3f}, dwidth {dwidth:.3f}) — the test has no "
        "power")
    # and specifically through its stable signature
    assert dwidth >= WIDTH_BAND, (
        f"broken-move width signature {dwidth:.3f} below the "
        f"{WIDTH_BAND} band")
