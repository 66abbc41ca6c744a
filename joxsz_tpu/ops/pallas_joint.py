"""Pallas TPU mega-kernel: the ENTIRE joint likelihood for a walker tile.

The profiled sampling step at W=4096 spends ~82 us in the two likelihood
matmul fusions and ~150 us in the long chain of small fusions around them
(docs/PERFORMANCE.md).  This kernel collapses the whole joint likelihood —
parameter unpack, priors, gNFW pressure, Vikhlinin density, HSE-mass
monotonicity veto, SZ operator matmuls + conversion, X-ray table lerp +
shell projection + Cash — into ONE VMEM-resident program per walker tile,
eliminating the fusion-chain latency.

Specialisation: the kernel is generated for the flagship reference model
(gNFW pressure + single-mode Vikhlinin density + UPP temperature, the 13
thawed parameters of SURVEY.md §2.4).  Other model configurations use the
general XLA path; the builder returns None when the configuration does not
match.

Correctness: `tests/test_pallas_joint.py` requires agreement (f32
tolerances) with `vmap(model.log_like)` in interpreter mode, including the
veto structure.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False

from .pallas_kernels import _pad_to, _round_up


_REF_THAWED = ["log(n_0)", r"\beta", "log(r_c)", "log(r_s)", r"\epsilon",
               "log(T_X/T_{SZ})", "Z", "P_0", "a", "b", "r_p",
               "backscale", "calibration"]


def _build_spec(sess):
    """Constants + scalar closure data for the flagship joint-likelihood
    kernel body; returns None when the configuration doesn't match."""
    if not _HAVE_PLTPU:
        return None
    p = sess.params
    if p.thawed != _REF_THAWED or sess.model.xray_data is None:
        return None
    if sess.model.sz_data.calc_integ:
        return None

    sz = sess.model.sz_data
    xr = sess.model.xray_data
    op = sess.sz_operator
    f64 = np.float64

    # ---- static scalars -----------------------------------------------------
    alpha = float(p[r"\alpha"].val)          # frozen (0.0)
    gamma = float(p[r"\gamma"].val)          # frozen (3.0)
    c_gnfw = float(p["c"].val)               # frozen (0.014)
    from .. import constants as K

    mass_C = float(K.keV_erg * K.kpc_cm
                   / (K.mu_gas * K.mu_g * K.G_cgs) / K.solar_mass_g)

    # ---- SZ constants ---------------------------------------------------------
    r_pp = np.asarray(sz.r_press_kpc, dtype=f64)       # (313,)
    n_press = r_pp.size
    sep = sz.sep
    NP = _round_up(n_press, 128)                       # 384
    r_pad = _pad_to(r_pp, (NP,))
    r_pad[n_press:] = 1.0                              # keep powers finite
    press_mask = np.zeros(NP); press_mask[:n_press] = 1.0

    n_pix = op.n_pix                                   # 86
    PIX = _round_up(n_pix, 128)                        # 128
    LT = _pad_to(np.asarray(op.L.T, dtype=f64), (NP, PIX))
    n_data = np.asarray(sz.flux).shape[0]
    ND = _round_up(n_data, 128)
    GT = _pad_to(np.asarray(op.G.T, dtype=f64), (PIX, ND))
    flux64 = np.asarray(sz.flux, dtype=f64)
    err64 = np.asarray(sz.flux_err, dtype=f64)
    valid = np.isfinite(flux64) & np.isfinite(err64) & (err64 != 0)
    flux_p = _pad_to(np.where(valid, flux64, 0.0), (ND,))
    w_p = _pad_to(np.where(valid, 1.0 / np.where(valid, err64, 1.0), 0.0),
                  (ND,))
    w_T0 = _pad_to(np.asarray(op.w_T0, dtype=f64), (NP,))
    conv_T = [float(v) for v in np.asarray(sz.conv_T)]
    conv_val = [float(v) for v in np.asarray(sz.conv_val)]
    n_conv = len(conv_T)

    # ---- X-ray constants (native small dims; Mosaic pads lanes itself) -------
    midpt = np.asarray(xr.midpt_kpc, dtype=f64)        # (15,)
    n_sh = midpt.size
    counts_mask = np.asarray(xr.counts_mask, dtype=f64)     # (10, 15)
    counts_filled = np.asarray(xr.counts_filled, dtype=f64)
    n_band = counts_mask.shape[0]
    exps = np.asarray(xr.exposures, dtype=f64)
    ascl = np.asarray(xr.areascales, dtype=f64)
    areas = np.asarray(xr.areas, dtype=f64)
    backr = np.asarray(xr.backrates, dtype=f64)
    sig_c = exps * ascl                                # (10, 15)
    bg_c = backr * exps * areas
    volsT = np.asarray(xr.vols_norm, dtype=f64).T.copy()    # (shell, ann)

    Tlog = np.asarray(xr.table.Tlog, dtype=f64)
    nT = Tlog.size                                      # 64
    t0g = float(Tlog[0])
    dtg = float(Tlog[1] - Tlog[0])
    LR0 = np.asarray(xr.table.lograte_Z0, dtype=f64)    # (10, nT)
    LR1 = np.asarray(xr.table.lograte_Z1, dtype=f64)

    # ---- hat-basis matmul formulation of the X-ray table lerp ---------------
    # Linear interpolation is linear in the table values:
    #   lerp(pos)[b] = sum_k max(0, 1-|pos-k|) * LR[b, k]
    # so the whole (band, shell) lookup collapses to ONE MXU matmul of a
    # sparse hat-activation matrix against a precomputed table operator,
    # replacing the O(nT*band) chain of tiny VPU FMAs that dominated the
    # kernel's runtime.  Lane layout: shells j get 128-aligned groups
    # (KG lanes each, k = lane index in group; k >= nT is disabled via an
    # off-grid KV so the hat is exactly zero there).
    KG = _round_up(nT, 128)                            # 128
    NSK = n_sh * KG                                    # 1920
    NBS = n_band * n_sh                                # 150 flat (band, shell)
    kv = np.full((1, NSK), -1e9)
    for j in range(n_sh):
        kv[0, j * KG: j * KG + nT] = np.arange(nT)
    M0 = np.zeros((NSK, NBS))
    M1 = np.zeros((NSK, NBS))
    for j in range(n_sh):
        for b in range(n_band):
            M0[j * KG: j * KG + nT, b * n_sh + j] = LR0[b]
            M1[j * KG: j * KG + nT, b * n_sh + j] = LR1[b]
    # block-diagonal shell->annulus projection per band (150, 150)
    VB = np.zeros((NBS, NBS))
    for b in range(n_band):
        VB[b * n_sh:(b + 1) * n_sh, b * n_sh:(b + 1) * n_sh] = volsT
    sig_flat = sig_c.reshape(1, NBS)                   # (1, 150) band-major
    bg_flat = bg_c.reshape(1, NBS)
    cm_flat = counts_mask.reshape(1, NBS)
    ct_flat = counts_filled.reshape(1, NBS)

    # ---- priors ---------------------------------------------------------------
    lo = np.where(np.isfinite(p.lo), p.lo, -1e30)
    hi = np.where(np.isfinite(p.hi), p.hi, 1e30)
    D = len(_REF_THAWED)
    Dp = _round_up(D, 128)
    lo_p = _pad_to(lo, (Dp,)); lo_p[D:] = -1e30
    hi_p = _pad_to(hi, (Dp,)); hi_p[D:] = 1e30
    isg_p = _pad_to(p.is_gauss.astype(f64), (Dp,))
    mu_p = _pad_to(p.mu, (Dp,))
    sg_p = _pad_to(np.where(p.is_gauss, p.sigma, 1.0), (Dp,))
    sg_p[D:] = 1.0

    f32 = jnp.float32
    const_arrays = [
        ("r", r_pad[None, :]), ("pmask", press_mask[None, :]),
        ("LT", LT), ("GT", GT),
        ("flux", flux_p[None, :]), ("wres", w_p[None, :]),
        ("wT0", w_T0[None, :]),
        ("mid", midpt[None, :]), ("KV", kv),
        ("M0", M0), ("M1", M1), ("VB", VB),
        ("sigf", sig_flat), ("bgf", bg_flat), ("cmf", cm_flat),
        ("ctf", ct_flat),
        ("plo", lo_p[None, :]), ("phi", hi_p[None, :]),
        ("pisg", isg_p[None, :]), ("pmu", mu_p[None, :]),
        ("psg", sg_p[None, :]),
    ]
    const_vals = [jnp.asarray(a, f32) for _, a in const_arrays]
    const_shapes = [tuple(a.shape) for _, a in const_arrays]

    NEG = float("-inf")  # python scalar: kernels must not capture arrays

    def ll_body(th, r_ref, pm_ref, lt_ref, gt_ref, fx_ref, wr_ref,
                wt0_ref, mid_ref, kv_ref, m0_ref, m1_ref, vb_ref, sgf_ref,
                bgf_ref, cmf_ref, ctf_ref, plo_ref, phi_ref, pig_ref,
                pmu_ref, psg_ref):
        """Joint log-likelihood of a (B, Dp) parameter block -> (B, 1).

        Pure function of the block plus the constant refs; shared by the
        batched-likelihood kernel and the fused step-loop kernel."""
        B = th.shape[0]

        def col(i):
            return th[:, i:i + 1]             # (B, 1)

        log_n0, beta, log_rc, log_rs, eps = (col(0), col(1), col(2),
                                             col(3), col(4))
        tratio, Z, P0, a_, b_ = col(5), col(6), col(7), col(8), col(9)
        rp_, bscale, cal = col(10), col(11), col(12)

        # ---- priors ----------------------------------------------------------
        inside = jnp.all((th >= plo_ref[:]) & (th <= phi_ref[:]),
                         axis=1, keepdims=True)          # (B,1)
        zres = (th - pmu_ref[:]) / psg_ref[:]
        gauss = -0.5 * jnp.sum(pig_ref[:] * zres * zres, axis=1,
                               keepdims=True)
        total = jnp.where(inside, gauss, NEG)
        total = jnp.where(log_rc > log_rs, NEG, total)   # r_c <= r_s veto

        r = r_ref[:]                          # (1, NP)
        pmask = pm_ref[:]

        # ---- gNFW pressure + derivative --------------------------------------
        x = r / rp_                            # (B, NP)
        xa = x ** a_
        press = P0 / (x ** c_gnfw * (1.0 + xa) ** ((b_ - c_gnfw) / a_))
        dpress = (-P0 * (c_gnfw + b_ * xa)
                  / (rp_ * x ** (c_gnfw + 1.0)
                     * (1.0 + xa) ** ((b_ - c_gnfw + a_) / a_)))

        # ---- Vikhlinin density ------------------------------------------------
        rc = 10.0 ** log_rc
        rs = 10.0 ** log_rs
        n0 = 10.0 ** log_n0
        xc = r / rc
        xs = r / rs
        ne2 = (n0 * n0 * xc ** (-alpha)
               / ((1.0 + xc * xc) ** (3.0 * beta - alpha / 2.0)
                  * (1.0 + xs ** gamma) ** (eps / gamma)))
        ne = jnp.sqrt(ne2)

        # ---- HSE mass monotonicity veto ---------------------------------------
        m = -dpress * r * r / ne * mass_C      # (B, NP)
        # np.gradient(m) > 0 over the real grid == central differences
        # m[i+1] > m[i-1] at interior points plus one-sided edges
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, NP - 2), 1)
        interior_ok = (m[:, 2:] > m[:, :-2]) | (idx > n_press - 3)
        edge_lo = m[:, 1:2] > m[:, 0:1]
        edge_hi = m[:, n_press - 1:n_press] > m[:, n_press - 2:n_press - 1]
        mono = (jnp.all(interior_ok, axis=1, keepdims=True)
                & edge_lo & edge_hi)
        total = jnp.where(mono, total, NEG)

        # ---- SZ ----------------------------------------------------------------
        pp = press * pmask
        raw = jnp.dot(pp, lt_ref[:], preferred_element_type=jnp.float32)
        t_sz_full = press / ne                 # (B, NP)
        t0 = jnp.sum(t_sz_full * wt0_ref[:], axis=1, keepdims=True)
        pixidx = jax.lax.broadcasted_iota(jnp.int32, (B, PIX), 1)
        t_shift = jnp.concatenate([t0, t_sz_full[:, : PIX - 1]], axis=1)
        t_all = jnp.where(pixidx <= sep, t_shift, 1.0)

        cidx = jnp.zeros_like(t_all, dtype=jnp.int32)
        for k in range(1, n_conv - 1):
            cidx = cidx + (t_all >= conv_T[k]).astype(jnp.int32)
        x0 = jnp.zeros_like(t_all); x1 = jnp.zeros_like(t_all)
        y0 = jnp.zeros_like(t_all); y1 = jnp.zeros_like(t_all)
        for k in range(n_conv - 1):
            s = (cidx == k).astype(t_all.dtype)
            x0 += s * conv_T[k]; x1 += s * conv_T[k + 1]
            y0 += s * conv_val[k]; y1 += s * conv_val[k + 1]
        conv = y0 + (t_all - x0) / (x1 - x0) * (y1 - y0)

        prof = raw * conv * cal
        model = jnp.dot(prof, gt_ref[:], preferred_element_type=jnp.float32)
        resid = (fx_ref[:] - model) * wr_ref[:]
        total = total - 0.5 * jnp.sum(resid * resid, axis=1, keepdims=True)

        # ---- X-ray -------------------------------------------------------------
        midr = mid_ref[:]                      # (1, n_sh)
        xm = midr / rp_
        press_m = P0 / (xm ** c_gnfw
                        * (1.0 + xm ** a_) ** ((b_ - c_gnfw) / a_))
        xcm = midr / rc; xsm = midr / rs
        ne2m = (n0 * n0 * xcm ** (-alpha)
                / ((1.0 + xcm * xcm) ** (3.0 * beta - alpha / 2.0)
                   * (1.0 + xsm ** gamma) ** (eps / gamma)))
        nem = jnp.sqrt(ne2m)                   # (B, n_sh)
        Tm = press_m / nem * 10.0 ** tratio
        tl = jnp.log(jnp.maximum(Tm, 1e-30))
        pos = jnp.clip((tl - t0g) / dtg, 0.0, nT - 1 - 1e-6)

        # hat-basis matmul lerp (see _build_spec): expand pos to the
        # 128-aligned (B, n_sh*KG) lane layout, form the hat activations,
        # contract against the table operators on the MXU
        ne2m_w = nem * nem
        pos_e = jnp.concatenate(
            [jnp.broadcast_to(pos[:, j:j + 1], (B, KG))
             for j in range(n_sh)], axis=1)             # (B, NSK)
        hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos_e - kv_ref[:]))
        l0f = jnp.dot(hat, m0_ref[:], preferred_element_type=jnp.float32)
        l1f = jnp.dot(hat, m1_ref[:], preferred_element_type=jnp.float32)
        rates = jnp.exp(l0f) * (1.0 - Z) + jnp.exp(l1f) * Z   # (B, NBS)
        ne2_e = jnp.concatenate([ne2m_w] * n_band, axis=1)    # (B, NBS)
        emiss = rates * ne2_e
        proj = jnp.dot(emiss, vb_ref[:],
                       preferred_element_type=jnp.float32)    # (B, NBS)
        pred = proj * sgf_ref[:] + bscale * bgf_ref[:]
        okmin = jnp.all(pred > 0.0, axis=1, keepdims=True)
        safe = jnp.where(pred > 0.0, pred, 1.0)
        cash = jnp.sum(cmf_ref[:] * (ctf_ref[:] * jnp.log(safe) - safe),
                       axis=1, keepdims=True)
        total = total + jnp.where(okmin, cash, NEG)

        total = jnp.where(jnp.isnan(total), NEG, total)
        return total

    def kernel(th_ref, *refs):
        const_refs = refs[:-1]
        out_ref = refs[-1]
        out_ref[:] = ll_body(th_ref[:], *const_refs)

    mid_box = jnp.asarray(
        0.5 * (np.clip(lo, -10, 10) + np.clip(hi, -10, 10)), f32)

    return dict(kernel=kernel, ll_body=ll_body, const_vals=const_vals,
                const_shapes=const_shapes, mid_box=mid_box, D=D, Dp=Dp)


def make_joint_core(sess, block_b: int = 128, interpret: bool = False):
    """Build ``ll(thetas) -> (B,)`` as one pallas_call per walker tile.

    Returns None when the session's configuration does not match the
    flagship specialisation or Pallas is unavailable."""
    spec = _build_spec(sess)
    if spec is None:
        return None
    kernel = spec["kernel"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    mid_box = spec["mid_box"]
    D, Dp = spec["D"], spec["Dp"]
    f32 = jnp.float32

    @jax.jit
    def joint_ll(thetas):
        Bt = thetas.shape[0]
        Bp = _round_up(Bt, block_b)
        th_p = jnp.zeros((Bp, Dp), dtype=f32)
        th_p = th_p.at[:Bt, :D].set(thetas.astype(f32))
        # padded walkers stay inside the box so their (discarded) rows stay
        # finite through the math
        th_p = th_p.at[Bt:, :D].set(mid_box[None, :])

        grid = (Bp // block_b,)
        in_specs = [pl.BlockSpec((block_b, Dp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        for shp in const_shapes:
            in_specs.append(pl.BlockSpec(shp, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, 1), f32),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(th_p, *const_vals)
        return out[:Bt, 0]

    return joint_ll


def make_step_kernel(sess, n_inner: int, n_walkers: int, a: float = 2.0,
                     interpret: bool = False, vmem_limit_mb: int = 96,
                     thin: int | None = None):
    """Fused stretch-move sampler: ``n_inner`` FULL ensemble steps inside
    ONE pallas_call, with the joint likelihood, hardware PRNG, one-hot
    partner selection and acceptance all VMEM-resident.

    This amortises the per-invocation pallas overhead (~0.7 ms on this
    backend, see docs/PERFORMANCE.md) over n_inner steps — the route to
    running the mega-kernel likelihood throughput inside the sampler.

    The random stream is the TPU hardware PRNG seeded per invocation (a
    different, validated-distribution stream from the threefry path; use
    distinct seeds per call).

    Returns ``step_block(x, lp, acc, seed)`` with x (W, D); without
    ``thin`` the result is ``(x, lp, acc)``; with ``thin`` the kernel also
    records the walker ensemble every ``thin`` steps VMEM-resident and the
    result is ``(x, lp, acc, chain (n_inner//thin, W, D),
    chain_lp (n_inner//thin, W))``.  Returns None when the configuration
    doesn't match the specialisation.
    """
    spec = _build_spec(sess)
    if spec is None:
        return None
    ll_body = spec["ll_body"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    D, Dp = spec["D"], spec["Dp"]
    W = n_walkers
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    n_keep = 0
    if thin is not None:
        if thin <= 0 or n_inner % thin:
            raise ValueError("n_inner must be a positive multiple of thin")
        n_keep = n_inner // thin
    ll_tile = 256   # likelihood evaluated in (ll_tile, .) row blocks
    f32 = jnp.float32
    sa = float(np.sqrt(a))
    inv24 = float(2.0 ** -24)

    def kernel(seed_ref, x0_ref, lp0_ref, acc0_ref, *refs):
        if n_keep:
            const_refs = refs[:-5]
            xo_ref, lpo_ref, acco_ref, cx_ref, clp_ref = refs[-5:]
        else:
            const_refs = refs[:-3]
            xo_ref, lpo_ref, acco_ref = refs[-3:]
        if not interpret:
            pltpu.prng_seed(seed_ref[0])
        xo_ref[:] = x0_ref[:]
        lpo_ref[:] = lp0_ref[:]
        acco_ref[:] = acc0_ref[:]

        row = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)  # partner cols

        def random_bits(i, which):
            if not interpret:
                return pltpu.prng_random_bits((H, 4))
            # interpret-mode fallback (prng_* has no CPU lowering): a
            # deterministic integer hash — adequate for mechanics tests,
            # NOT for production randomness
            idx = jax.lax.broadcasted_iota(jnp.uint32, (H, 4), 0) * 4                 + jax.lax.broadcasted_iota(jnp.uint32, (H, 4), 1)
            v = (idx + jnp.uint32(seed_ref[0]) * jnp.uint32(2654435761)
                 + jnp.uint32(i) * jnp.uint32(40503)
                 + jnp.uint32(which) * jnp.uint32(10007))
            v = v ^ (v >> 15); v = v * jnp.uint32(2246822519)
            v = v ^ (v >> 13); v = v * jnp.uint32(3266489917)
            return v ^ (v >> 16)

        def half(i, base, fixed_base, which):
            xm = xo_ref[base:base + H, :]
            lm = lpo_ref[base:base + H, :]
            xf = xo_ref[fixed_base:fixed_base + H, :]
            bits = random_bits(i, which)
            # hardware bits are int32: arithmetic >> keeps the sign, so mask
            # to the low 24 bits to get a non-negative value (Mosaic has no
            # uint32->f32 cast); u is then uniform on [0,1)
            u = ((bits >> 8) & 0xFFFFFF).astype(f32) * inv24
            z = (1.0 / sa + u[:, 0:1] * (sa - 1.0 / sa)) ** 2
            pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32), H - 1)
            onehot = (row == pidx).astype(f32)           # (H, H)
            xp = jnp.dot(onehot, xf, preferred_element_type=f32)
            y = xp + z * (xm - xp)
            # evaluate the likelihood in row tiles so the (tile, 384)
            # intermediates bound VMEM instead of (H, 384)
            if H > ll_tile:
                lp_parts = [ll_body(y[t:t + ll_tile], *const_refs)
                            for t in range(0, H, ll_tile)]
                lp_y = jnp.concatenate(lp_parts, axis=0)
            else:
                lp_y = ll_body(y, *const_refs)
            # log(u)=-inf when u==0 -> always accept (correct MH limit)
            logu = jnp.log(u[:, 2:3])
            accept = logu < (D - 1.0) * jnp.log(z) + lp_y - lm
            xo_ref[base:base + H, :] = jnp.where(accept, y, xm)
            lpo_ref[base:base + H, :] = jnp.where(accept, lp_y, lm)
            acco_ref[base:base + H, :] = (acco_ref[base:base + H, :]
                                          + accept.astype(f32))

        def body(i, carry):
            half(i, 0, H, 0)
            half(i, H, 0, 1)
            if n_keep:
                # record the ensemble every `thin` steps
                @pl.when((i + 1) % thin == 0)
                def _():
                    k = (i + 1) // thin - 1
                    cx_ref[pl.ds(k, 1)] = xo_ref[:][None]
                    clp_ref[pl.ds(k, 1)] = lpo_ref[:][None]
            return carry

        jax.lax.fori_loop(0, n_inner, body, 0)

    @jax.jit
    def step_block(x, lp, acc, seed):
        xp = jnp.zeros((W, Dp), dtype=f32).at[:, :D].set(x.astype(f32))
        lpp = lp.astype(f32).reshape(W, 1)
        accp = acc.astype(f32).reshape(W, 1)
        seed_arr = jnp.asarray([seed], dtype=jnp.int32).reshape(1)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x0
            pl.BlockSpec(memory_space=pltpu.VMEM),        # lp0
            pl.BlockSpec(memory_space=pltpu.VMEM),        # acc0
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in const_shapes]
        kwargs = {}
        if not interpret:
            # the default 16MB scoped-vmem budget OOMs past W=512; v5e has
            # 128MB VMEM per core, so raise the ceiling for large ensembles
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        out_shape = [
            jax.ShapeDtypeStruct((W, Dp), f32),
            jax.ShapeDtypeStruct((W, 1), f32),
            jax.ShapeDtypeStruct((W, 1), f32),
        ]
        if n_keep:
            out_shape += [
                jax.ShapeDtypeStruct((n_keep, W, Dp), f32),
                jax.ShapeDtypeStruct((n_keep, W, 1), f32),
            ]
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
            interpret=interpret,
            **kwargs,
        )(seed_arr, xp, lpp, accp, *const_vals)
        x_out, lp_out, acc_out = outs[:3]
        if n_keep:
            return (x_out[:, :D], lp_out[:, 0], acc_out[:, 0],
                    outs[3][:, :, :D], outs[4][:, :, 0])
        return x_out[:, :D], lp_out[:, 0], acc_out[:, 0]

    return step_block
