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

from .pallas_kernels import _pad_to, _round_up, sz_padded_data


_REF_THAWED = ["log(n_0)", r"\beta", "log(r_c)", "log(r_s)", r"\epsilon",
               "log(T_X/T_{SZ})", "Z", "P_0", "a", "b", "r_p",
               "backscale", "calibration"]

# X-ray hat-basis lerp layout (same math, different MXU tiling):
#   "packed" (default) packs SPG = KG//nT shells into each 128-aligned
#     lane group (2 shells/group at the bundled nT=64 — contraction
#     1920 -> 1024) and fuses the Z=0/Z=1 tables into ONE (NSK, 2*NBS)
#     operator whose Z-mix rides the doubled projection matmul — ~40%
#     of the legacy layout's issued MXU FLOPs for the dominant X-ray
#     chunk (docs/PERFORMANCE.md cost structure);
#   "legacy" keeps one shell per group and two separate table matmuls.
# Module-level so the same-claim A/B script (scripts/
# tpu_xray_fuse_bench.py) can flip it without threading a kwarg through
# every kernel builder; both layouts are bit-checked against the XLA
# path in tests/test_pallas_joint.py.
XRAY_FUSE = "packed"

# Experimental same-claim A/B knobs (scripts/tpu_xray_micro_bench.py):
#   HAT_BF16  — cast the (B, NSK) hat activations to bfloat16 before the
#     table matmul.  The in-kernel f32 dot already runs ONE bf16 MXU
#     pass (CLAUDE.md), so the products see bf16-rounded operands either
#     way; the cast halves the VMEM traffic of the step's largest
#     intermediate (134 MB at W=32768).
#   LNX_CONST — take ln(r) of the constant radial grids from precomputed
#     constant rows (lnr/lnmid) instead of a per-step full-width
#     jnp.log: lnx = lnr - ln(r_p) is the same math with one scalar
#     transcendental per walker in place of a (B, NP) pass.
# Defaults are the measured winners; both change bits (not math), so
# flipping them invalidates bit-exactness pins, not posteriors.
# Measured (same claim, W=32768, scripts/tpu_xray_micro_bench.py):
# HAT_BF16 is 4 us/step SLOWER (the f32 dot's bf16 MXU pass already
# absorbs the conversion) — keep False; LNX_CONST wins 15 us/step
# (1.6%) and its kernel-vs-XLA band on 2048 posterior rows is 0.50 vs
# the base kernel's 0.40 with zero veto flips
# (scripts/tpu_lnx_validate.py PASS) — default True.
HAT_BF16 = False
LNX_CONST = True

#   RECIP_MUL — replace full-width VPU divides/sqrt in the shared
#     profile/veto chunk (the 344 us/step "likelihood_rest" of the peak
#     ablation) with reciprocal-multiplies: per-walker scalar
#     reciprocals 10**(-log_rc)/10**(-log_rs) feed the density x-ratios,
#     ne comes out as ne_inv = rsqrt(ne2) (consumed multiplicatively by
#     T_SZ = P*ne_inv and the mass veto), the veto mass folds dpress
#     algebraically to m = P*r*(c+(b-c)*s)*ne_inv*C, the prior Gaussian
#     folds pig/psg^2 into one weight row, and the y->mJy conversion
#     lerp accumulates host-folded per-segment slopes (dropping the
#     x1/y1 accumulators AND the (B, PIX) divide).  Mosaic has no
#     divide->reciprocal algebraic pass, so each of these is a real
#     multi-cycle VPU op removed.  Same math, different rounding (ULP
#     class — same bit-change policy as LNX_CONST).
# Measured (same claim, W=32768, scripts/tpu_prof_micro_bench.py):
# 918.3 -> 843.2 us/step, a 75 us (8.2%) win, and the kernel-vs-XLA
# band on 2048 posterior rows is IDENTICAL to base (0.50) with zero
# veto flips — default True.  Same-claim chunk attribution: pressure
# transcendentals 11 us, density transcendentals 58 us, mass veto
# (m + shifted compares + reductions) 103 us (results/
# tpu_prof_micro.json).
RECIP_MUL = True
#   VETO_MIN — evaluate the gNFW mass-veto monotonicity test as ONE
#     masked min-reduce over the central differences (min(m[i+2]-m[i])
#     over interior points > 0) instead of a boolean compare + OR +
#     all-reduce chain.  Mathematically the same strict-inequality test
#     (a-b>0 <=> a>b for normal f32 diffs; TPU flush-to-zero could flip
#     a subnormal diff, impossible at mass scale — veto-flip-gated on
#     hardware like every bit-changing knob).
# Measured NEGATIVE (same claim, W=32768, scripts/tpu_veto_min_bench.py,
# results/tpu_veto_min.json): 844.0 -> 850.3 us/step — no win; the
# veto's ~103 us (tpu_prof_micro) is the m computation and the one
# lane-reduce itself, which both forms share, not the compare chain.
# Accuracy identical (posterior-row band 0.5, zero veto flips).  Kept
# as a documented negative: default False.
VETO_MIN = False
#   ILV — issue the X-ray hat-table matmul (the step's largest MXU op,
#     ~130 us of issued FLOPs at W=32768) BEFORE the mass-veto and SZ
#     blocks instead of after them.  Hypothesis (DISPROVED below): the
#     measured chunk costs are ADDITIVE (proposal + X-ray + SZ + shared
#     == full, results/tpu_peak_ablation.json), suggesting the MXU time
#     is fully exposed — the in-order VPU issue stalling at exp(l01)
#     right after the dot.  Hoisting the dot puts ~200 us of
#     independent veto+SZ VPU work between issue and first use.  The
#     pre/post split moves COMPUTATION only; every op and the
#     total-update order (veto -> SZ -> X-ray) are unchanged, so the
#     result is BIT-EXACT vs the linear order (pinned in
#     tests/test_pallas_joint.py) — no band/veto-flip gate needed.
# Measured NEGATIVE (same claim, interleaved A/B/A/B reps,
# scripts/tpu_ilv_bench.py, results/tpu_ilv_bench.json): base 868.5 ->
# ilv 1002.5 us/step at W=32768 (-15.4%) and 135.2 -> 149.5 at W=4096
# (-10.6%); bit-exact confirmed on hardware.  The penalty (~134 us) is
# one M01-matmul wall, i.e. in the LINEAR order the dot was already
# hidden — the additivity of the chunk ablations does NOT mean the MXU
# time is exposed, and lengthening l01's live range across the veto+SZ
# blocks un-hides it.  Kept as a documented negative (the pre/post
# split itself is retained: with ILV=False the call sites lower
# identically to the old linear form, bit-checked in
# tests/test_pallas_joint.py::test_ilv_bit_exact).  Default False.
ILV = False


_VIKH_T_PARAMS = ["T_0", "T_{min}/T_0", "r_{cool}", "a_{cool}", "r_t",
                  "c_t"]


class StackMismatch(ValueError):
    """A multi-cluster stack violates the kernel's shared-instrument
    requirement (raised by _cluster_arrays' validations; the multicluster
    kernel catches exactly this to decline to the XLA path — genuine
    bugs propagate)."""


def _detect_family(thawed, has_xray: bool = True):
    """Model-family detection from the thawed-param layout.

    The kernel is specialised along three independent axes matching the
    component system (models/{pressure,temperature,density}.py):
      pressure    "gnfw" (flagship) | "knots" (config #4 non-parametric)
      temperature "upp" (T = P/ne with a free log-ratio) | "vikh"
                  (parametric Vikhlinin profile, config #4) | "none"
                  (SZ-only sessions: the ratio is frozen, T_SZ = P/ne)
      density     "single" (flagship) | "double" (+beta-model term,
                  reference mydens mode='double', joxsz_funcs.py:341-407)
    Z/backscale present for joint sessions, calibration always.  Returns
    ``(p_fam, t_fam, d_fam, n_knots, cix)`` with ``cix`` the
    name->column map, or None for any other layout (callers fall back to
    the XLA path)."""
    names = set(thawed)
    if len(names) != len(thawed):
        return None
    base = {"log(n_0)", r"\beta", "log(r_c)", "log(r_s)", r"\epsilon",
            "calibration"}
    if has_xray:
        base = base | {"Z", "backscale"}
    if not base <= names:
        return None
    if "log(T_X/T_{SZ})" in names:
        t_fam, t_set = "upp", {"log(T_X/T_{SZ})"}
    elif set(_VIKH_T_PARAMS) <= names:
        t_fam, t_set = "vikh", set(_VIKH_T_PARAMS)
    elif not has_xray:
        t_fam, t_set = "none", set()   # SZ-only: ratio frozen
    else:
        return None
    if {"P_0", "a", "b", "r_p"} <= names:
        p_fam, n_knots = "gnfw", 0
        p_set = {"P_0", "a", "b", "r_p"}
    else:
        n_knots = sum(1 for n in names if n.startswith("logP_"))
        if n_knots < 2:
            return None
        p_set = {f"logP_{i}" for i in range(n_knots)}
        if not p_set <= names:
            return None
        # the kernel reads knot columns as kc0..kc0+n-1; require the
        # contiguous ascending layout the builder produces
        k0 = thawed.index("logP_0")
        if (k0 + n_knots > len(thawed)
                or any(thawed[k0 + i] != f"logP_{i}"
                       for i in range(n_knots))):
            return None
        p_fam = "knots"
    d_set = {"log(n_{02})", r"\beta_2", "log(r_{c2})"}
    if d_set <= names:
        d_fam = "double"
    else:
        d_fam, d_set = "single", set()
    # optional line_scale nuisance (joint sessions only): scales the
    # Z-linear metal-line table component; consumed in ll_body as
    # Z_eff = Z * line_scale — callers check "line_scale" in cix
    ls_set = {"line_scale"} if (has_xray and "line_scale" in names) \
        else set()
    if names != base | t_set | p_set | d_set | ls_set:
        return None
    return (p_fam, t_fam, d_fam, n_knots,
            {n: i for i, n in enumerate(thawed)})


def _cluster_arrays(spec, sz, xr, L, G, w_T0_raw):
    """Ordered list of padded float64 const arrays for ONE cluster, given
    its SZ/X-ray data and linear SZ operators (``xr`` may be None for
    SZ-only sessions — the X-ray block is then omitted; the order always
    matches ``spec["cnames"]``).  ``spec`` carries the shared statics
    (dims, conv/table grids, priors) that are BAKED into the kernel body
    — per-cluster values of those must match and are validated here (the
    multi-cluster kernel requires a common instrument configuration,
    like the flat-batch path)."""
    f64 = np.float64
    NP, PIX, ND = spec["NP"], spec["PIX"], spec["ND"]
    n_press = spec["n_press"]

    r_pp = np.asarray(sz.r_press_kpc, dtype=f64)
    if r_pp.shape != (n_press,) or not np.allclose(r_pp, spec["r_pp"]):
        raise StackMismatch("pressure radial grid differs across the stack")
    if int(sz.sep) != spec["sep"]:
        raise StackMismatch("map geometry (sep) differs across the stack")
    if not (np.allclose(np.asarray(sz.conv_T, dtype=f64), spec["conv_T"])
            and np.allclose(np.asarray(sz.conv_val, dtype=f64),
                            spec["conv_val"])):
        raise StackMismatch(
            "y->mJy conversion tables differ across the stack "
            "(baked into the kernel body)")
    if (xr is None) != (not spec["has_xray"]):
        raise StackMismatch(
            "X-ray data presence differs across the stack")
    if xr is not None:
        n_sh, n_band, nT = spec["n_sh"], spec["n_band"], spec["nT"]
        KG, NSK, NBS = spec["KG"], spec["NSK"], spec["NBS"]
        Tlog = np.asarray(xr.table.Tlog, dtype=f64)
        if Tlog.shape != (nT,) or not np.allclose(Tlog, spec["Tlog"]):
            raise StackMismatch(
                "count-rate log-T grids differ across the stack")
        if spec.get("family") == "knots":
            # the knots AKM lerp weights are baked from the SESSION
            # cluster's annulus midpoints; a stack with different
            # binning would silently evaluate X-ray pressures at the
            # wrong radii (gnfw is safe — it uses the per-cluster midr)
            mp = np.asarray(xr.midpt_kpc, dtype=f64)
            if mp.shape != spec["midpt"].shape or not np.allclose(
                    mp, spec["midpt"]):
                raise StackMismatch(
                    "annulus midpoints differ across the stack "
                    "(knots AKM weights are baked per spec)")

    r_pad = _pad_to(r_pp, (NP,))
    r_pad[n_press:] = 1.0                              # keep powers finite
    press_mask = np.zeros(NP); press_mask[:n_press] = 1.0

    LT = _pad_to(np.asarray(L, dtype=f64).T, (NP, PIX))
    GT = _pad_to(np.asarray(G, dtype=f64).T, (PIX, ND))
    if np.asarray(sz.flux).shape[0] > ND:
        raise StackMismatch("flux profile longer than the spec's padded "
                            "data axis (heterogeneous stack)")
    # shared SZ validity rule (ops.pallas_kernels.sz_padded_data)
    flux_p, w_p = sz_padded_data(sz.flux, sz.flux_err, ND, dtype=f64)
    w_T0 = _pad_to(np.asarray(w_T0_raw, dtype=f64), (NP,))

    xray_arrays = []
    if xr is not None:
        midpt = np.asarray(xr.midpt_kpc, dtype=f64)    # (15,)
        counts_mask = np.asarray(xr.counts_mask, dtype=f64)   # (10, 15)
        counts_filled = np.asarray(xr.counts_filled, dtype=f64)
        exps = np.asarray(xr.exposures, dtype=f64)
        sig_c = exps * np.asarray(xr.areascales, dtype=f64)
        bg_c = (np.asarray(xr.backrates, dtype=f64) * exps
                * np.asarray(xr.areas, dtype=f64))
        volsT = np.asarray(xr.vols_norm, dtype=f64).T.copy()  # (sh, ann)
        LR0 = np.asarray(xr.table.lograte_Z0, dtype=f64)  # (10, nT)
        LR1 = np.asarray(xr.table.lograte_Z1, dtype=f64)

        # hat-basis table operators + block-diagonal projection (see the
        # _build_spec docstring for the formulation).  Shell j lives in
        # lane group g = j // SPG at offset h*nT, h = j % SPG (SPG=1
        # recovers the one-shell-per-group legacy layout); dead lanes
        # keep KV at -1e9 so their hat is exactly zero.
        SPG = spec["SPG"]
        fuse = spec["xray_fuse"]

        def _rows(j):
            g, h = divmod(j, SPG)
            return slice(g * KG + h * nT, g * KG + h * nT + nT)

        kv = np.full((1, NSK), -1e9)
        for j in range(n_sh):
            kv[0, _rows(j)] = np.arange(nT)
        VB = np.zeros((NBS, NBS))
        for b in range(n_band):
            VB[b * n_sh:(b + 1) * n_sh,
               b * n_sh:(b + 1) * n_sh] = volsT
        if fuse == "packed":
            # ONE (NSK, 2*NBS) operator [log-rates(Z=0) | log-rates(Z=1)];
            # the Z-mix is an elementwise lane mask and the projection
            # operator is stacked [VB; VB] so no misaligned lane slice
            # ever materialises: proj = (exp(l01)*zmix*ne2) @ VB2
            # == ((1-Z) exp(l0) + Z exp(l1)) * ne2 @ VB exactly.
            M01 = np.zeros((NSK, 2 * NBS))
            for j in range(n_sh):
                for b in range(n_band):
                    M01[_rows(j), b * n_sh + j] = LR0[b]
                    M01[_rows(j), NBS + b * n_sh + j] = LR1[b]
            table_ops = [M01, np.vstack([VB, VB])]
        else:
            M0 = np.zeros((NSK, NBS))
            M1 = np.zeros((NSK, NBS))
            for j in range(n_sh):
                for b in range(n_band):
                    M0[_rows(j), b * n_sh + j] = LR0[b]
                    M1[_rows(j), b * n_sh + j] = LR1[b]
            table_ops = [M0, M1, VB]
        xray_arrays = [
            midpt[None, :], np.log(midpt)[None, :], kv, *table_ops,
            sig_c.reshape(1, NBS), bg_c.reshape(1, NBS),
            counts_mask.reshape(1, NBS), counts_filled.reshape(1, NBS),
        ]

    # integrated-Y Gaussian term: constants encode on/off (zero weights
    # when calc_integ is off make the term vanish — no kernel branch);
    # 1/sigma is folded into the weights so the term is
    # -0.5 * (wint.pp - mui)^2  (reference joxsz_funcs.py:480-487)
    if getattr(sz, "calc_integ", False):
        wint = _pad_to(np.asarray(sz.integ_w, dtype=f64)
                       / float(sz.integ_sig), (NP,))
        mu_i = float(sz.integ_mu) / float(sz.integ_sig)
    else:
        wint = np.zeros(NP)
        mu_i = 0.0

    knot_arrays = []
    if spec.get("family") == "knots":
        knot_arrays = [spec["AKP"]]
        if xr is not None:
            knot_arrays.append(spec["AKM"])
        if "RMK" in spec:
            knot_arrays += [spec["RMK"], spec["AKV"], spec["SKV"]]
    return [
        r_pad[None, :], np.log(r_pad)[None, :], press_mask[None, :],
        LT, GT,
        flux_p[None, :], w_p[None, :],
        w_T0[None, :],
    ] + xray_arrays + [
        spec["lo_p"][None, :], spec["hi_p"][None, :],
        spec["isg_p"][None, :], spec["mu_p"][None, :],
        spec["sg_p"][None, :],
        wint[None, :], np.asarray([[mu_i]], dtype=f64),
    ] + knot_arrays


def _build_spec(sess, ablate: str = ""):
    """Constants + scalar closure data for the flagship joint-likelihood
    kernel body; returns None when the configuration doesn't match.

    ``ablate`` ("", "no_xray", "no_sz", "priors", and the packed-layout
    micro-ablations "xray_hatstub"/"xray_noexp"/"xray_nocash") skips
    likelihood sections — a PROFILING tool for cost attribution only
    (scripts/tpu_kernel_ablate.py, scripts/tpu_peak_ablate.py); never
    use for fits.

    The hat-basis X-ray formulation: linear interpolation is linear in the
    table values, so the whole (band, shell) count-rate lookup collapses
    to ONE MXU matmul of sparse hat activations ``max(0, 1-|pos-k|)``
    against a precomputed (n_sh*KG, n_band*n_sh) table operator — replacing
    the O(nT*band) chain of tiny VPU FMAs that previously dominated the
    kernel's runtime.  Lane layout: shells j get 128-aligned groups (KG
    lanes each, k = lane index in group; k >= nT is disabled via an
    off-grid KV so the hat is exactly zero there)."""
    if not _HAVE_PLTPU:
        return None
    p = sess.params
    has_xray = sess.model.xray_data is not None
    fam = _detect_family(p.thawed, has_xray=has_xray)
    if fam is None:
        return None
    family, t_family, d_family, n_knots, cix = fam
    if family == "knots" and not hasattr(sess.model.pressure,
                                         "knots_logr"):
        return None

    sz = sess.model.sz_data
    xr = sess.model.xray_data
    op = sess.sz_operator
    f64 = np.float64

    # ---- static scalars -----------------------------------------------------
    alpha = float(p[r"\alpha"].val)          # frozen (0.0)
    gamma = float(p[r"\gamma"].val)          # frozen (3.0)
    c_gnfw = float(p["c"].val) if family == "gnfw" else 0.0
    mass_veto = bool(getattr(sess.model, "exclude_unphysical_mass", True))
    from .. import constants as K

    mass_C = float(K.keV_erg * K.kpc_cm
                   / (K.mu_gas * K.mu_g * K.G_cgs) / K.solar_mass_g)

    # ---- shared dims / grids (validated per cluster in _cluster_arrays) ----
    r_pp = np.asarray(sz.r_press_kpc, dtype=f64)       # (313,)
    n_press = r_pp.size
    sep = int(sz.sep)
    NP = _round_up(n_press, 128)                       # 384
    n_pix = op.n_pix                                   # 86
    PIX = _round_up(n_pix, 128)                        # 128
    n_data = np.asarray(sz.flux).shape[0]
    ND = _round_up(n_data, 128)
    conv_T = [float(v) for v in np.asarray(sz.conv_T)]
    conv_val = [float(v) for v in np.asarray(sz.conv_val)]
    n_conv = len(conv_T)

    if has_xray:
        midpt = np.asarray(xr.midpt_kpc, dtype=f64)    # (15,)
        n_sh = midpt.size
        n_band = np.asarray(xr.counts_mask).shape[0]
        Tlog = np.asarray(xr.table.Tlog, dtype=f64)
        nT = Tlog.size                                  # 64
        t0g = float(Tlog[0])
        dtg = float(Tlog[1] - Tlog[0])
        # per-shell lane group: 128-aligned.  KG = nT (64, halving the
        # hat matmul contraction via UNALIGNED groups) was measured NOT
        # to help — the 64-lane broadcasts/concat eat the savings — but
        # the "packed" layout keeps groups 128-aligned and instead
        # packs SPG = KG//nT shells per group (pos streams built from
        # aligned broadcasts + one lane-iota select), shrinking the
        # contraction without any unaligned op.
        KG = _round_up(nT, 128)                        # 128
        SPG = max(1, KG // nT) if XRAY_FUSE == "packed" else 1
        NG = -(-n_sh // SPG)                           # groups
        NSK = NG * KG                                  # 1024 packed
        NBS = n_band * n_sh                            # 150 (band, shell)
    else:
        midpt = np.zeros(0)
        n_sh = n_band = nT = 0
        t0g = dtg = 0.0
        KG = NSK = NBS = 0
        SPG, NG = 1, 0
        Tlog = np.zeros(0)

    # ---- priors ---------------------------------------------------------------
    lo = np.where(np.isfinite(p.lo), p.lo, -1e30)
    hi = np.where(np.isfinite(p.hi), p.hi, 1e30)
    D = len(p.thawed)
    Dp = _round_up(D, 128)
    lo_p = _pad_to(lo, (Dp,)); lo_p[D:] = -1e30
    hi_p = _pad_to(hi, (Dp,)); hi_p[D:] = 1e30
    isg_p = _pad_to(p.is_gauss.astype(f64), (Dp,))
    mu_p = _pad_to(p.mu, (Dp,))
    sg_p = _pad_to(np.where(p.is_gauss, p.sigma, 1.0), (Dp,))
    sg_p[D:] = 1.0

    spec = dict(
        NP=NP, PIX=PIX, ND=ND, KG=KG, NSK=NSK, NBS=NBS, SPG=SPG, NG=NG,
        n_press=n_press, n_sh=n_sh, n_band=n_band, nT=nT, sep=sep,
        r_pp=r_pp, conv_T=np.asarray(conv_T), conv_val=np.asarray(conv_val),
        Tlog=Tlog, lo_p=lo_p, hi_p=hi_p, isg_p=isg_p, mu_p=mu_p, sg_p=sg_p,
        D=D, Dp=Dp, family=family, t_family=t_family,
        has_xray=has_xray, midpt=midpt,
    )
    cnames = ["r", "lnr", "pmask", "LT", "GT", "flux_v", "wres", "wT0"]
    fuse = XRAY_FUSE  # frozen into this spec (the global is an A/B knob)
    hat_bf16, lnx_const = HAT_BF16, LNX_CONST     # frozen per spec
    recip_mul = RECIP_MUL
    veto_min = VETO_MIN
    ilv = ILV
    spec["xray_fuse"] = fuse
    spec["hat_bf16"], spec["lnx_const"] = hat_bf16, lnx_const
    spec["recip_mul"] = recip_mul
    spec["veto_min"] = veto_min
    if has_xray:
        cnames += ["midr", "lnmid", "KV"]
        cnames += ["M01"] if fuse == "packed" else ["M0v", "M1v"]
        cnames += ["VBv", "sigf", "bgf", "cmf", "ctf"]
    cnames += ["plo", "phi", "pig", "pmu", "psg", "wint", "mui"]
    if family == "knots":
        cnames += ["AKP"] + (["AKM"] if has_xray else [])
        if mass_veto:
            cnames += ["RMK", "AKV", "SKV"]
    spec["cnames"] = cnames

    if family == "knots":
        # knot pressure: log10 P is a CLAMPED lerp of the free knot
        # values in log10 r (models/pressure.py::KnotPressure via
        # jnp.interp), which is linear in the thawed vector — so P on
        # every fixed radius grid is exp(ln10 * th @ W) with a
        # precomputed (Dp, n_r) weight matrix (knot columns start at
        # thawed index 7), and dP/dr = P * (dlogP/dlogr) / r with a
        # segment-slope matrix (zero in the clamped regions, matching
        # autodiff of the clamped interp)
        klogr = np.asarray(sess.model.pressure.knots_logr, dtype=f64)

        def _lerp_w(logq):
            Wm = np.zeros((logq.size, n_knots))
            Sm = np.zeros((logq.size, n_knots))
            for j, lq in enumerate(logq):
                # strict inequalities: at EXACTLY the first/last knot the
                # XLA path's autodiff derivative flows through the
                # interior (segment-slope) branch of jnp.interp, so the
                # kernel must too (the radius grid's last point IS the
                # last knot in the default geomspace construction)
                if lq < klogr[0]:
                    Wm[j, 0] = 1.0
                elif lq > klogr[-1]:
                    Wm[j, -1] = 1.0
                else:
                    i = min(int(np.searchsorted(klogr, lq, "right")) - 1,
                            n_knots - 2)
                    d = klogr[i + 1] - klogr[i]
                    t = (lq - klogr[i]) / d
                    Wm[j, i] = 1.0 - t; Wm[j, i + 1] = t
                    Sm[j, i] = -1.0 / d; Sm[j, i + 1] = 1.0 / d
            return Wm, Sm

        r_pad_k = _pad_to(r_pp, (NP,)); r_pad_k[n_press:] = 1.0
        Wg, Sg = _lerp_w(np.log10(r_pad_k))
        # compact (n_knots, n_r) weight rows consumed as per-knot VPU
        # FMAs in ll_body — an MXU matmul here runs at bf16-pass
        # precision and the exp + chi^2 amplify the ~4e-3 relative
        # error into O(100) log-likelihood shifts (measured on
        # hardware); 7 exact-f32 FMAs are also fewer FLOPs
        spec["AKP"] = Wg.T.copy()              # (nk, NP)
        if has_xray:
            Wm_mid, _ = _lerp_w(np.log10(midpt))
            spec["AKM"] = Wm_mid.T.copy()      # (nk, n_sh)
        if mass_veto:
            # segment-averaged mass veto: M at one log-midpoint per
            # segment (the family-appropriate criterion, see
            # JointModel._mass_veto_ok); padded lanes replicate the
            # last midpoint and are masked out in ll_body
            n_mid = n_knots - 1
            NM = _round_up(n_mid, 128)
            logr_mid = (klogr[:-1] + klogr[1:]) / 2.0
            logm_pad = np.full(NM, logr_mid[-1])
            logm_pad[:n_mid] = logr_mid
            Wv, Sv = _lerp_w(logm_pad)
            spec["RMK"] = (10.0 ** logm_pad)[None, :]   # (1, NM)
            spec["AKV"] = Wv.T.copy()                   # (nk, NM)
            spec["SKV"] = Sv.T.copy()
            spec["n_mid"] = n_mid

    f32 = jnp.float32
    const_list = _cluster_arrays(spec, sz, xr, op.L, op.G, op.w_T0)
    const_vals = [jnp.asarray(a, f32) for a in const_list]
    const_shapes = [tuple(a.shape) for a in const_list]

    NEG = float("-inf")  # python scalar: kernels must not capture arrays

    LN10 = float(np.log(10.0))
    n_mid = spec.get("n_mid", 0)  # knots veto: real midpoint count

    cnames = spec["cnames"]

    def ll_body(th, *cv):
        """Joint log-likelihood of a (B, Dp) parameter block -> (B, 1).

        Pure function of the block plus the constant VALUES in
        ``spec["cnames"]`` order (callers load them from VMEM refs once,
        outside any step loop); shared by the batched-likelihood,
        step-loop, and multi-cluster kernels."""
        B = th.shape[0]
        C = dict(zip(cnames, cv))
        r, pmask = C["r"], C["pmask"]
        LT, GT = C["LT"], C["GT"]
        flux_v, wres, wT0 = C["flux_v"], C["wres"], C["wT0"]
        plo, phi, pig = C["plo"], C["phi"], C["pig"]
        pmu, psg = C["pmu"], C["psg"]
        wint, mui = C["wint"], C["mui"]

        def col(i):
            return th[:, i:i + 1]             # (B, 1)

        def ncol(name):
            return col(cix[name])

        log_n0, beta = ncol("log(n_0)"), ncol(r"\beta")
        log_rc, log_rs, eps = (ncol("log(r_c)"), ncol("log(r_s)"),
                               ncol(r"\epsilon"))
        if has_xray:
            Z = ncol("Z")
            bscale = ncol("backscale")
            if "line_scale" in cix:
                # line-systematic nuisance: rate = r0 + s*Z*(r1-r0), i.e.
                # s scales exactly the metal-line component (the tables
                # are linear in Z) — static branch, zero cost when frozen
                Z = Z * ncol("line_scale")
        if t_family == "upp":
            tratio = ncol("log(T_X/T_{SZ})")
        elif t_family == "vikh":
            T0v, tminr = ncol("T_0"), ncol("T_{min}/T_0")
            rcool, acool = ncol("r_{cool}"), ncol("a_{cool}")
            rtv, ctv = ncol("r_t"), ncol("c_t")
        if family == "gnfw":
            P0, a_, b_, rp_ = (ncol("P_0"), ncol("a"), ncol("b"),
                               ncol("r_p"))
        else:
            AKP = C["AKP"]
            kc0 = cix["logP_0"]
        if d_family == "double":
            log_n02 = ncol("log(n_{02})")
            beta2 = ncol(r"\beta_2")
            log_rc2 = ncol("log(r_{c2})")
        cal = ncol("calibration")

        def double_beta_ne2(rr):
            # additive beta-model term of the double-mode Vikhlinin
            # density (models/density.py:62-66)
            n02 = 10.0 ** log_n02
            if recip_mul:
                x2 = rr * (10.0 ** (-log_rc2))
            else:
                x2 = rr / (10.0 ** log_rc2)
            return n02 * n02 * jnp.exp(-3.0 * beta2
                                       * jnp.log1p(x2 * x2))

        def vikh_T(rr):
            # parametric Vikhlinin temperature
            # (models/temperature.py::VikhlininTemperature.t_x)
            if recip_mul:
                # (B,1)-scalar reciprocals ahead of the full-width ratio
                xcl = jnp.exp(acool * jnp.log(rr * (1.0 / rcool)))
                xt = rr * (1.0 / rtv)
            else:
                xcl = jnp.exp(acool * jnp.log(rr / rcool))
                xt = rr / rtv
            cool = (xcl + tminr) / (xcl + 1.0)
            outer = jnp.exp(-0.5 * ctv * jnp.log1p(xt * xt))
            return T0v * cool * outer

        # ---- priors ----------------------------------------------------------
        inside = jnp.all((th >= plo) & (th <= phi),
                         axis=1, keepdims=True)          # (B,1)
        dres = th - pmu
        if recip_mul:
            # fold pig/psg^2 into one weight row: a row-shaped divide
            # replaces the (B, Dp) one
            wg = pig / (psg * psg)
            gauss = -0.5 * jnp.sum(wg * dres * dres, axis=1, keepdims=True)
        else:
            zres = dres / psg
            gauss = -0.5 * jnp.sum(pig * zres * zres, axis=1,
                                   keepdims=True)
        total = jnp.where(inside, gauss, NEG)
        total = jnp.where(log_rc > log_rs, NEG, total)   # r_c <= r_s veto

        # ---- pressure + derivative -------------------------------------------
        # transcendental CSE: every pow is exp(k*ln base) on the VPU, so
        # share one ln per distinct base (x and 1+x^a serve press AND
        # dpress) — 2 logs + 3 exps instead of 5 of each; measured ~83us
        # of the 287us W=4096 step was this pressure/density chunk
        if family == "gnfw":
            if lnx_const:
                # same math, one scalar log per walker instead of a
                # (B, NP) transcendental pass (lnr is a constant row)
                lnx = C["lnr"] - jnp.log(rp_)  # (B, NP)
            else:
                lnx = jnp.log(r / rp_)         # (B, NP)
            if ablate == "prof_pressstub":
                # profiling only: drop the exp/log1p/exp chain but keep
                # shapes, data dependence and the downstream arithmetic
                xa = a_ * lnx + 2.0
                press = P0 * (1.0 + 1e-3 * lnx)
            else:
                # ln(1+x^a) as a STABLE softplus (max(z,0)+log1p(e^-|z|))
                # — exp(a ln x) overflows f32 at a*lnx > 88.7, which a
                # custom config (bigger map / wider a box) reaches
                # inside its prior box; log1p(exp(z)) then turns press
                # into exp(-inf)=0 and falsely vetoes XLA-finite states
                # (the models/pressure.py softplus/sigmoid form never
                # materialises x^a — same fix class as a382b23)
                za = a_ * lnx
                ln1xa = (jnp.maximum(za, 0.0)
                         + jnp.log1p(jnp.exp(-jnp.abs(za))))
                press = P0 * jnp.exp(-c_gnfw * lnx
                                     - ((b_ - c_gnfw) / a_) * ln1xa)
            # dP/dr = -(P/r) (c + (b-c) x^a/(1+x^a)): reuses press (one
            # exp fewer) and stays finite wherever press does — the
            # grouped-exponent form still rounds to -0 near the f32
            # underflow edge at in-bounds corners (a~20, r_p~100),
            # where -0 flips the mass veto (see models/pressure.py)
            if ablate == "prof_pressstub":
                sfrac = xa / (1.0 + xa)        # stub: xa is fake-linear
            else:
                # x^a/(1+x^a) = 1 - exp(-ln(1+x^a)): reuses ln1xa,
                # saturates to exactly 1 where exp(a ln x) overflows f32
                # (the XLA path's sigmoid, models/pressure.py) instead
                # of inf/inf = NaN -> false veto — the bundled prior box
                # tops out at a*lnx ~ 78 vs the 88.7 overflow edge, so
                # only custom configs (bigger maps / wider a box) hit
                # it — and swaps a full-width divide for one exp.  The
                # 1-exp cancellation at small ln1xa costs only ~1e-7
                # ABSOLUTE error in sfrac (expm1 would avoid it, but
                # Mosaic has no expm1 lowering — hardware-verified)
                sfrac = 1.0 - jnp.exp(-ln1xa)
            if not recip_mul:
                dpress = -press / r * (c_gnfw + (b_ - c_gnfw) * sfrac)
        else:
            # knot pressure: clamped log-log lerp is linear in th —
            # accumulate per-knot VPU FMAs (exact f32; an MXU matmul
            # here loses ~4e-3 relative and exp + chi^2 blow it up,
            # measured on hardware).  No grid-slope/dpress here: the
            # mass veto for this family works on segment midpoints
            # (below), not the dense grid
            logP = col(kc0) * AKP[0:1, :]
            for ki in range(1, n_knots):
                logP = logP + col(kc0 + ki) * AKP[ki:ki + 1, :]
            press = jnp.exp(LN10 * logP)       # (B, NP)

        # ---- Vikhlinin density ------------------------------------------------
        # frozen-exponent folds: alpha=0 drops its pow entirely, gamma=3
        # is a cube (two multiplies); the param-exponent terms share
        # log1p bases
        if recip_mul:
            # per-walker scalar reciprocals: the (B, NP)/(B, n_sh)
            # x-ratio divides become multiplies (10**-x costs the same
            # scalar exp as 10**x)
            rci = 10.0 ** (-log_rc)
            rsi = 10.0 ** (-log_rs)
        else:
            rc = 10.0 ** log_rc
            rs = 10.0 ** log_rs
        n0 = 10.0 ** log_n0

        def ne2_of(rr):
            xc = rr * rci if recip_mul else rr / rc
            xs = rr * rsi if recip_mul else rr / rs
            if gamma == 3.0:
                xs_g = xs * xs * xs
            else:
                xs_g = xs ** gamma
            if ablate == "prof_densstub":
                # profiling only: drop the log1p/log1p/exp chain, keep
                # the x-ratios and downstream consumers
                ne2 = n0 * n0 * (1.0 + 1e-6 * (xc * xc + xs_g))
            else:
                ne2 = (n0 * n0
                       * jnp.exp(-(3.0 * beta - alpha / 2.0)
                                 * jnp.log1p(xc * xc)
                                 - (eps / gamma) * jnp.log1p(xs_g)))
            if alpha != 0.0:
                ne2 = ne2 * xc ** (-alpha)
            if d_family == "double":
                ne2 = ne2 + double_beta_ne2(rr)
            return ne2

        ne2 = ne2_of(r)
        if recip_mul:
            # one rsqrt serves T_SZ = P*ne_inv and the veto mass —
            # replaces sqrt + two full-width divides
            ne_inv = jax.lax.rsqrt(ne2)
        else:
            ne = jnp.sqrt(ne2)

        # ---- X-ray pre/post split (definitions only; invoked below) -----------
        # Split at the table matmul so ILV can issue the step's dominant
        # MXU op before the independent veto+SZ VPU work (see the ILV
        # knob comment).  The split moves COMPUTATION only: the op set
        # and the total-update order (veto -> SZ -> X-ray) are identical
        # to the linear form, so both orders are bit-exact.
        xray_on = has_xray and ablate not in ("no_xray", "priors")

        def xray_pre():
            """Midpoint profiles, hat construction, table matmul(s)."""
            midr = C["midr"]
            KV = C["KV"]
            if family == "gnfw":
                if lnx_const:
                    lnxm = C["lnmid"] - jnp.log(rp_)
                else:
                    lnxm = jnp.log(midr / rp_)
                zam = a_ * lnxm
                press_m = P0 * jnp.exp(
                    -c_gnfw * lnxm
                    - ((b_ - c_gnfw) / a_)
                    * (jnp.maximum(zam, 0.0)
                       + jnp.log1p(jnp.exp(-jnp.abs(zam)))))  # stable softplus
            else:
                AKM = C["AKM"]
                logPm = col(kc0) * AKM[0:1, :]
                for ki in range(1, n_knots):
                    logPm = logPm + col(kc0 + ki) * AKM[ki:ki + 1, :]
                press_m = jnp.exp(LN10 * logPm)
            ne2m = ne2_of(midr)                    # (B, n_sh)
            if recip_mul:
                ne2m_w = ne2m                      # skip the sqrt roundtrip
                if t_family == "upp":
                    Tm = press_m * jax.lax.rsqrt(ne2m) * 10.0 ** tratio
                else:
                    Tm = vikh_T(midr)
            else:
                nem = jnp.sqrt(ne2m)
                ne2m_w = nem * nem
                if t_family == "upp":
                    Tm = press_m / nem * 10.0 ** tratio
                else:
                    Tm = vikh_T(midr)
            tl = jnp.log(jnp.maximum(Tm, 1e-30))
            if recip_mul:
                pos = jnp.clip((tl - t0g) * (1.0 / dtg), 0.0, nT - 1 - 1e-6)
            else:
                pos = jnp.clip((tl - t0g) / dtg, 0.0, nT - 1 - 1e-6)

            # hat-basis matmul lerp (see _build_spec): expand pos to the
            # 128-aligned lane-group layout, form the hat activations,
            # contract against the table operator(s) on the MXU
            if fuse == "packed":
                # SPG shells per group: SPG aligned broadcast streams
                # merged by one lane-iota select (no unaligned
                # broadcast/concat — the failure mode of the old KG=64
                # attempt)
                streams = []
                for h in range(SPG):
                    cols = [min(g * SPG + h, n_sh - 1) for g in range(NG)]
                    streams.append(jnp.concatenate(
                        [jnp.broadcast_to(pos[:, j:j + 1], (B, KG))
                         for j in cols], axis=1))            # (B, NSK)
                pos_e = streams[0]
                if SPG > 1:
                    lane = (jax.lax.broadcasted_iota(jnp.int32, (B, NSK),
                                                     1) % KG)
                    for h in range(1, SPG):
                        pos_e = jnp.where(lane >= h * nT, streams[h],
                                          pos_e)
                if ablate == "xray_hatstub":
                    # profiling only: skip the hat construction chain but
                    # keep the (B, NSK) materialization + matmul (a cheap
                    # data-dependent stand-in so nothing hoists out of
                    # the step loop)
                    hat = jnp.broadcast_to(pos[:, 0:1], (B, NSK))
                else:
                    hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos_e - KV))
                if hat_bf16:
                    # the f32 dot already runs a bf16 MXU pass; the
                    # explicit cast only halves the biggest
                    # intermediate's VMEM traffic (weights stay f32)
                    hat = hat.astype(jnp.bfloat16)
                l01 = jnp.dot(hat, C["M01"],
                              preferred_element_type=jnp.float32)
                return (l01,), ne2m_w              # (B, 2*NBS)
            pos_e = jnp.concatenate(
                [jnp.broadcast_to(pos[:, j:j + 1], (B, KG))
                 for j in range(n_sh)], axis=1)          # (B, NSK)
            hat = jnp.maximum(0.0, 1.0 - jnp.abs(pos_e - KV))
            l0f = jnp.dot(hat, C["M0v"],
                          preferred_element_type=jnp.float32)
            l1f = jnp.dot(hat, C["M1v"],
                          preferred_element_type=jnp.float32)
            return (l0f, l1f), ne2m_w

        def xray_apply(total, pre):
            """Emissivity, volume projection, Cash — the post-dot ops."""
            tabs, ne2m_w = pre
            VBv = C["VBv"]
            sigf, bgf, cmf, ctf = (C["sigf"], C["bgf"], C["cmf"],
                                   C["ctf"])
            if fuse == "packed":
                (l01,) = tabs
                # Z-mix as an elementwise lane mask; projection operator
                # is [VB; VB], so proj == ((1-Z) e^l0 + Z e^l1) * ne2 @ VB
                lane2 = jax.lax.broadcasted_iota(jnp.int32, (B, 2 * NBS),
                                                 1)
                zmix = jnp.where(lane2 < NBS, 1.0 - Z, Z)
                ne2_ee = jnp.concatenate([ne2m_w] * (2 * n_band), axis=1)
                if ablate == "xray_noexp":   # profiling only
                    emiss = l01 * zmix * ne2_ee
                else:
                    emiss = jnp.exp(l01) * zmix * ne2_ee     # (B, 2*NBS)
            else:
                l0f, l1f = tabs
                rates = (jnp.exp(l0f) * (1.0 - Z)
                         + jnp.exp(l1f) * Z)                 # (B, NBS)
                ne2_e = jnp.concatenate([ne2m_w] * n_band, axis=1)
                emiss = rates * ne2_e
            proj = jnp.dot(emiss, VBv,
                           preferred_element_type=jnp.float32)  # (B, NBS)
            pred = proj * sigf + bscale * bgf
            if ablate == "xray_nocash":      # profiling only
                return total + jnp.sum(pred, axis=1, keepdims=True) * 1e-9
            # positivity veto over VALID cells only (cmf is the counts
            # mask) — matches models/xray.py::xray_log_like's masked
            # form; identical math for all-valid datasets (the bundled
            # cluster), and a masked annulus (exposure 0 -> pred 0)
            # no longer vetoes every theta
            okmin = jnp.all((pred > 0.0) | (cmf == 0.0), axis=1,
                            keepdims=True)
            safe = jnp.where(pred > 0.0, pred, 1.0)
            cash = jnp.sum(cmf * (ctf * jnp.log(safe) - safe),
                           axis=1, keepdims=True)
            return total + jnp.where(okmin, cash, NEG)

        xpre = xray_pre() if (ilv and xray_on) else None

        # ---- HSE mass physicality veto (config-gated like the XLA
        # path's exclude_unphysical_mass; criteria match
        # models/joint.py::_mass_veto_ok per family) ---------------------------
        if mass_veto and ablate == "prof_noveto":
            pass                          # profiling only: veto cost
        elif mass_veto and family == "knots":
            # segment-averaged mass at one log-midpoint per segment,
            # strictly increasing and ending positive
            RMK, AKV, SKV = C["RMK"], C["AKV"], C["SKV"]
            logPm = col(kc0) * AKV[0:1, :]
            slopem = col(kc0) * SKV[0:1, :]
            for ki in range(1, n_knots):
                logPm = logPm + col(kc0 + ki) * AKV[ki:ki + 1, :]
                slopem = slopem + col(kc0 + ki) * SKV[ki:ki + 1, :]
            pressm = jnp.exp(LN10 * logPm)
            # dP/dr = P * dlogP/dlogr / r  =>  M = -P * slope * r / ne * C
            ne2m_v = ne2_of(RMK)
            if recip_mul:
                m = (-pressm * slopem * RMK
                     * jax.lax.rsqrt(ne2m_v) * mass_C)         # (B, NM)
            else:
                m = (-pressm * slopem * RMK
                     / jnp.sqrt(ne2m_v) * mass_C)              # (B, NM)
            NM = m.shape[1]
            idx = jax.lax.broadcasted_iota(jnp.int32, (B, NM - 1), 1)
            inc_ok = (m[:, 1:] > m[:, :-1]) | (idx >= n_mid - 1)
            mono = (jnp.all(inc_ok, axis=1, keepdims=True)
                    & (m[:, n_mid - 1:n_mid] > 0.0))
            total = jnp.where(mono, total, NEG)
        elif mass_veto:
            if recip_mul:
                # algebraic dpress fold: m = -dpress r^2/ne C with
                # dpress = -(P/r)(c+(b-c)s)  =>  P r (c+(b-c)s) ne_inv C
                # (same zeros/signs: m underflows to 0 exactly where
                # dpress rounds to -0)
                m = (press * r * (c_gnfw + (b_ - c_gnfw) * sfrac)
                     * ne_inv * mass_C)        # (B, NP)
            else:
                m = -dpress * r * r / ne * mass_C  # (B, NP)
            # np.gradient(m) > 0 over the real grid == central
            # differences m[i+1] > m[i-1] at interior points plus
            # one-sided edges
            edge_lo = m[:, 1:2] > m[:, 0:1]
            edge_hi = (m[:, n_press - 1:n_press]
                       > m[:, n_press - 2:n_press - 1])
            idx = jax.lax.broadcasted_iota(jnp.int32, (B, NP - 2), 1)
            if veto_min:
                # one masked min-reduce replaces compare+or+all (see
                # VETO_MIN knob comment); iota mask const-folds
                d2 = m[:, 2:] - m[:, :-2]
                mn = jnp.min(jnp.where(idx > n_press - 3, 1.0, d2),
                             axis=1, keepdims=True)
                mono = (mn > 0.0) & edge_lo & edge_hi
            else:
                interior_ok = (m[:, 2:] > m[:, :-2]) | (idx > n_press - 3)
                mono = (jnp.all(interior_ok, axis=1, keepdims=True)
                        & edge_lo & edge_hi)
            total = jnp.where(mono, total, NEG)

        # ---- SZ ----------------------------------------------------------------
        if ablate not in ("no_sz", "priors"):
            pp = press * pmask
            raw = jnp.dot(pp, LT, preferred_element_type=jnp.float32)
            if t_family == "vikh":
                t_sz_full = vikh_T(r)          # parametric T (B, NP)
            elif recip_mul:
                t_sz_full = press * ne_inv     # (B, NP); "upp"/"none"
            else:
                t_sz_full = press / ne         # (B, NP); "upp"/"none"
            t0 = jnp.sum(t_sz_full * wT0, axis=1, keepdims=True)
            pixidx = jax.lax.broadcasted_iota(jnp.int32, (B, PIX), 1)
            t_shift = jnp.concatenate([t0, t_sz_full[:, : PIX - 1]], axis=1)
            t_all = jnp.where(pixidx <= sep, t_shift, 1.0)

            cidx = jnp.zeros_like(t_all, dtype=jnp.int32)
            for k in range(1, n_conv - 1):
                cidx = cidx + (t_all >= conv_T[k]).astype(jnp.int32)
            x0 = jnp.zeros_like(t_all); y0 = jnp.zeros_like(t_all)
            if recip_mul:
                # host-folded per-segment slopes: drops the x1/y1
                # accumulators and the (B, PIX) divide
                sl = jnp.zeros_like(t_all)
                for k in range(n_conv - 1):
                    s = (cidx == k).astype(t_all.dtype)
                    x0 += s * conv_T[k]; y0 += s * conv_val[k]
                    sl += s * ((conv_val[k + 1] - conv_val[k])
                               / (conv_T[k + 1] - conv_T[k]))
                conv = y0 + (t_all - x0) * sl
            else:
                x1 = jnp.zeros_like(t_all); y1 = jnp.zeros_like(t_all)
                for k in range(n_conv - 1):
                    s = (cidx == k).astype(t_all.dtype)
                    x0 += s * conv_T[k]; x1 += s * conv_T[k + 1]
                    y0 += s * conv_val[k]; y1 += s * conv_val[k + 1]
                conv = y0 + (t_all - x0) / (x1 - x0) * (y1 - y0)

            prof = raw * conv * cal
            model = jnp.dot(prof, GT, preferred_element_type=jnp.float32)
            resid = (flux_v - model) * wres
            total = total - 0.5 * jnp.sum(resid * resid, axis=1,
                                          keepdims=True)
            # integrated-Y Gaussian term; wint/mui are zero when the
            # option is off, so this is an exact no-op then
            di = jnp.sum(pp * wint, axis=1, keepdims=True) - mui
            total = total - 0.5 * di * di

        if not xray_on:
            return jnp.where(jnp.isnan(total), NEG, total)

        # ---- X-ray -------------------------------------------------------------
        if xpre is None:
            xpre = xray_pre()
        total = xray_apply(total, xpre)

        total = jnp.where(jnp.isnan(total), NEG, total)
        return total

    def kernel(th_ref, *refs):
        const_refs = refs[:-1]
        out_ref = refs[-1]
        out_ref[:] = ll_body(th_ref[:], *[r[:] for r in const_refs])

    mid_box = jnp.asarray(
        0.5 * (np.clip(lo, -10, 10) + np.clip(hi, -10, 10)), f32)

    return dict(kernel=kernel, ll_body=ll_body, const_vals=const_vals,
                const_shapes=const_shapes, mid_box=mid_box, D=D, Dp=Dp,
                spec=spec)


def make_joint_core(sess, block_b: int = 128, interpret: bool = False,
                    spec=None):
    """Build ``ll(thetas) -> (B,)`` as one pallas_call per walker tile.

    Returns None when the session's configuration does not match the
    flagship specialisation or Pallas is unavailable.  Pass a prebuilt
    ``spec`` (from ``_build_spec(sess)``) to skip rebuilding the constant
    set — the construction pays the full table-operator assembly and is
    noticeable on this 1-core host."""
    if spec is None:
        spec = _build_spec(sess)
    if spec is None:
        return None
    kernel = spec["kernel"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    mid_box = spec["mid_box"]
    D, Dp = spec["D"], spec["Dp"]
    f32 = jnp.float32

    # Data enters the jit as runtime arguments, never closure capture:
    # closed-over arrays are embedded in the lowered HLO as literals, so
    # any dataset change (new cluster, fresh mock noise) would change the
    # module hash and defeat the persistent compile cache — a full Mosaic
    # recompile per dataset on identical shapes.  Same pattern in every
    # step-kernel builder below.
    @jax.jit
    def _joint_ll(thetas, consts):
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
        )(th_p, *consts)
        return out[:Bt, 0]

    consts = tuple(const_vals)

    def joint_ll(thetas):
        return _joint_ll(thetas, consts)

    joint_ll._jitted = _joint_ll    # exposed for the HLO data-
    joint_ll._consts = consts       # independence regression test
    return joint_ll


# partner="auto" switches from the emcee-parity one-hot gather to the
# hashed rotation above this ensemble size: the one-hot matmul is
# O(H^2 Dp) and measured (same claim, scripts/tpu_scaling_partner_bench)
# at 8/38/146 us per step at W=4096/8192/16384 — past this threshold it
# dominates scaling while roll keeps throughput rising (23.3M -> 29.5M
# evals/s at W=16384); mixing is equivalent (tau within 2% at W=2048).
_PARTNER_AUTO_THRESHOLD = 4096


# --- shared in-kernel building blocks ---------------------------------------
# One implementation of the PRNG/uniform/accept/tiled-likelihood machinery
# for all three step-kernel factories (plain / multicluster / tempered):
# these pieces MUST stay in lockstep — a fix applied to one copy and not
# the others (e.g. the int32 bit-masking rule) would silently diverge the
# samplers.  The PRNG/uniform/tiling helpers are bit-exact extractions;
# the accept threshold is normalised to the tempered kernel's
# (D-1)*ln z + (lp_y - lm) association (cancelling the ~1e4-magnitude
# log-likes FIRST is the better-conditioned f32 form), which can flip
# borderline accepts vs pre-refactor plain/multicluster chains — the
# move targets the same posterior, but seed-pinned chains from before
# the refactor are not reproduced bit-for-bit.

def _auto_half_tile(rows: int, H: int, ll_tile: int,
                    threshold: int, target: int = 4096) -> int | None:
    """Pick a walker tile for the half-substep when ``rows`` exceeds the
    proven untiled ceiling: the LARGEST multiple of ``ll_tile`` <=
    ``target`` that divides H (tile sizes 2048-8192 measured within
    1.1%, results/tpu_half_tile.json).  Requiring exactly 4096 silently
    built the untiled kernel — documented to crash the Mosaic compile
    helper with no message — for any W > 32768 whose half is not
    4096-divisible."""
    if rows <= threshold:
        return None
    t = min(target, H)
    t -= t % ll_tile
    while t >= ll_tile:
        if H % t == 0:
            return t
        t -= ll_tile
    return None


def _hash_shift(seed0, i, which, H, extra=None):
    """State-independent hashed rotation shift for the roll-partner
    paths — ONE implementation on purpose: the coupled kernel's
    bit-exactness contract with make_step_kernel (pinned by
    test_coupled_sharded_bitmatches_single_device) depends on literal
    identity of this expression across kernels, and it was previously
    copy-pasted at four sites."""
    v = (jnp.int32(seed0) * jnp.int32(1103515245)
         + i * jnp.int32(40503) + jnp.int32(which) * jnp.int32(10007))
    if extra is not None:
        v = v + jnp.int32(extra) * jnp.int32(7919)
    return jnp.remainder(v >> 7, jnp.int32(H))


def _make_roll_rows(interpret):
    """Row-rotation dispatch shared by every kernel (interpret mode has
    no pltpu.roll lowering)."""
    def roll_rows(x, shift):
        if interpret:
            return jnp.roll(x, shift, axis=0)
        return pltpu.roll(x, shift, 0)

    return roll_rows


def _make_random_bits(interpret, seed_ref, default_shape, extra=None):
    """Per-substep random-bits source.  Hardware: pltpu.prng_random_bits
    (int32 — convert via _uniforms, never a bare shift).  Interpret mode
    has no prng_* lowering: a deterministic integer hash stands in —
    adequate for mechanics tests, NOT for production randomness.
    ``extra`` folds one more stream id into the hash (e.g. the cluster
    grid index); the hardware path instead folds it into prng_seed."""

    def random_bits(i, which, shape=default_shape, row0=0):
        """``row0`` offsets the interpret-mode hash rows so a row-tiled
        caller reproduces the untiled stream bit-for-bit (hardware draws
        from the sequential PRNG stream and ignores it)."""
        if not interpret:
            return pltpu.prng_random_bits(shape)
        idx = ((jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                + jnp.uint32(row0)) * shape[1]
               + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        v = (idx + jnp.uint32(seed_ref[0]) * jnp.uint32(2654435761)
             + jnp.uint32(i) * jnp.uint32(40503)
             + jnp.uint32(which) * jnp.uint32(10007))
        if extra is not None:
            v = v + extra.astype(jnp.uint32) * jnp.uint32(7919)
        v = v ^ (v >> 15)
        v = v * jnp.uint32(2246822519)
        v = v ^ (v >> 13)
        v = v * jnp.uint32(3266489917)
        return v ^ (v >> 16)

    return random_bits


def _uniforms(bits, inv24):
    """Bits -> uniforms on [0, 1).  Hardware bits are INT32: ``>> 8`` is
    an arithmetic shift, so mask to the low 24 bits before the float
    conversion (Mosaic has no uint32->f32 cast) — without the mask the
    uniforms span [-0.5, 0.5) and the sampler silently targets a wrong
    posterior (hardware-only; interpret mode cannot catch it)."""
    return ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * inv24


def _stretch_z(u0, sa):
    """Goodman-Weare stretch factor z ~ g(z) ∝ 1/sqrt(z) on [1/a, a] via
    inverse-CDF of one uniform (sa = sqrt(a))."""
    return (1.0 / sa + u0 * (sa - 1.0 / sa)) ** 2


def _gw_accept(u2, z, lp_y, lm, D, beta=None):
    """Stretch-move acceptance: ln U < (d-1) ln z + [beta*](lp_y - lm).
    log(u)=-inf at u==0 -> always accept (the correct MH limit)."""
    dlp = lp_y - lm if beta is None else beta * (lp_y - lm)
    return jnp.log(u2) < (D - 1.0) * jnp.log(z) + dlp


def _eval_ll_tiled(y, ll_body, const_vals_in, n_rows, ll_tile,
                   use_ll_loop, ysc_ref, lsc_ref):
    """Row-tiled likelihood evaluation (rows are independent, so any
    tiling is bit-identical).  ``use_ll_loop``: fori_loop over a VMEM
    scratch — inlining n_rows/ll_tile copies of the likelihood body
    makes Mosaic compile time explode with the ensemble size (99s at
    W=2048 -> 672s at W=4096 unrolled; 13-75s looped at W=4096-16384)."""
    if use_ll_loop:
        ysc_ref[:] = y

        def tbody(t, c):
            sl = pl.ds(t * ll_tile, ll_tile)
            lsc_ref[sl, :] = ll_body(ysc_ref[sl, :], *const_vals_in)
            return c

        jax.lax.fori_loop(0, n_rows // ll_tile, tbody, 0)
        return lsc_ref[:]
    if n_rows > ll_tile:
        return jnp.concatenate([ll_body(y[t:t + ll_tile], *const_vals_in)
                                for t in range(0, n_rows, ll_tile)],
                               axis=0)
    return ll_body(y, *const_vals_in)


def make_step_kernel(sess, n_inner: int, n_walkers: int, a: float = 2.0,
                     interpret: bool = False, vmem_limit_mb: int = 96,
                     thin: int | None = None, ablate: str = "",
                     unroll: int = 1, chain_space: str = "hbm",
                     partner: str = "auto", ll_tile: int = 256,
                     packed_state: bool = True,
                     half_tile: int | None = None):
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
    records the walker ensemble every ``thin`` steps and the result is
    ``(x, lp, acc, chain (n_inner//thin, W, D),
    chain_lp (n_inner//thin, W))``.  Returns None when the configuration
    doesn't match the specialisation.

    ``chain_space`` places the recorded chain: ``"hbm"`` (default) keeps
    the buffer in HBM and DMAs each frame out of VMEM as it is recorded —
    the chain no longer counts against the ~26 MB proven-safe VMEM output
    budget, so a single invocation can record hundreds of frames at any
    walker count (the DMA is sub-MB per frame, negligible vs a step);
    ``"vmem"`` is the original VMEM-output path, kept for A/B testing.

    ``partner`` selects how each moving walker's complementary-half
    partner is drawn: ``"onehot"`` (emcee-parity) draws an
    i.i.d. uniform index per walker and gathers via an (H, H) one-hot
    MXU matmul — O(H^2 Dp) FLOPs, growing quadratically with the
    ensemble; ``"roll"`` rotates the fixed half by one hashed
    state-independent shift per substep (pltpu.roll, O(H Dp)).  Both
    are valid Goodman-Weare updates: conditional on any
    state-independent partner assignment each walker's Metropolis update
    leaves the product target invariant, and the rotation makes partner
    choice marginally uniform — only cross-walker correlation within one
    substep differs (same device as the swap pairing in the tempered
    kernel).  ``"auto"`` (default) keeps "onehot" up to
    _PARTNER_AUTO_THRESHOLD walkers (where its cost hides behind the
    VPU work) and switches to "roll" above it, where the quadratic
    gather is the measured scaling ceiling and the mixing A/B shows no
    autocorrelation penalty (docs/PERFORMANCE.md).

    ``packed_state`` (default) stores each walker's log-prob and accept
    count in two unused padding lanes of the (W, Dp) position buffer
    instead of separate (W, 1) buffers.  Mosaic lane-pads the last dim
    of every VMEM buffer to 128, so a (W, 1) f32 buffer really
    allocates W*128*4 bytes — the four lp/acc in/out buffers alone cost
    4 x 16.8 MB at W=32768, which (with the x buffers and likelihood
    scratch) blew the VMEM budget and made W >= 32768 fail Mosaic
    compilation.  Packing collapses six big buffers into two and folds
    the lp chain into the recorded position frames (one DMA instead of
    a DMA plus a VMEM output).  The packed lanes are zeroed before the
    likelihood sees the proposal block, so ``ll_body`` input is
    bit-identical to the unpacked layout; ``packed_state=False`` keeps
    the original layout for A/B testing.

    ``half_tile`` tiles the ENTIRE half-substep (partner gather,
    stretch blend, likelihood, accept, write-back) over row blocks of
    the moving half — the W=65536 Mosaic wall was never the state
    buffers (packed + aliased they are one 33.6 MB buffer) but the
    full-width (H, Dp) PROPOSAL intermediates: at H=32768 each of
    xp/y/accept-select is 16.8 MB and several are live at once on top
    of the (H, Dp)+(H, 1) likelihood scratches.  Tiling bounds all of
    them at (half_tile, Dp); only the rolled complementary half
    (one (H, Dp) scratch, partner="roll") stays full-width.  Rows of
    the moving half are independent, so tiling preserves the move law
    exactly; in interpret mode the stream is bit-identical to the
    untiled kernel (the hash PRNG takes a row offset).  On hardware
    ``pltpu.prng_random_bits`` is drawn per tile instead of per half —
    a different (equally valid) stream, posterior-band validated by
    ``scripts/tpu_half_tile_validate.py``.  Default None = untiled up
    to W=32768 (the proven peak), auto half_tile=4096 above it (where
    the untiled kernel fails Mosaic VMEM compilation).
    """
    if chain_space not in ("hbm", "vmem"):
        raise ValueError(f"chain_space must be 'hbm' or 'vmem', "
                         f"got {chain_space!r}")
    if partner == "auto":
        partner = ("roll" if n_walkers > _PARTNER_AUTO_THRESHOLD
                   else "onehot")
    if partner not in ("onehot", "roll"):
        raise ValueError(f"partner must be 'onehot' or 'roll', "
                         f"got {partner!r}")
    chain_hbm = chain_space == "hbm"
    spec = _build_spec(sess, ablate=ablate)
    if spec is None:
        return None
    if ablate == "no_ll":
        # profiling-only: pure proposal/accept machinery cost
        def ll_body(y, *_):
            return jnp.sum(y, axis=1, keepdims=True) * 1e-6
    else:
        ll_body = spec["ll_body"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    D, Dp = spec["D"], spec["Dp"]
    W = n_walkers
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    if n_inner % unroll:
        raise ValueError("n_inner must be a multiple of unroll")
    n_keep = 0
    if thin is not None:
        if thin <= 0 or n_inner % thin:
            raise ValueError("n_inner must be a positive multiple of thin")
        n_keep = n_inner // thin
    f32 = jnp.float32
    sa = float(np.sqrt(a))
    inv24 = float(2.0 ** -24)
    # packed lanes: log-prob and accept count live in the last two
    # padding lanes of the position buffer (guaranteed free: Dp is the
    # 128-padded width and D <= 16 for every family)
    packed = packed_state and D + 2 <= Dp
    DL, DA = Dp - 2, Dp - 1
    if half_tile is None:
        half_tile = _auto_half_tile(W, W // 2, ll_tile, threshold=32768)
    if half_tile is not None:
        if H % half_tile or half_tile % ll_tile:
            raise ValueError(
                f"half_tile ({half_tile}) must divide H ({H}) and be a "
                f"multiple of ll_tile ({ll_tile})")
        if half_tile >= H:
            half_tile = None
    # likelihood evaluated in (ll_tile, .) row blocks so the (tile, 384)
    # intermediates bound VMEM instead of (H, 384); when H divides into
    # tiles the evaluation runs as a fori_loop over a VMEM scratch —
    # inlining H/ll_tile copies of the likelihood body made Mosaic
    # compile time explode with W (99s at W=2048 -> 672s at W=4096).
    # Under half_tile the ll loop runs inside each walker tile instead.
    use_ll_loop = (half_tile is None and H > ll_tile
                   and H % ll_tile == 0)

    def kernel(seed_ref, *refs):
        refs = list(refs)
        sem = ysc_ref = lsc_ref = xroll_ref = None
        clp_ref = lpo_ref = acco_ref = None
        if half_tile is not None:
            if partner == "roll":
                xroll_ref = refs.pop()
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        elif use_ll_loop:
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        if n_keep and chain_hbm:
            sem = refs.pop()
        if n_keep:
            if not packed:
                clp_ref = refs.pop()
            cx_ref = refs.pop()
        if packed:
            # the packed state is input_output_aliased: x0_ref and xo_ref
            # name the SAME buffer (no second (W, Dp) allocation, no copy)
            xo_ref = refs.pop()
            refs.pop(0)
        else:
            acco_ref = refs.pop()
            lpo_ref = refs.pop()
            xo_ref = refs.pop()
            x0_ref = refs.pop(0)
            lp0_ref = refs.pop(0)
            acc0_ref = refs.pop(0)
        const_refs = refs
        if not interpret:
            pltpu.prng_seed(seed_ref[0])
        if not packed:
            xo_ref[:] = x0_ref[:]
            lpo_ref[:] = lp0_ref[:]
            acco_ref[:] = acc0_ref[:]

        TR = half_tile if half_tile is not None else H  # rows per update
        if partner != "roll":
            row = jax.lax.broadcasted_iota(jnp.int32, (TR, H), 1)  # partners
        if packed:
            lane = jax.lax.broadcasted_iota(jnp.int32, (TR, Dp), 1)
            is_pack = (lane == DL) | (lane == DA)
        random_bits = _make_random_bits(interpret, seed_ref, (TR, 4))
        roll_rows = _make_roll_rows(interpret)

        const_vals_in = [r[:] for r in const_refs]   # loaded ONCE

        def half(i, base, fixed_base, which):
            xm = xo_ref[base:base + H, :]
            lm = (xm[:, DL:DL + 1] if packed
                  else lpo_ref[base:base + H, :])
            xf = xo_ref[fixed_base:fixed_base + H, :]
            u = _uniforms(random_bits(i, which), inv24)
            z = _stretch_z(u[:, 0:1], sa)
            if partner == "roll":
                # one hashed state-independent rotation per substep
                # (same device as the tempered kernel's swap pairing)
                shift = _hash_shift(seed_ref[0], i, which, H)
                xp = roll_rows(xf, shift)
            else:
                pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32),
                                   H - 1)
                onehot = (row == pidx).astype(f32)       # (H, H)
                xp = jnp.dot(onehot, xf, preferred_element_type=f32)
            y = xp + z * (xm - xp)
            if packed:
                # zero the packed lanes so ll_body sees exactly the
                # zero-padded block the unpacked layout feeds it (a
                # stretch-blend of log-probs in a padding lane could
                # otherwise reach the full-width prior reductions)
                y = jnp.where(is_pack, 0.0, y)
            lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, H, ll_tile,
                                  use_ll_loop, ysc_ref, lsc_ref)
            accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D)
            if packed:
                y = jnp.where(lane == DL, lp_y, y)
                y = jnp.where(lane == DA, xm[:, DA:DA + 1] + 1.0, y)
                xo_ref[base:base + H, :] = jnp.where(accept, y, xm)
            else:
                xo_ref[base:base + H, :] = jnp.where(accept, y, xm)
                lpo_ref[base:base + H, :] = jnp.where(accept, lp_y, lm)
                acco_ref[base:base + H, :] = (acco_ref[base:base + H, :]
                                              + accept.astype(f32))

        def half_tiled(i, base, fixed_base, which):
            # walker-tiled half-substep: same move law (moving rows are
            # mutually independent), all proposal intermediates bounded
            # at (TR, Dp).  The rolled complementary half is staged once
            # per substep in a full-width scratch so each tile slices it
            # statically (a per-tile modular gather would need dynamic
            # sizes Mosaic doesn't have).
            if partner == "roll":
                shift = _hash_shift(seed_ref[0], i, which, H)
                xf = xo_ref[fixed_base:fixed_base + H, :]
                xroll_ref[:] = roll_rows(xf, shift)

            def tbody(t, c):
                r0 = t * TR
                xm = xo_ref[pl.ds(base + r0, TR), :]
                lm = (xm[:, DL:DL + 1] if packed
                      else lpo_ref[pl.ds(base + r0, TR), :])
                u = _uniforms(random_bits(i, which, (TR, 4), row0=r0),
                              inv24)
                z = _stretch_z(u[:, 0:1], sa)
                if partner == "roll":
                    xp = xroll_ref[pl.ds(r0, TR), :]
                else:
                    pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32),
                                       H - 1)
                    onehot = (row == pidx).astype(f32)   # (TR, H)
                    xp = jnp.dot(onehot,
                                 xo_ref[fixed_base:fixed_base + H, :],
                                 preferred_element_type=f32)
                y = xp + z * (xm - xp)
                if packed:
                    y = jnp.where(is_pack, 0.0, y)
                lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, TR,
                                      ll_tile, TR > ll_tile, ysc_ref,
                                      lsc_ref)
                accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D)
                if packed:
                    y = jnp.where(lane == DL, lp_y, y)
                    y = jnp.where(lane == DA, xm[:, DA:DA + 1] + 1.0, y)
                xo_ref[pl.ds(base + r0, TR), :] = jnp.where(accept, y, xm)
                if not packed:
                    lpo_ref[pl.ds(base + r0, TR), :] = jnp.where(
                        accept, lp_y, lm)
                    acco_ref[pl.ds(base + r0, TR), :] = (
                        acco_ref[pl.ds(base + r0, TR), :]
                        + accept.astype(f32))
                return c

            jax.lax.fori_loop(0, H // TR, tbody, 0)

        def body(i, carry):
            # `unroll` runs several full MCMC steps per loop trip.
            # Measured NEGATIVE result on v5e: unroll 1/2/4 are identical
            # (the ~29 us/step no-likelihood floor is the step's serial
            # data dependencies, not loop bookkeeping) — kept because the
            # serial floor may differ on other TPU generations.
            hfn = half_tiled if half_tile is not None else half
            for u in range(unroll):
                it = i * unroll + u
                hfn(it, 0, H, 0)
                hfn(it, H, 0, 1)
                if n_keep:
                    # record the ensemble every `thin` steps
                    @pl.when((it + 1) % thin == 0)
                    def _():
                        k = (it + 1) // thin - 1
                        if chain_hbm:
                            # DMA the live frame to the HBM chain buffer;
                            # wait immediately (sub-MB copy, microseconds
                            # vs the ~30us+ step) so the source ref is
                            # safe to mutate in the next step.  Packed
                            # layout: the lp lane rides inside the frame,
                            # no separate lp output.  Unpacked: the lp
                            # chain stays a VMEM output but 2D
                            # (n_keep, W) — a (.., W, 1) VMEM buffer is
                            # lane-padded 128x, and its width-1 last dim
                            # can't be HBM-sliced either.
                            cp = pltpu.make_async_copy(
                                xo_ref, cx_ref.at[k], sem)
                            cp.start()
                            cp.wait()
                            if not packed:
                                clp_ref[pl.ds(k, 1), :] = (
                                    lpo_ref[:].reshape(1, W))
                        else:
                            cx_ref[pl.ds(k, 1)] = xo_ref[:][None]
                            if not packed:
                                clp_ref[pl.ds(k, 1)] = lpo_ref[:][None]
            return carry

        jax.lax.fori_loop(0, n_inner // unroll, body, 0)

    @jax.jit
    def _step_block(x, lp, acc, seed, consts):
        xp = jnp.zeros((W, Dp), dtype=f32).at[:, :D].set(x.astype(f32))
        if packed:
            xp = (xp.at[:, DL].set(lp.astype(f32))
                    .at[:, DA].set(acc.astype(f32)))
            state_in = (xp,)
        else:
            lpp = lp.astype(f32).reshape(W, 1)
            accp = acc.astype(f32).reshape(W, 1)
            state_in = (xp, lpp, accp)
        seed_arr = jnp.asarray([seed], dtype=jnp.int32).reshape(1)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in range(len(state_in) + len(const_shapes))]
        kwargs = {}
        if not interpret:
            # the default 16MB scoped-vmem budget OOMs past W=512; v5e has
            # 128MB VMEM per core, so raise the ceiling for large ensembles
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        if packed:
            # alias the packed state in-place (operand 1 -> output 0):
            # one (W, Dp) buffer instead of two, no entry copy — at
            # W=65536 the duplicate alone is 33.6 MB of VMEM
            kwargs["input_output_aliases"] = {1: 0}
            out_shape = [jax.ShapeDtypeStruct((W, Dp), f32)]
        else:
            out_shape = [
                jax.ShapeDtypeStruct((W, Dp), f32),
                jax.ShapeDtypeStruct((W, 1), f32),
                jax.ShapeDtypeStruct((W, 1), f32),
            ]
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape)
        scratch = []
        if n_keep:
            out_shape += [jax.ShapeDtypeStruct((n_keep, W, Dp), f32)]
            if chain_hbm and packed:
                out_specs += [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
                scratch.append(pltpu.SemaphoreType.DMA)
            elif chain_hbm:
                out_shape += [jax.ShapeDtypeStruct((n_keep, W), f32)]
                out_specs += [
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
                scratch.append(pltpu.SemaphoreType.DMA)
            elif packed:
                out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
            else:
                out_shape += [jax.ShapeDtypeStruct((n_keep, W, 1), f32)]
                out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        if half_tile is not None:
            scratch += [pltpu.VMEM((half_tile, Dp), f32),
                        pltpu.VMEM((half_tile, 1), f32)]
            if partner == "roll":
                scratch += [pltpu.VMEM((H, Dp), f32)]
        elif use_ll_loop:
            scratch += [pltpu.VMEM((H, Dp), f32), pltpu.VMEM((H, 1), f32)]
        if scratch:
            kwargs["scratch_shapes"] = scratch
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            **kwargs,
        )(seed_arr, *state_in, *consts)
        if packed:
            x_out = outs[0]
            if n_keep:
                cx = outs[1]
                return (x_out[:, :D], x_out[:, DL], x_out[:, DA],
                        cx[:, :, :D], cx[:, :, DL])
            return x_out[:, :D], x_out[:, DL], x_out[:, DA]
        x_out, lp_out, acc_out = outs[:3]
        if n_keep:
            chlp = outs[4] if chain_hbm else outs[4][:, :, 0]
            return (x_out[:, :D], lp_out[:, 0], acc_out[:, 0],
                    outs[3][:, :, :D], chlp)
        return x_out[:, :D], lp_out[:, 0], acc_out[:, 0]

    consts = tuple(const_vals)

    def step_block(x, lp, acc, seed):
        # consts as jit arguments: keeps the HLO data-independent (see
        # the persistent-cache note in make_joint_ll_kernel)
        return _step_block(x, lp, acc, seed, consts)

    step_block._jitted = _step_block    # exposed for the HLO data-
    step_block._consts = consts         # independence regression test
    return step_block


def make_coupled_half_kernel(sess, n_walkers_total: int, n_shards: int,
                             a: float = 2.0, interpret: bool = False,
                             vmem_limit_mb: int = 96,
                             partner: str = "onehot",
                             ll_tile: int = 256):
    """ONE half-substep of a single W-total Goodman-Weare ensemble,
    updating only this shard's row block against the FULL complementary
    half — the building block of the coupled multi-chip sampler
    (``parallel.kernel_sharded.run_coupled_sharded_ensemble``), which
    all-gathers the complementary half between kernel invocations so one
    ensemble genuinely spans the chips (closes the small-W asymmetry vs
    the XLA sharded path; the independent-per-chip layout remains the
    fast path at >= 64 walkers/chip — measured equivalent there,
    docs/PERFORMANCE.md).

    Bit-exactness contract (pinned by
    ``test_coupled_sharded_bitmatches_single_device``): every per-row
    computation (stretch blend, one-hot partner row, row-tiled
    likelihood, accept) is row-independent, and the random stream is
    addressed by GLOBAL row — each shard draws the full (H, 4) block
    and keeps its rows — so the sampler is BIT-EXACT ACROSS SHARD
    COUNTS: n_shards in {1, 2, 4, 8} give identical chains (measured).
    Vs the fused ``make_step_kernel`` at equal total W and seed
    (interpret mode) the trajectories match but log-probs agree only to
    float32 ULPs (measured max rel 5.2e-7): the two kernels are
    different XLA programs and the compiler contracts the same
    likelihood arithmetic into different FMA forms — exact lp equality
    across differently-fused programs is not a stable property.  On
    hardware the fused kernel seeds once per n_inner-step invocation
    while this kernel reseeds per substep (``prng_seed(seed,
    2*i + which)`` — Mosaic caps prng_seed at 2 values) — a different,
    equally valid stream; all shards draw identical bits, so the
    global update is consistent.

    State is PACKED (``make_step_kernel(packed_state=True)`` layout):
    (rows, Dp) with log-prob in lane Dp-2 and accept count in lane
    Dp-1.  Returns ``half_step(x_upd (H_loc, Dp), x_fixed (H, Dp),
    seed, i, which, row_off) -> x_upd'`` (x_fixed enters raw — its
    packed lanes are zeroed in the proposal exactly as the fused kernel
    does), or None outside the kernel specialisation."""
    if partner not in ("onehot", "roll"):
        raise ValueError(f"partner must be 'onehot' or 'roll', "
                         f"got {partner!r}")
    spec = _build_spec(sess)
    if spec is None:
        return None
    ll_body = spec["ll_body"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    D, Dp = spec["D"], spec["Dp"]
    W = n_walkers_total
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    if H % n_shards:
        raise ValueError(f"half-ensemble ({H}) must divide over "
                         f"{n_shards} shards")
    H_loc = H // n_shards
    f32 = jnp.float32
    sa = float(np.sqrt(a))
    inv24 = float(2.0 ** -24)
    DL, DA = Dp - 2, Dp - 1
    if D + 2 > Dp:      # pragma: no cover — D <= 16 for every family
        return None
    use_ll_loop = H_loc > ll_tile and H_loc % ll_tile == 0

    def kernel(sc_ref, *refs):
        refs = list(refs)
        lsc_ref = ysc_ref = None
        if use_ll_loop:
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        xu_ref = refs.pop()           # output, aliased to operand 1
        refs.pop(0)                   # the aliased x_upd input slot
        xf_ref = refs.pop(0)          # (H, Dp) full complementary half
        const_refs = refs
        if not interpret:
            # Mosaic caps prng_seed at 2 values: fold (i, which) into
            # one per-substep stream id
            pltpu.prng_seed(sc_ref[0], sc_ref[1] * 2 + sc_ref[2])
        i, which, off = sc_ref[1], sc_ref[2], sc_ref[3]
        random_bits = _make_random_bits(interpret, sc_ref, (H, 4))
        const_vals_in = [r[:] for r in const_refs]

        # full-(H, 4) draw addressed by global row, then rotate this
        # shard's rows to the top (roll supports a traced shift; a
        # dynamic_slice start would not be Mosaic-safe on all layouts)
        bits = random_bits(i, which)
        u_full = _uniforms(bits, inv24)
        # non-negative equivalent of a -off roll (traced shifts into
        # pltpu.roll follow the existing kernels' non-negative pattern)
        noff = jnp.remainder(jnp.int32(H) - off, jnp.int32(H))
        if interpret:
            u = jnp.roll(u_full, noff, axis=0)[:H_loc]
        else:
            u = pltpu.roll(u_full, noff, 0)[:H_loc]

        xm = xu_ref[:]                              # (H_loc, Dp)
        xf = xf_ref[:]                              # (H, Dp)
        lane = jax.lax.broadcasted_iota(jnp.int32, (H_loc, Dp), 1)
        is_pack = (lane == DL) | (lane == DA)
        lm = xm[:, DL:DL + 1]
        z = _stretch_z(u[:, 0:1], sa)
        if partner == "roll":
            # same hashed state-independent rotation as make_step_kernel
            # (_hash_shift is the ONE shared implementation)
            shift = _hash_shift(sc_ref[0], i, which, H)
            shift2 = jnp.remainder(shift + noff, jnp.int32(H))
            xp = _make_roll_rows(interpret)(xf, shift2)[:H_loc]
        else:
            pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32), H - 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (H_loc, H), 1)
            onehot = (row == pidx).astype(f32)
            xp = jnp.dot(onehot, xf, preferred_element_type=f32)
        y = xp + z * (xm - xp)
        y = jnp.where(is_pack, 0.0, y)
        lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, H_loc, ll_tile,
                              use_ll_loop, ysc_ref, lsc_ref)
        accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D)
        y = jnp.where(lane == DL, lp_y, y)
        y = jnp.where(lane == DA, xm[:, DA:DA + 1] + 1.0, y)
        xu_ref[:] = jnp.where(accept, y, xm)

    @jax.jit
    def _half_step(x_upd, x_fixed, seed, i, which, row_off, consts):
        sc = jnp.stack([
            jnp.asarray(seed, jnp.int32), jnp.asarray(i, jnp.int32),
            jnp.asarray(which, jnp.int32),
            jnp.asarray(row_off, jnp.int32)])
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
            [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in range(2 + len(const_shapes))]
        kwargs = {"input_output_aliases": {1: 0}}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        if use_ll_loop:
            kwargs["scratch_shapes"] = [pltpu.VMEM((H_loc, Dp), f32),
                                        pltpu.VMEM((H_loc, 1), f32)]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H_loc, Dp), f32),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
            **kwargs,
        )(sc, x_upd, x_fixed, *consts)

    consts = tuple(const_vals)

    def half_step(x_upd, x_fixed, seed, i, which, row_off):
        return _half_step(x_upd, x_fixed, seed, i, which, row_off,
                          consts)

    half_step._jitted = _half_step
    half_step._consts = consts
    half_step.D, half_step.Dp = D, Dp
    half_step.H, half_step.H_loc = H, H_loc
    return half_step


def make_multicluster_consts(sess, sz_stack, xr_stack, spec=None,
                             device: bool = True):
    """Stack the per-cluster kernel constants (operators, flux, counts,
    tables) into one device-resident tuple for
    :func:`make_multicluster_step_kernel`.  Build once and pass to every
    builder call over the same survey (e.g. separate burn and sampling
    kernels) — each call otherwise re-derives and re-transfers the full
    stack.  Returns None when the session/stack is outside the kernel
    specialisation (heterogeneous grids: StackMismatch).

    ``spec``: a prebuilt ``_build_spec(sess)`` dict to reuse — the spec
    assembly pays the full table-operator construction, noticeable on
    this 1-core host when several builders run per survey.

    ``device=False`` returns host numpy stacks instead (multi-host jobs
    pre-place them as global arrays — parallel.multihost)."""
    spec_full = spec if spec is not None else _build_spec(sess)
    if spec_full is None:
        return None
    spec = spec_full["spec"]
    C = int(np.asarray(sz_stack.L).shape[0])
    try:
        per_cluster = [
            _cluster_arrays(
                spec,
                jax.tree_util.tree_map(lambda x, c=c: x[c], sz_stack),
                jax.tree_util.tree_map(lambda x, c=c: x[c], xr_stack),
                np.asarray(sz_stack.L)[c], np.asarray(sz_stack.G)[c],
                np.asarray(sz_stack.w_T0)[c])
            for c in range(C)
        ]
    except StackMismatch:
        return None     # heterogeneous stack: fall back to the XLA path
    stacks = tuple(
        np.stack([pc[i] for pc in per_cluster]).astype(np.float32)
        for i in range(len(per_cluster[0])))
    if not device:
        return stacks
    return tuple(jnp.asarray(v) for v in stacks)


def make_multicluster_step_kernel(sess, sz_stack, xr_stack, n_inner: int,
                                  n_walkers: int, a: float = 2.0,
                                  interpret: bool = False,
                                  vmem_limit_mb: int = 96,
                                  thin: int | None = None,
                                  unroll: int = 1,
                                  chain_space: str = "hbm",
                                  ll_tile: int = 256,
                                  consts=None, spec=None):
    """Cluster-grid fused sampler for multi-cluster batched fits
    (BASELINE config #5): grid dimension = cluster; each grid step runs
    ``n_inner`` full stretch-move ensemble steps for ONE cluster's
    ``n_walkers``-walker ensemble against that cluster's constants
    (operators, flux, counts, tables), Mosaic-pipelining the next
    cluster's constant DMA behind the current cluster's compute.

    This replaces the flat widened-GEMM XLA path's deliberate C-fold FLOP
    overhead with per-cluster exact-size work (the nested-vmap lowering
    problem documented in docs/PERFORMANCE.md does not arise: each grid
    step is a single-cluster program).

    Requirements (validated): clusters share the instrument configuration
    — map geometry, pressure grid, conversion table, count-rate log-T
    grid, walker count.  Returns
    ``step_block(x (C,W,D), lp (C,W), acc (C,W), seed)`` -> same triple,
    plus ``(chain (C, n_inner//thin, W, D), chain_lp (C, ..., W))`` when
    ``thin`` is given; or None when the session/stack doesn't match the
    specialisation.

    ``chain_space`` places the x chain as in :func:`make_step_kernel`:
    ``"hbm"`` (default) keeps it as an unblocked HBM buffer each grid
    step DMAs its frames into, lifting the VMEM-output cap; ``"vmem"``
    is the original Mosaic-pipelined VMEM-block path.

    ``consts``: a :func:`make_multicluster_consts` tuple to reuse across
    builder calls over the same survey (skips re-deriving and
    re-transferring the stacked constants).  ``spec``: a prebuilt
    ``_build_spec(sess)`` dict to reuse across builders likewise.
    

    KNOWN LIMIT (r5 review, documented not ported): this factory keeps
    the pre-packed-state layout (separate lane-padded lp/acc buffers)
    and the one-hot partner gather — fine at survey-scale walker counts
    (<= ~4096/cluster), but it will hit the Mosaic VMEM wall
    packed_state removed from the plain/tempered kernels if driven to
    W >= ~32768 per cluster, and the quadratic gather re-becomes the
    ceiling above ~4096 walkers.  Port the packed/half_tile/roll
    machinery here before chasing per-cluster walker counts in that
    regime.
    """
    if chain_space not in ("hbm", "vmem"):
        raise ValueError(f"chain_space must be 'hbm' or 'vmem', "
                         f"got {chain_space!r}")
    chain_hbm = chain_space == "hbm"
    spec_full = spec if spec is not None else _build_spec(sess)
    if spec_full is None:
        return None
    ll_body = spec_full["ll_body"]
    spec = spec_full["spec"]
    D, Dp = spec_full["D"], spec_full["Dp"]
    W = n_walkers
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    if n_inner % unroll:
        raise ValueError("n_inner must be a multiple of unroll")
    n_keep = 0
    if thin is not None:
        if thin <= 0 or n_inner % thin:
            raise ValueError("n_inner must be a positive multiple of thin")
        n_keep = n_inner // thin
    f32 = jnp.float32
    sa = float(np.sqrt(a))
    inv24 = float(2.0 ** -24)

    C = int(np.asarray(sz_stack.L).shape[0])
    if consts is None:
        consts_built = make_multicluster_consts(sess, sz_stack, xr_stack,
                                                spec=spec_full)
        if consts_built is None:
            return None     # heterogeneous stack: XLA-path fallback
        const_vals = list(consts_built)
    else:
        const_vals = list(consts)
    const_shapes = [tuple(v.shape) for v in const_vals]
    # fori_loop likelihood tiling — same compile-time fix as
    # make_step_kernel (unrolled tile copies explode Mosaic compiles)
    use_ll_loop = H > ll_tile and H % ll_tile == 0

    def kernel(seed_ref, x0_ref, lp0_ref, acc0_ref, *refs):
        refs = list(refs)
        sem = ysc_ref = lsc_ref = None
        if use_ll_loop:
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        if n_keep and chain_hbm:
            sem = refs.pop()
        if n_keep:
            clp_ref = refs.pop()
            cx_ref = refs.pop()
        acco_ref = refs.pop()
        lpo_ref = refs.pop()
        xo_ref = refs.pop()
        const_refs = refs
        cid = pl.program_id(0)
        if not interpret:
            pltpu.prng_seed(seed_ref[0], cid)
        xo_ref[:] = x0_ref[:]
        lpo_ref[:] = lp0_ref[:]
        acco_ref[:] = acc0_ref[:]

        row = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        random_bits = _make_random_bits(interpret, seed_ref, (H, 4),
                                        extra=cid)

        const_vals_in = [r[0] for r in const_refs]   # this cluster's block

        def half(i, base, fixed_base, which):
            xm = xo_ref[0, base:base + H, :]
            lm = lpo_ref[0, base:base + H, :]
            xf = xo_ref[0, fixed_base:fixed_base + H, :]
            u = _uniforms(random_bits(i, which), inv24)
            z = _stretch_z(u[:, 0:1], sa)
            pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32), H - 1)
            onehot = (row == pidx).astype(f32)
            xp = jnp.dot(onehot, xf, preferred_element_type=f32)
            y = xp + z * (xm - xp)
            lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, H, ll_tile,
                                  use_ll_loop, ysc_ref, lsc_ref)
            accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D)
            xo_ref[0, base:base + H, :] = jnp.where(accept, y, xm)
            lpo_ref[0, base:base + H, :] = jnp.where(accept, lp_y, lm)
            acco_ref[0, base:base + H, :] = (
                acco_ref[0, base:base + H, :] + accept.astype(f32))

        def body(i, carry):
            for u in range(unroll):
                it = i * unroll + u
                half(it, 0, H, 0)
                half(it, H, 0, 1)
                if n_keep:
                    @pl.when((it + 1) % thin == 0)
                    def _():
                        k = (it + 1) // thin - 1
                        if chain_hbm:
                            # cx_ref is the FULL unblocked (C, n_keep,
                            # W, Dp) HBM buffer: DMA this cluster's live
                            # frame into its (cid, k) slot; lp chain
                            # stays a VMEM block but 2D per cluster —
                            # see make_step_kernel
                            cp = pltpu.make_async_copy(
                                xo_ref.at[0], cx_ref.at[cid, k], sem)
                            cp.start()
                            cp.wait()
                            clp_ref[0, pl.ds(k, 1), :] = (
                                lpo_ref[:].reshape(1, W))
                        else:
                            cx_ref[0, pl.ds(k, 1)] = xo_ref[:]
                            clp_ref[0, pl.ds(k, 1)] = lpo_ref[:]
            return carry

        jax.lax.fori_loop(0, n_inner // unroll, body, 0)

    @jax.jit
    def _step_block(x, lp, acc, seed, consts):
        xp = jnp.zeros((C, W, Dp), dtype=f32).at[:, :, :D].set(
            x.astype(f32))
        lpp = lp.astype(f32).reshape(C, W, 1)
        accp = acc.astype(f32).reshape(C, W, 1)
        seed_arr = jnp.asarray([seed], dtype=jnp.int32).reshape(1)

        state_spec = pl.BlockSpec((1, W, Dp), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        col_spec = pl.BlockSpec((1, W, 1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    state_spec, col_spec, col_spec]
        for shp in const_shapes:
            # bind the rank NOW: a late-bound `shp` would make every index
            # map use the last shape's rank
            in_specs.append(pl.BlockSpec(
                (1,) + shp[1:],
                lambda i, n=len(shp) - 1: (i,) + (0,) * n,
                memory_space=pltpu.VMEM))
        out_shape = [
            jax.ShapeDtypeStruct((C, W, Dp), f32),
            jax.ShapeDtypeStruct((C, W, 1), f32),
            jax.ShapeDtypeStruct((C, W, 1), f32),
        ]
        out_specs = [state_spec, col_spec, col_spec]
        kwargs = {}
        scratch_shapes = ()
        if n_keep:
            out_shape += [jax.ShapeDtypeStruct((C, n_keep, W, Dp), f32)]
            if chain_hbm:
                out_shape += [jax.ShapeDtypeStruct((C, n_keep, W), f32)]
                out_specs += [
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec((1, n_keep, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
                scratch_shapes = scratch_shapes + (
                    pltpu.SemaphoreType.DMA,)
            else:
                out_shape += [jax.ShapeDtypeStruct((C, n_keep, W, 1), f32)]
                out_specs += [
                    pl.BlockSpec((1, n_keep, W, Dp),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, n_keep, W, 1),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)]
        if use_ll_loop:
            scratch_shapes = scratch_shapes + (
                pltpu.VMEM((H, Dp), f32), pltpu.VMEM((H, 1), f32))
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=(C,), in_specs=in_specs,
                                  out_specs=out_specs,
                                  scratch_shapes=scratch_shapes),
            interpret=interpret,
            **kwargs,
        )(seed_arr, xp, lpp, accp, *consts)
        x_out, lp_out, acc_out = outs[:3]
        if n_keep:
            chlp = outs[4] if chain_hbm else outs[4][:, :, :, 0]
            return (x_out[:, :, :D], lp_out[:, :, 0], acc_out[:, :, 0],
                    outs[3][:, :, :, :D], chlp)
        return x_out[:, :, :D], lp_out[:, :, 0], acc_out[:, :, 0]

    consts = tuple(const_vals)

    def step_block(x, lp, acc, seed):
        # consts as jit arguments: keeps the HLO data-independent (see
        # the persistent-cache note in make_joint_ll_kernel) — per-survey
        # data changes reuse the cached Mosaic compile at equal shapes
        return _step_block(x, lp, acc, seed, consts)

    step_block._jitted = _step_block    # exposed for the HLO data-
    step_block._consts = consts         # independence regression test
    return step_block


def make_tempered_step_kernel(sess, betas, n_inner: int, n_walkers: int,
                              a: float = 2.0, interpret: bool = False,
                              vmem_limit_mb: int = 96,
                              thin: int | None = None,
                              chain_space: str = "hbm",
                              ll_tile: int = 256,
                              packed_state: bool = True,
                              half_tile: int | None = None,
                              partner: str = "auto"):
    """Fused parallel-tempered sampler: K replica ensembles at inverse
    temperatures ``betas`` advance ``n_inner`` full stretch-move steps +
    swap sweeps inside ONE pallas_call (reference semantics:
    sampling/tempered.py — tempering scales only the log-prob difference
    in the acceptance; swaps use untempered log-probs).

    Internal layout: rows = [all rungs' first halves; all rungs' second
    halves], so each half-update is one contiguous (K*H, Dp) block with
    block-diagonal partner selection (the one-hot row index is offset by
    the rung base).  Swap sweeps pair rung kk with kk+1 half-by-half via
    a per-sweep rotation (pltpu.roll with a hashed shift — pairing must
    only be state-independent, not uniform over permutations).

    Returns ``step_block(x (K,W,D), lp (K,W), acc (K,W), seed)`` ->
    ``(x, lp, acc, sacc (K-1,))`` [+ ``(cold chain (n_keep, W, D),
    cold chain_lp (n_keep, W))`` with ``thin``]; ``sacc`` counts accepted
    swaps per rung boundary (divide by n_inner*W for the rate).  None when
    the configuration doesn't match the specialisation.

    ``chain_space`` places the cold-rung chain buffer as in
    :func:`make_step_kernel`: ``"hbm"`` (default) DMAs each frame out of
    VMEM, lifting the ~26 MB VMEM-output cap; ``"vmem"`` is the original
    path.

    ``packed_state``/``half_tile``/``partner`` port the plain kernel's
    large-row-count machinery (VERDICT r4 #2 — the K*W=32768-row Mosaic
    VMEM wall in ``results/tpu_temper_bigw.json`` was the SAME wall
    class ``make_step_kernel`` removed): packing stores lp/acc in the
    two free padding lanes of the (2KH, Dp) row buffer (the six
    lane-padded (2KH, 1) buffers alone cost 6 x 16.8 MB at KH=16384)
    and aliases it in place; ``half_tile`` runs each half-substep
    row-tiled so every proposal intermediate is bounded at
    (half_tile, Dp) — tiles never straddle a rung (half_tile must
    divide H) and the interpret-mode stream is bit-identical to the
    untiled kernel (global row-offset PRNG); ``partner`` follows
    :func:`make_step_kernel` ("auto" = one-hot gather up to
    ``_PARTNER_AUTO_THRESHOLD`` walkers per rung, the O(H) per-rung
    rotation above it, where the per-rung (H, H) gather GEMMs would
    dominate the step).  Auto half_tile=4096 when KH > 8192 and H
    divides; swaps stay full-width (O(H Dp) row traffic, never the
    wall).
    """
    if chain_space not in ("hbm", "vmem"):
        raise ValueError(f"chain_space must be 'hbm' or 'vmem', "
                         f"got {chain_space!r}")
    if partner == "auto":
        partner = ("roll" if n_walkers > _PARTNER_AUTO_THRESHOLD
                   else "onehot")
    if partner not in ("onehot", "roll"):
        raise ValueError(f"partner must be 'onehot' or 'roll', "
                         f"got {partner!r}")
    chain_hbm = chain_space == "hbm"
    spec = _build_spec(sess)
    if spec is None:
        return None
    ll_body = spec["ll_body"]
    const_vals = spec["const_vals"]
    const_shapes = spec["const_shapes"]
    D, Dp = spec["D"], spec["Dp"]
    betas = np.asarray(betas, dtype=np.float64)
    K = betas.size
    if K < 2:
        # a 1-rung ladder is the plain sampler; the swap machinery would
        # otherwise allocate a zero-row (0, 1) VMEM output — an opaque
        # Mosaic build crash instead of a usable error
        raise ValueError(
            f"tempering needs at least 2 betas (got {K}); use the plain "
            "step kernel for a single rung")
    W = n_walkers
    if W % 2:
        raise ValueError("need an even number of walkers")
    H = W // 2
    KH = K * H
    n_keep = 0
    if thin is not None:
        if thin <= 0 or n_inner % thin:
            raise ValueError("n_inner must be a positive multiple of thin")
        n_keep = n_inner // thin
    f32 = jnp.float32
    sa = float(np.sqrt(a))
    inv24 = float(2.0 ** -24)
    packed = packed_state and D + 2 <= Dp
    DL, DA = Dp - 2, Dp - 1
    if half_tile is None:
        half_tile = _auto_half_tile(KH, H, ll_tile, threshold=8192)
    if half_tile is not None:
        if H % half_tile or half_tile % ll_tile:
            raise ValueError(
                f"half_tile ({half_tile}) must divide the per-rung half "
                f"H ({H}) and be a multiple of ll_tile ({ll_tile})")
        if half_tile >= KH:
            half_tile = None
    beta_rows = jnp.asarray(np.repeat(betas, H)[:, None], f32)   # (KH, 1)
    const_vals = list(const_vals) + [beta_rows]
    const_shapes = list(const_shapes) + [(KH, 1)]
    # fori_loop likelihood tiling — same compile-time fix as
    # make_step_kernel (unrolled tile copies explode Mosaic compiles).
    # Under half_tile the ll loop runs inside each walker tile instead.
    use_ll_loop = (half_tile is None and KH > ll_tile
                   and KH % ll_tile == 0)

    def _rung_shift(seed_ref, i, which, r):
        """Hashed state-independent rotation per (substep, rung) for the
        partner='roll' gather (same device as the swap pairing; the
        shared _hash_shift with the rung folded in as `extra`)."""
        return _hash_shift(seed_ref[0], i, which, H, extra=r)

    def kernel(seed_ref, *refs):
        refs = list(refs)
        sem = ysc_ref = lsc_ref = xroll_ref = None
        clp_ref = lpo_ref = acco_ref = None
        if half_tile is not None:
            if partner == "roll":
                xroll_ref = refs.pop()
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        elif use_ll_loop:
            lsc_ref = refs.pop()
            ysc_ref = refs.pop()
        if n_keep and chain_hbm:
            sem = refs.pop()
        if n_keep:
            if not packed:
                clp_ref = refs.pop()
            cx_ref = refs.pop()
        sacc_ref = refs.pop()
        if packed:
            # aliased packed state: xo_ref and the input slot are the
            # SAME buffer (no second (2KH, Dp) allocation, no copy)
            xo_ref = refs.pop()
            refs.pop(0)
        else:
            acco_ref = refs.pop()
            lpo_ref = refs.pop()
            xo_ref = refs.pop()
            x0_ref = refs.pop(0)
            lp0_ref = refs.pop(0)
            acc0_ref = refs.pop(0)
        const_refs = refs
        if not interpret:
            pltpu.prng_seed(seed_ref[0])
        if not packed:
            xo_ref[:] = x0_ref[:]
            lpo_ref[:] = lp0_ref[:]
            acco_ref[:] = acc0_ref[:]
        sacc_ref[:] = jnp.zeros((K - 1, 1), f32)

        TR = half_tile if half_tile is not None else KH  # rows per update
        if half_tile is not None and partner != "roll":
            # (TR, H) partner iota is only consumed by half_tiled; the
            # untiled one-hot path builds its own (H, H) per-rung iota
            row_h = jax.lax.broadcasted_iota(jnp.int32, (TR, H), 1)
        if packed:
            lane = jax.lax.broadcasted_iota(jnp.int32, (TR, Dp), 1)
            is_pack = (lane == DL) | (lane == DA)
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, Dp), 1)
        beta_ref = const_refs[-1]                     # (KH, 1)
        core_refs = const_refs[:-1]

        random_bits = _make_random_bits(interpret, seed_ref, (TR, 4))

        const_vals_in = [r[:] for r in core_refs]

        def half(i, base, fixed_base, which):
            xm = xo_ref[base:base + KH, :]
            lm = (xm[:, DL:DL + 1] if packed
                  else lpo_ref[base:base + KH, :])
            xf = xo_ref[fixed_base:fixed_base + KH, :]
            u = _uniforms(random_bits(i, which), inv24)
            z = _stretch_z(u[:, 0:1], sa)
            if partner == "roll":
                # per-rung hashed rotation: O(H Dp) vs the quadratic
                # per-rung one-hot GEMMs
                xp = jnp.concatenate([
                    roll_rows(xf[r * H:(r + 1) * H, :],
                              _rung_shift(seed_ref, i, which, r))
                    for r in range(K)
                ], axis=0)
            else:
                pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32),
                                   H - 1)
                # partner selection is block-diagonal per rung: K
                # per-rung (H, H) one-hot GEMMs instead of one
                # (KH, KH) GEMM (K-fold less MXU work on the proposal)
                row_hh = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
                xp = jnp.concatenate([
                    jnp.dot((row_hh
                             == pidx[r * H:(r + 1) * H]).astype(f32),
                            xf[r * H:(r + 1) * H],
                            preferred_element_type=f32)
                    for r in range(K)
                ], axis=0)
            y = xp + z * (xm - xp)
            if packed:
                # zero the packed lanes so ll_body sees exactly the
                # zero-padded block the unpacked layout feeds it
                y = jnp.where(is_pack, 0.0, y)
            lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, KH, ll_tile,
                                  use_ll_loop, ysc_ref, lsc_ref)
            accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D,
                                beta=beta_ref[:])
            if packed:
                y = jnp.where(lane == DL, lp_y, y)
                y = jnp.where(lane == DA, xm[:, DA:DA + 1] + 1.0, y)
                xo_ref[base:base + KH, :] = jnp.where(accept, y, xm)
            else:
                xo_ref[base:base + KH, :] = jnp.where(accept, y, xm)
                lpo_ref[base:base + KH, :] = jnp.where(accept, lp_y, lm)
                acco_ref[base:base + KH, :] = (
                    acco_ref[base:base + KH, :] + accept.astype(f32))

        def half_tiled(i, base, fixed_base, which):
            # walker-tiled half-substep (see make_step_kernel): moving
            # rows are independent, so tiling preserves the move law
            # exactly; every proposal intermediate is bounded at
            # (TR, Dp).  half_tile divides H, so a tile never straddles
            # a rung boundary — its rung resolves from the row offset.
            if partner == "roll":
                # stage the per-rung rolled complementary half once per
                # substep; tiles then slice it
                for r in range(K):
                    xroll_ref[r * H:(r + 1) * H, :] = roll_rows(
                        xo_ref[fixed_base + r * H:
                               fixed_base + (r + 1) * H, :],
                        _rung_shift(seed_ref, i, which, r))

            def tbody(t, c):
                r0 = t * TR
                rung0 = (r0 // H) * H
                xm = xo_ref[pl.ds(base + r0, TR), :]
                lm = (xm[:, DL:DL + 1] if packed
                      else lpo_ref[pl.ds(base + r0, TR), :])
                u = _uniforms(random_bits(i, which, (TR, 4), row0=r0),
                              inv24)
                z = _stretch_z(u[:, 0:1], sa)
                if partner == "roll":
                    xp = xroll_ref[pl.ds(r0, TR), :]
                else:
                    pidx = jnp.minimum((u[:, 1:2] * H).astype(jnp.int32),
                                       H - 1)
                    onehot = (row_h == pidx).astype(f32)    # (TR, H)
                    xp = jnp.dot(
                        onehot,
                        xo_ref[pl.ds(fixed_base + rung0, H), :],
                        preferred_element_type=f32)
                y = xp + z * (xm - xp)
                if packed:
                    y = jnp.where(is_pack, 0.0, y)
                lp_y = _eval_ll_tiled(y, ll_body, const_vals_in, TR,
                                      ll_tile, TR > ll_tile, ysc_ref,
                                      lsc_ref)
                accept = _gw_accept(u[:, 2:3], z, lp_y, lm, D,
                                    beta=beta_ref[pl.ds(r0, TR), :])
                if packed:
                    y = jnp.where(lane == DL, lp_y, y)
                    y = jnp.where(lane == DA, xm[:, DA:DA + 1] + 1.0, y)
                xo_ref[pl.ds(base + r0, TR), :] = jnp.where(accept, y, xm)
                if not packed:
                    lpo_ref[pl.ds(base + r0, TR), :] = jnp.where(
                        accept, lp_y, lm)
                    acco_ref[pl.ds(base + r0, TR), :] = (
                        acco_ref[pl.ds(base + r0, TR), :]
                        + accept.astype(f32))
                return c

            jax.lax.fori_loop(0, KH // TR, tbody, 0)

        roll_rows = _make_roll_rows(interpret)

        def swaps(i):
            # pair rung kk with kk+1, half-by-half, rotation pairing
            for kk in range(K - 1):
                shift = jnp.remainder(
                    (jnp.int32(seed_ref[0]) * 1103515245
                     + i * 40503 + kk * 10007) >> 8, H)
                db = float(betas[kk] - betas[kk + 1])
                for hb, ucol in ((0, 0), (KH, 1)):
                    c0 = hb + kk * H
                    h0 = hb + (kk + 1) * H
                    x_c = xo_ref[c0:c0 + H, :]
                    x_h = roll_rows(xo_ref[h0:h0 + H, :], shift)
                    if packed:
                        lp_c = x_c[:, DL:DL + 1]
                        lp_h = x_h[:, DL:DL + 1]
                    else:
                        lp_c = lpo_ref[c0:c0 + H, :]
                        lp_h = roll_rows(lpo_ref[h0:h0 + H, :], shift)
                    # one uniform per (walker, boundary, half): draw a
                    # fresh (H, 1) block
                    uu = _uniforms(
                        random_bits(i, 16 + 2 * kk + ucol, shape=(H, 1)),
                        inv24)
                    accept = jnp.log(uu) < db * (lp_h - lp_c)   # (H, 1)
                    if packed:
                        # whole rows swap (lp rides in its lane), but
                        # the accept COUNT belongs to the walker slot,
                        # not the trajectory — restore each slot's own
                        # acc lane after the row exchange
                        keep_acc = lane_h == DA
                        new_c = jnp.where(accept, x_h, x_c)
                        new_c = jnp.where(keep_acc, x_c, new_c)
                        new_h = jnp.where(accept, x_c, x_h)
                        new_h = jnp.where(keep_acc, x_h, new_h)
                        xo_ref[c0:c0 + H, :] = new_c
                        xo_ref[h0:h0 + H, :] = roll_rows(new_h, -shift)
                    else:
                        new_c = jnp.where(accept, x_h, x_c)
                        new_clp = jnp.where(accept, lp_h, lp_c)
                        new_h = jnp.where(accept, x_c, x_h)
                        new_hlp = jnp.where(accept, lp_c, lp_h)
                        xo_ref[c0:c0 + H, :] = new_c
                        lpo_ref[c0:c0 + H, :] = new_clp
                        xo_ref[h0:h0 + H, :] = roll_rows(new_h, -shift)
                        lpo_ref[h0:h0 + H, :] = roll_rows(new_hlp, -shift)
                    sacc_ref[kk:kk + 1, :] = (
                        sacc_ref[kk:kk + 1, :]
                        + jnp.sum(accept.astype(f32)).reshape(1, 1))

        def body(i, carry):
            hfn = half_tiled if half_tile is not None else half
            hfn(i, 0, KH, 0)
            hfn(i, KH, 0, 1)
            swaps(i)
            if n_keep:
                @pl.when((i + 1) % thin == 0)
                def _():
                    k = (i + 1) // thin - 1
                    if chain_hbm:
                        # cold rung = rows 0:H (half 0) and KH:KH+H
                        # (half 1); DMA each x half out, waiting
                        # immediately so the live refs stay mutable.
                        # Packed: the lp lane rides inside the frame.
                        # Unpacked: the lp chain stays a VMEM output
                        # but 2D (n_keep, W) — see make_step_kernel.
                        for src, dst in (
                                (xo_ref.at[pl.ds(0, H)],
                                 cx_ref.at[k, pl.ds(0, H)]),
                                (xo_ref.at[pl.ds(KH, H)],
                                 cx_ref.at[k, pl.ds(H, H)])):
                            cp = pltpu.make_async_copy(src, dst, sem)
                            cp.start()
                            cp.wait()
                        if not packed:
                            # store the cold-rung lp as ONE full-width
                            # row: a half-row store at a dynamic sublane
                            # index is an unaligned dynamic store Mosaic
                            # rejects
                            clp_ref[pl.ds(k, 1), :] = jnp.concatenate(
                                [lpo_ref[0:H, :].reshape(1, H),
                                 lpo_ref[KH:KH + H, :].reshape(1, H)],
                                axis=1)
                    else:
                        cx_ref[pl.ds(k, 1), 0:H] = xo_ref[0:H, :][None]
                        cx_ref[pl.ds(k, 1), H:W] = (
                            xo_ref[KH:KH + H, :][None])
                        if not packed:
                            clp_ref[pl.ds(k, 1), 0:H] = (
                                lpo_ref[0:H, :][None])
                            clp_ref[pl.ds(k, 1), H:W] = (
                                lpo_ref[KH:KH + H, :][None])
            return carry

        jax.lax.fori_loop(0, n_inner, body, 0)

    @jax.jit
    def _step_block(x, lp, acc, seed, consts):
        # external (K, W, D) -> internal [K rungs' half0; K rungs' half1]
        def to_rows(v, width):
            v = v.astype(f32).reshape(K, W, width)
            return jnp.concatenate(
                [v[:, :H].reshape(KH, width), v[:, H:].reshape(KH, width)])

        xp = jnp.zeros((2 * KH, Dp), f32).at[:, :D].set(
            to_rows(x, D))
        if packed:
            xp = (xp.at[:, DL].set(to_rows(lp[..., None], 1)[:, 0])
                    .at[:, DA].set(to_rows(acc[..., None], 1)[:, 0]))
            state_in = (xp,)
        else:
            state_in = (xp, to_rows(lp[..., None], 1),
                        to_rows(acc[..., None], 1))
        seed_arr = jnp.asarray([seed], dtype=jnp.int32).reshape(1)

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)
             for _ in range(len(state_in) + len(const_shapes))]
        if packed:
            out_shape = [jax.ShapeDtypeStruct((2 * KH, Dp), f32)]
        else:
            out_shape = [
                jax.ShapeDtypeStruct((2 * KH, Dp), f32),
                jax.ShapeDtypeStruct((2 * KH, 1), f32),
                jax.ShapeDtypeStruct((2 * KH, 1), f32),
            ]
        out_shape += [jax.ShapeDtypeStruct((K - 1, 1), f32)]
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape)
        kwargs = {}
        if packed:
            # alias the packed state in place (operand 1 -> output 0):
            # one (2KH, Dp) buffer instead of two, no entry copy
            kwargs["input_output_aliases"] = {1: 0}
        scratch = []
        if n_keep:
            out_shape += [jax.ShapeDtypeStruct((n_keep, W, Dp), f32)]
            if chain_hbm and packed:
                out_specs += [
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)]
                scratch.append(pltpu.SemaphoreType.DMA)
            elif chain_hbm:
                out_shape += [jax.ShapeDtypeStruct((n_keep, W), f32)]
                out_specs += [
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
                scratch.append(pltpu.SemaphoreType.DMA)
            elif packed:
                out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)]
            else:
                out_shape += [jax.ShapeDtypeStruct((n_keep, W, 1), f32)]
                out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        if half_tile is not None:
            scratch += [pltpu.VMEM((half_tile, Dp), f32),
                        pltpu.VMEM((half_tile, 1), f32)]
            if partner == "roll":
                scratch += [pltpu.VMEM((KH, Dp), f32)]
        elif use_ll_loop:
            scratch += [pltpu.VMEM((KH, Dp), f32),
                        pltpu.VMEM((KH, 1), f32)]
        if scratch:
            kwargs["scratch_shapes"] = scratch
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            **kwargs,
        )(seed_arr, *state_in, *consts)

        def from_rows(v, width):
            h0 = v[:KH].reshape(K, H, width)
            h1 = v[KH:].reshape(K, H, width)
            return jnp.concatenate([h0, h1], axis=1)

        if packed:
            full = from_rows(outs[0], Dp)
            x_out = full[:, :, :D]
            lp_out = full[:, :, DL]
            acc_out = full[:, :, DA]
            sacc = outs[1][:, 0]
            if n_keep:
                cx = outs[2]
                return (x_out, lp_out, acc_out, sacc,
                        cx[:, :, :D], cx[:, :, DL])
            return x_out, lp_out, acc_out, sacc
        x_out = from_rows(outs[0], Dp)[:, :, :D]
        lp_out = from_rows(outs[1], 1)[:, :, 0]
        acc_out = from_rows(outs[2], 1)[:, :, 0]
        sacc = outs[3][:, 0]
        if n_keep:
            chlp = outs[5] if chain_hbm else outs[5][:, :, 0]
            return (x_out, lp_out, acc_out, sacc,
                    outs[4][:, :, :D], chlp)
        return x_out, lp_out, acc_out, sacc

    consts = tuple(const_vals)

    def step_block(x, lp, acc, seed):
        # consts as jit arguments: keeps the HLO data-independent (see
        # the persistent-cache note in make_joint_ll_kernel)
        return _step_block(x, lp, acc, seed, consts)

    step_block._jitted = _step_block    # exposed for the HLO data-
    step_block._consts = consts         # independence regression test
    return step_block
