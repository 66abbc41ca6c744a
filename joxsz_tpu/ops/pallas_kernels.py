"""Pallas TPU kernel: fused SZ-likelihood core for a walker batch.

The batched SZ likelihood is the framework's hot op (SURVEY.md §3.3): per
walker it is two small matmuls around an elementwise temperature-dependent
conversion.  XLA already fuses the elementwise stages; this kernel goes one
step further and keeps the ENTIRE chain VMEM-resident for a walker tile —
one ``pallas_call`` computes

    raw   = pp @ L^T                 (B_tile x NP) @ (NP x PIX)   [MXU]
    conv  = lerp(T table, t_all)     elementwise                  [VPU]
    prof  = raw * conv * calibration
    model = prof @ G^T               (B_tile x PIX) @ (PIX x ND)  [MXU]
    ll    = -0.5 * sum(((flux - model)/err)^2)

with all operator matrices padded once to lane multiples (128) and stored
as kernel constants.  The pressure/temperature profile evaluation stays in
XLA (pure elementwise, fused for free).

The kernel is validated in interpreter mode against the jnp reference path
(tests/test_pallas.py) and is selected on TPU via ``use_pallas=True`` in
``make_sz_core``.
"""

from __future__ import annotations



import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
try:  # TPU backend bits are importable on CPU builds too
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAVE_PLTPU = False


def _pad_to(x: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    out = np.zeros(shape, dtype=x.dtype)
    out[tuple(slice(0, s) for s in x.shape)] = x
    return out


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def sz_padded_data(flux, flux_err, ND, dtype=np.float64):
    """Padded flux + masked weight rows — THE one implementation of the
    SZ validity rule (NaN/inf flux or error, or zero error, contributes
    exactly zero to the chi^2, reproducing the reference's nansum,
    joxsz_funcs.py:479).  Shared by make_sz_core and the mega-kernel's
    _cluster_arrays so the rule cannot silently diverge."""
    flux64 = np.asarray(flux, dtype=dtype)
    err64 = np.asarray(flux_err, dtype=dtype)
    valid = np.isfinite(flux64) & np.isfinite(err64) & (err64 != 0)
    flux_p = _pad_to(np.where(valid, flux64, 0.0), (ND,))
    # weight 0 on padded/invalid entries kills their residuals
    w_p = _pad_to(np.where(valid, 1.0 / np.where(valid, err64, 1.0), 0.0),
                  (ND,))
    return flux_p, w_p


def make_sz_core(op, conv_table, flux, flux_err, dtype=jnp.float32,
                 block_b: int = 128, use_pallas: bool = True,
                 interpret: bool = False):
    """Build ``sz_core(pp, t_all, calibration) -> ll`` for walker batches.

    Parameters
    ----------
    op : ops.szkernel.SZOperator (host numpy, float64)
    conv_table : (T_keV table, mJy-per-y table)
    flux, flux_err : SZ data vectors (n_data,)
    """
    n_press = op.n_press          # 313
    n_pix = op.n_pix              # 86
    n_data = flux.shape[0]        # 19

    NP = _round_up(n_press, 128)
    PIX = _round_up(n_pix, 128)
    ND = _round_up(n_data, 128)

    LT = _pad_to(np.asarray(op.L.T, dtype=np.float64), (NP, PIX))
    GT = _pad_to(np.asarray(op.G.T, dtype=np.float64), (PIX, ND))
    t_tab, v_tab = conv_table
    n_tab = len(t_tab)
    # NaN flux/error entries are dropped from chi^2 (the reference's
    # nansum, joxsz_funcs.py:479): shared rule in sz_padded_data
    flux_p, w_p = sz_padded_data(flux, flux_err, ND)

    LT_j = jnp.asarray(LT, dtype=dtype)
    GT_j = jnp.asarray(GT, dtype=dtype)
    flux_j = jnp.asarray(flux_p, dtype=dtype)
    w_j = jnp.asarray(w_p, dtype=dtype)
    # tiny static tables -> baked-in python scalar constants (kernels must
    # not close over traced arrays)
    t_knots = [float(v) for v in np.asarray(t_tab, dtype=np.float64)]
    v_knots = [float(v) for v in np.asarray(v_tab, dtype=np.float64)]

    def _conv_lerp(t):
        """Linear interp with end-segment extrapolation over the tiny
        conversion table, as branch-free VPU ops (table length ~6)."""
        # segment index via sum of (t >= t_k) over interior knots
        idx = jnp.zeros_like(t, dtype=jnp.int32)
        for k in range(1, n_tab - 1):
            idx = idx + (t >= t_knots[k]).astype(jnp.int32)
        # gather-free: accumulate the selected segment's endpoints
        x0 = jnp.zeros_like(t)
        x1 = jnp.zeros_like(t)
        y0 = jnp.zeros_like(t)
        y1 = jnp.zeros_like(t)
        for k in range(n_tab - 1):
            sel = (idx == k).astype(t.dtype)
            x0 = x0 + sel * t_knots[k]
            x1 = x1 + sel * t_knots[k + 1]
            y0 = y0 + sel * v_knots[k]
            y1 = y1 + sel * v_knots[k + 1]
        return y0 + (t - x0) / (x1 - x0) * (y1 - y0)

    # ---- reference jnp path (always available) -----------------------------
    def sz_core_jnp(pp, t_all, calibration):
        """pp (B, n_press); t_all (B, n_pix); calibration (B,) -> ll (B,)."""
        raw = pp @ LT_j[:n_press, :n_pix]
        conv = _conv_lerp(t_all)
        prof = raw * conv * calibration[:, None]
        model = prof @ GT_j[:n_pix, :n_data]
        resid = (flux_j[:n_data] - model) * w_j[:n_data]
        return -0.5 * jnp.sum(resid * resid, axis=-1)

    if not (use_pallas and _HAVE_PLTPU):
        return sz_core_jnp

    # ---- pallas kernel -----------------------------------------------------
    def kernel(pp_ref, t_ref, cal_ref, lt_ref, gt_ref, flux_ref, w_ref,
               out_ref):
        pp = pp_ref[:]                       # (B_tile, NP)
        raw = jnp.dot(pp, lt_ref[:], preferred_element_type=jnp.float32)
        t_all = t_ref[:]                     # (B_tile, PIX); padded cols 0
        conv = _conv_lerp(t_all)
        prof = raw * conv * cal_ref[:]       # cal broadcast (B_tile, 1)
        model = jnp.dot(prof, gt_ref[:], preferred_element_type=jnp.float32)
        resid = (flux_ref[:] - model) * w_ref[:]
        out_ref[:] = -0.5 * jnp.sum(resid * resid, axis=-1, keepdims=True)

    @jax.jit
    def _sz_core_jit(pp, t_all, calibration, consts):
        # dataset arrays enter as jit ARGUMENTS, not closure captures:
        # captured arrays embed in the lowered HLO as literals, so any
        # data change (new cluster, fresh mock flux) would change the
        # module hash and defeat the persistent compile cache at
        # identical shapes (CLAUDE.md; same fix as the fused kernel
        # builders).  The ~6-float conversion knots remain embedded —
        # they are part of the instrument, and threading them through
        # the pallas operand list buys nothing at that size.
        LT_c, GT_c, flux_c, w_c = consts
        B = pp.shape[0]
        Bp = _round_up(B, block_b)
        pp_p = jnp.zeros((Bp, NP), dtype=dtype).at[:B, :n_press].set(pp)
        # pad temperatures with 1s so the lerp stays well-defined
        t_p = jnp.ones((Bp, PIX), dtype=dtype).at[:B, :n_pix].set(t_all)
        cal_p = jnp.zeros((Bp, 1), dtype=dtype).at[:B, 0].set(calibration)

        grid = (Bp // block_b,)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Bp, 1), dtype),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((block_b, NP), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_b, PIX), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NP, PIX), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((PIX, ND), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ND), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ND), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(pp_p, t_p, cal_p, LT_c, GT_c, flux_c[None, :], w_c[None, :])
        return out[:B, 0]

    _sz_consts = (LT_j, GT_j, flux_j, w_j)

    def sz_core_pallas(pp, t_all, calibration):
        return _sz_core_jit(pp, t_all, calibration, _sz_consts)

    return sz_core_pallas
