"""Fused Pallas TPU kernel for the GM/submeso isopycnal-slope chain.

The production gx1v7 menu computes, every step, the tracer/density face
differences and quarter-cell isopycnal slopes shared by GM and the
submesoscale scheme (tracer_diffs_and_isopyc_slopes,
source/hmix_gm_submeso_share.F90:149-434), the absolute-slope measure
SLA (source/hmix_gm.F90:1236-1242), and the displaced-parcel N^2 used by
the bfre kappa profile (buoyancy_frequency_dependent_profile,
source/hmix_gm.F90:3104-3111).  In jnp that chain materializes the EOS
expansion coefficients, the face/vertical density differences and the
eight slope fields to HBM (~25 field-passes).  This kernel produces, in
ONE pass over the T/S columns,

    slpack  (8, km, ny, nx)  quarter-cell slopes (e/w/n/s x ktp/kbt)
    sla     (2, km, ny, nx)  absolute-slope measure + eps (ktp, kbt)
    n2      (km, ny, nx)     max(0, -g * drho_displaced * dzwr)

with the MWJF derivative evaluation (source/state_mod.F90:418-498) run
in-kernel: the pressure-dependent polynomial coefficients collapse to
per-level scalars, prefetched to SMEM, so the EOS costs zero HBM
traffic.  Each y-tile is loaded as an EXTENDED block (8 halo rows on
each side) and the whole chain is evaluated uniformly on all rows —
N/S neighbor access is a cyclic sublane roll whose wrap rows land
outside the written center slice, so no row-select masking is needed.

Scope: state_choice 'mwjf', full cells (grid.DZT is None), closed or
cyclic E-W, closed or tripole N-S (the tripole top row is re-patched
from an 8-row jnp slab by the wrapper), float32.  Under y-sharded
dispatch meshes a shard_map/ppermute front-end feeds per-shard blocks.
Equivalence vs gm._slopes/_sla is asserted by tests/test_gm_chain.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pop2_tpu import eos
from pop2_tpu import constants as const
from pop2_tpu.tracer_pallas import (_VMEM_BUDGET, _lane_pad, _roll_e,
                                    _roll_w)

#: None = auto (TPU + float32 + supported config); True/False forces.
USE_PALLAS = None
force_interpret = False

EPS = 1.0e-10
EPS2 = 1.0e-20

_I0, _I1 = np.int32(0), np.int32(1)

# slpack channel order: (face, half) rows of gm._slopes' slx/sly
(SXE0, SXE1, SXW0, SXW1, SYN0, SYN1, SYS0, SYS1) = range(8)

# per-level SMEM coefficient channels (see _level_coeffs)
(_N00A, _N02A, _N10A, _D00A, _D01A, _D03A,
 _N00B, _N02B, _N10B, _D00B, _D01B, _D03B,
 _TMIN, _TMAX, _SMIN, _SMAX,
 _DZWT, _DZWB, _DZWR) = range(19)
_NC = 19


def _level_coeffs(cfg, grid, ts_range):
    """(NC, km) float32 per-level scalars: the pressure-dependent MWJF
    polynomial coefficients at p(k) (set A) and p(k+1) (set B, the
    displaced-parcel evaluation), the T/S clip bounds, and the dzw/dzwr
    vertical-grid scalars."""
    km = cfg.km
    pz = np.asarray(grid.vgrid.pressz, np.float64).ravel()
    pzB = np.concatenate([pz[1:], pz[-1:]])
    out = np.zeros((_NC, km), np.float64)
    for base, pref in ((0, pz), (6, pzB)):
        p = 10.0 * pref  # bars -> the dbar-like pressure in the fit
        out[base + 0] = eos.MWJF_NP0S0T0 + p * (eos.MWJF_NP1S0T0
                                                + p * eos.MWJF_NP2S0T0)
        out[base + 1] = eos.MWJF_NP0S0T2 + p * (eos.MWJF_NP1S0T2
                                                + p * eos.MWJF_NP2S0T2)
        out[base + 2] = eos.MWJF_NP0S1T0 + p * eos.MWJF_NP1S1T0
        out[base + 3] = eos.MWJF_DP0S0T0 + p * eos.MWJF_DP1S0T0
        out[base + 4] = eos.MWJF_DP0S0T1 + p ** 3 * eos.MWJF_DP3S0T1
        out[base + 5] = eos.MWJF_DP0S0T3 + p ** 2 * eos.MWJF_DP2S0T3
    if cfg.state_range_opt == "enforce" and ts_range is not None:
        out[_TMIN] = np.asarray(ts_range.tmin).ravel()
        out[_TMAX] = np.asarray(ts_range.tmax).ravel()
        out[_SMIN] = np.asarray(ts_range.smin).ravel()
        out[_SMAX] = np.asarray(ts_range.smax).ravel()
    else:
        out[_TMIN], out[_TMAX] = -1000.0, 1000.0
        out[_SMIN], out[_SMAX] = 0.0, 1000.0
    dzw = np.asarray(grid.vgrid.dzw, np.float64).ravel()
    dzwr = np.asarray(grid.vgrid.dzwr, np.float64).ravel()
    out[_DZWT] = dzw[0:km]
    out[_DZWB] = dzw[1:km + 1]
    out[_DZWR] = dzwr[1:km + 1]
    return out.astype(np.float32)


def _mwjf_derivs(TQ, SQ, SQR, n00, n02, n10, d00, d01, d03):
    """(drdt, drds) of the MWJF rational fit given the per-level scalar
    coefficients (source/state_mod.F90:418-498; the p-independent terms
    are compile-time constants)."""
    n01 = eos.MWJF_NP0S0T1
    n03 = eos.MWJF_NP0S0T3
    n11 = eos.MWJF_NP0S1T1
    n20 = eos.MWJF_NP0S2T0
    d02 = eos.MWJF_DP0S0T2
    d04 = eos.MWJF_DP0S0T4
    d10 = eos.MWJF_DP0S1T0
    d11 = eos.MWJF_DP0S1T1
    d13 = eos.MWJF_DP0S1T3
    dq0 = eos.MWJF_DP0SQT0
    dq2 = eos.MWJF_DP0SQT2

    work1 = (n00 + TQ * (n01 + TQ * (n02 + n03 * TQ))
             + SQ * (n10 + n11 * TQ + n20 * SQ))
    work2 = (d00 + TQ * (d01 + TQ * (d02 + TQ * (d03 + d04 * TQ)))
             + SQ * (d10 + TQ * (d11 + TQ * TQ * d13)
                     + SQR * (dq0 + TQ * TQ * dq2)))
    denomk = 1.0 / work2

    w3t = n01 + TQ * (2.0 * n02 + 3.0 * n03 * TQ) + n11 * SQ
    w4t = (d01 + SQ * d11
           + TQ * (2.0 * (d02 + SQ * SQR * dq2)
                   + TQ * (3.0 * (d03 + SQ * d13) + TQ * 4.0 * d04)))
    drdt = (w3t - work1 * denomk * w4t) * denomk

    w3s = n10 + n11 * TQ + 2.0 * n20 * SQ
    w4s = (d10 + TQ * (d11 + TQ * TQ * d13)
           + 1.5 * SQR * (dq0 + TQ * TQ * dq2))
    drds = (w3s - work1 * denomk * w4s) * denomk * 1000.0
    return drdt, drds


def _pick_by(km, ny, nx):
    """Largest y-tile whose VMEM working set fits.  Extended input block
    (by+16 rows): T/S (2); staged outputs (by rows): slpack 8 + sla 2 +
    n2 1."""
    for by in (32, 16, 8):
        if ny % by:
            continue
        ext = by + 16
        b = (2 * km * ext * nx * 4
             + 11 * km * by * nx * 4
             + 8 * ext * nx * 4)
        if b <= _VMEM_BUDGET:
            return by
    return None


def _kernel(km, by, nx, ew, s_edge, n_edge,
            coef_ref,
            # HBM operands
            tmix_hbm, kmt_hbm, dxt_hbm, dyt_hbm,
            sed_tm, sed_kmt, ned_tm, ned_kmt,
            # outputs
            slp_hbm, sla_hbm, n2_hbm,
            # VMEM scratch
            etm, ekmt, edxt, edyt, oslp, osla, on2, sems):
    ext = by + 16
    t = pl.program_id(0)
    ntiles = pl.num_programs(0)
    j0 = pl.multiple_of(t * by, 8)
    _E8 = np.int32(8)

    # ---- DMA the extended block -------------------------------------------
    copies = []

    def dma(src, dst, slot):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        copies.append(c)

    dma(tmix_hbm.at[pl.ds(_I0, 2), :, pl.ds(j0, by), :],
        etm.at[:, :, pl.ds(_E8, by), :], 0)
    dma(kmt_hbm.at[pl.ds(j0, by), :], ekmt.at[pl.ds(_E8, by), :], 1)
    dma(dxt_hbm.at[pl.ds(j0, by), :], edxt.at[pl.ds(_E8, by), :], 2)
    dma(dyt_hbm.at[pl.ds(j0, by), :], edyt.at[pl.ds(_E8, by), :], 3)

    nrow0 = np.int32(8 + by)

    @pl.when(t > 0)
    def _():
        js = pl.multiple_of(j0 - 8, 8)
        h = []
        for src, dst, slot in (
                (tmix_hbm.at[pl.ds(_I0, 2), :, pl.ds(js, 8), :],
                 etm.at[:, :, pl.ds(_I0, 8), :], 4),
                (kmt_hbm.at[pl.ds(js, 8), :],
                 ekmt.at[pl.ds(_I0, 8), :], 5),
                (dxt_hbm.at[pl.ds(js, 8), :],
                 edxt.at[pl.ds(_I0, 8), :], 6),
                (dyt_hbm.at[pl.ds(js, 8), :],
                 edyt.at[pl.ds(_I0, 8), :], 7)):
            c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for c in h:
            c.wait()

    if s_edge == "data":
        @pl.when(t == 0)
        def _():
            h = []
            for src, dst, slot in (
                    (sed_tm, etm.at[:, :, pl.ds(_I0, 8), :], 4),
                    (sed_kmt, ekmt.at[pl.ds(_I0, 8), :], 5)):
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for c in h:
                c.wait()
            edxt[0:8, :] = jnp.ones((8, nx), jnp.float32)
            edyt[0:8, :] = jnp.ones((8, nx), jnp.float32)
    else:
        @pl.when(t == 0)
        def _():
            etm[:, :, 0:8, :] = jnp.zeros((2, km, 8, nx), jnp.float32)
            ekmt[0:8, :] = jnp.zeros((8, nx), jnp.int32)
            edxt[0:8, :] = jnp.ones((8, nx), jnp.float32)
            edyt[0:8, :] = jnp.ones((8, nx), jnp.float32)

    @pl.when(t < ntiles - 1)
    def _():
        jn = pl.multiple_of(j0 + by, 8)
        h = []
        for src, dst, slot in (
                (tmix_hbm.at[pl.ds(_I0, 2), :, pl.ds(jn, 8), :],
                 etm.at[:, :, pl.ds(nrow0, 8), :], 8),
                (kmt_hbm.at[pl.ds(jn, 8), :],
                 ekmt.at[pl.ds(nrow0, 8), :], 9),
                (dxt_hbm.at[pl.ds(jn, 8), :],
                 edxt.at[pl.ds(nrow0, 8), :], 10),
                (dyt_hbm.at[pl.ds(jn, 8), :],
                 edyt.at[pl.ds(nrow0, 8), :], 11)):
            c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for c in h:
            c.wait()

    if n_edge == "data":
        @pl.when(t == ntiles - 1)
        def _():
            h = []
            for src, dst, slot in (
                    (ned_tm, etm.at[:, :, pl.ds(nrow0, 8), :], 8),
                    (ned_kmt, ekmt.at[pl.ds(nrow0, 8), :], 9)):
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for c in h:
                c.wait()
            edxt[8 + by:, :] = jnp.ones((8, nx), jnp.float32)
            edyt[8 + by:, :] = jnp.ones((8, nx), jnp.float32)
    else:
        @pl.when(t == ntiles - 1)
        def _():
            etm[:, :, 8 + by:, :] = jnp.zeros((2, km, 8, nx),
                                             jnp.float32)
            ekmt[8 + by:, :] = jnp.zeros((8, nx), jnp.int32)
            edxt[8 + by:, :] = jnp.ones((8, nx), jnp.float32)
            edyt[8 + by:, :] = jnp.ones((8, nx), jnp.float32)

    for c in copies:
        c.wait()

    # ---- uniform N/S shifts over the extended block -----------------------
    def sh_n(x):
        return pltpu.roll(x, np.int32(ext - 1), axis=x.ndim - 2)

    def sh_s(x):
        return pltpu.roll(x, np.int32(1), axis=x.ndim - 2)

    kmt_c = ekmt[...]
    kmt_e = _roll_e(kmt_c, ew)
    kmt_n = sh_n(kmt_c)
    dxt = edxt[...]
    dyt = edyt[...]
    dxt2r = 1.0 / jnp.where(dxt > 0.0, dxt, 1.0) ** 2
    dyt2r = 1.0 / jnp.where(dyt > 0.0, dyt, 1.0) ** 2

    def center(v):
        return v[8:8 + by, :]

    def level(k):
        ki = np.int32(k)
        km1 = np.int32(max(k - 1, 0))
        kp = np.int32(min(k + 1, km - 1))
        kk = k + 1

        def c(ch):
            return coef_ref[np.int32(ch), ki]

        T = etm[_I0, ki]
        S = etm[_I1, ki]
        TQ = jnp.clip(T, c(_TMIN), c(_TMAX))
        SQ = 1000.0 * jnp.clip(S, c(_SMIN), c(_SMAX))
        SQR = jnp.sqrt(SQ)
        drdt, drds = _mwjf_derivs(TQ, SQ, SQR, c(_N00A), c(_N02A),
                                  c(_N10A), c(_D00A), c(_D01A), c(_D03A))

        tclip = jnp.maximum(T, -2.0)
        kmaske = ((kk <= kmt_c) & (kk <= kmt_e)).astype(jnp.float32)
        kmaskn = ((kk <= kmt_c) & (kk <= kmt_n)).astype(jnp.float32)

        txp = kmaske * (_roll_e(tclip, ew) - tclip)
        txs = kmaske * (_roll_e(S, ew) - S)
        typ = kmaskn * (sh_n(tclip) - tclip)
        tys = kmaskn * (sh_n(S) - S)

        rx_e = drdt * txp + drds * txs
        rx_w = drdt * _roll_w(txp, ew) + drds * _roll_w(txs, ew)
        ry_n = drdt * typ + drds * tys
        ry_s = drdt * sh_s(typ) + drds * sh_s(tys)

        # vertical density differences with level-k coefficients
        if k > 0:
            Tm = etm[_I0, km1]
            tzp_c = jnp.maximum(Tm, -2.0) - tclip
            tzs_c = etm[_I1, km1] - S
        else:
            tzp_c = jnp.zeros((ext, nx), jnp.float32)
            tzs_c = tzp_c
        if k < km - 1:
            Tp = etm[_I0, kp]
            tzp_p = tclip - jnp.maximum(Tp, -2.0)
            tzs_p = S - etm[_I1, kp]
        else:
            tzp_p = jnp.zeros((ext, nx), jnp.float32)
            tzs_p = tzp_p
        rz_ktp = jnp.minimum(drdt * tzp_c + drds * tzs_c, -EPS2)
        rz_kbt = jnp.minimum(drdt * tzp_p + drds * tzs_p, -EPS2)

        in_m = (kk <= kmt_c).astype(jnp.float32)
        below = (kk < kmt_c).astype(jnp.float32)
        izt = 1.0 / rz_ktp
        izb = 1.0 / rz_kbt
        if k == 0:
            # top half of level 1 has no interface above
            sxe0 = sxw0 = syn0 = sys0 = jnp.zeros((ext, nx), jnp.float32)
        else:
            sxe0 = in_m * rx_e * izt
            sxw0 = in_m * rx_w * izt
            syn0 = in_m * ry_n * izt
            sys0 = in_m * ry_s * izt
        sxe1 = below * rx_e * izb
        sxw1 = below * rx_w * izb
        syn1 = below * ry_n * izb
        sys1 = below * ry_s * izb

        sla_t = c(_DZWT) * jnp.sqrt(
            0.5 * ((sxe0 * sxe0 + sxw0 * sxw0) * dxt2r
                   + (syn0 * syn0 + sys0 * sys0) * dyt2r)) + EPS
        sla_b = c(_DZWB) * jnp.sqrt(
            0.5 * ((sxe1 * sxe1 + sxw1 * sxw1) * dxt2r
                   + (syn1 * syn1 + sys1 * sys1) * dyt2r)) + EPS

        # displaced-parcel N^2 (bfre profile, source/hmix_gm.F90:3104-3111)
        drdt_d, drds_d = _mwjf_derivs(TQ, SQ, SQR, c(_N00B), c(_N02B),
                                      c(_N10B), c(_D00B), c(_D01B),
                                      c(_D03B))
        if k < km - 1:
            w3 = drdt_d * tzp_p + drds_d * tzs_p
        else:
            w3 = jnp.zeros((ext, nx), jnp.float32)
        n2 = below * jnp.maximum(0.0, -const.GRAV * w3 * c(_DZWR))

        for ch, v in ((SXE0, sxe0), (SXE1, sxe1), (SXW0, sxw0),
                      (SXW1, sxw1), (SYN0, syn0), (SYN1, syn1),
                      (SYS0, sys0), (SYS1, sys1)):
            oslp[np.int32(ch), ki] = center(v)
        osla[_I0, ki] = center(sla_t)
        osla[_I1, ki] = center(sla_b)
        on2[ki] = center(n2)

    for k in range(km):
        level(k)

    # ---- write the tile back ----------------------------------------------
    outs = []
    for src, dst, slot in ((oslp, slp_hbm.at[:, :, pl.ds(j0, by), :], 12),
                           (osla, sla_hbm.at[:, :, pl.ds(j0, by), :], 13),
                           (on2, n2_hbm.at[:, pl.ds(j0, by), :], 14)):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        outs.append(c)
    for c in outs:
        c.wait()


@functools.partial(jax.jit,
                   static_argnames=("ew", "s_edge", "n_edge", "interpret"))
def slopes_tiles(coef, tmix, kmt, dxt, dyt, edges=None, ew="cyclic",
                 s_edge="closed", n_edge="closed", interpret=False):
    """(slpack, sla, n2) in one HBM pass over the T/S columns.  ``coef``
    is the (_NC, km) per-level scalar array from _level_coeffs; ``tmix``
    (nt, km, ny, nx) — only the first two (T, S) channels are read.

    ``edges`` (shard_map front-end, s_edge/n_edge 'data'): dict with
    sed_tm/ned_tm (2, km, 8, nx) and sed_kmt/ned_kmt (8, nx) neighbor
    blocks replacing the closed-edge zeros."""
    nt, km, ny, nx_log = tmix.shape
    nx = -(-nx_log // 128) * 128
    f32 = jnp.float32
    if edges is None:
        edges = {}
    e = {
        "sed_tm": edges.get("sed_tm", jnp.zeros((2, km, 8, nx_log), f32)),
        "sed_kmt": edges.get("sed_kmt", jnp.zeros((8, nx_log), jnp.int32)),
        "ned_tm": edges.get("ned_tm", jnp.zeros((2, km, 8, nx_log), f32)),
        "ned_kmt": edges.get("ned_kmt", jnp.zeros((8, nx_log), jnp.int32)),
    }
    if nx != nx_log:
        pad = functools.partial(_lane_pad, ew=ew)
        tmix, kmt, dxt, dyt = (pad(a) for a in (tmix, kmt, dxt, dyt))
        e = {k: pad(v) for k, v in e.items()}
    by = _pick_by(km, ny, nx)
    if by is None:
        raise ValueError(f"no admissible y-tile for ny={ny}")
    ntiles = ny // by
    ext = by + 16
    kmt = kmt.astype(jnp.int32)

    scratch = [
        pltpu.VMEM((2, km, ext, nx), f32),        # etm
        pltpu.VMEM((ext, nx), jnp.int32),         # ekmt
        pltpu.VMEM((ext, nx), f32),               # edxt
        pltpu.VMEM((ext, nx), f32),               # edyt
        pltpu.VMEM((8, km, by, nx), f32),         # oslp
        pltpu.VMEM((2, km, by, nx), f32),         # osla
        pltpu.VMEM((km, by, nx), f32),            # on2
        pltpu.SemaphoreType.DMA((15,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        scratch_shapes=scratch,
    )
    slp, sla, n2 = pl.pallas_call(
        functools.partial(_kernel, km, by, nx, ew, s_edge, n_edge),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, km, ny, nx), f32),
                   jax.ShapeDtypeStruct((2, km, ny, nx), f32),
                   jax.ShapeDtypeStruct((km, ny, nx), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024),
    )(coef, tmix.astype(f32), kmt, dxt.astype(f32), dyt.astype(f32),
      e["sed_tm"].astype(f32), e["sed_kmt"].astype(jnp.int32),
      e["ned_tm"].astype(f32), e["ned_kmt"].astype(jnp.int32))
    if nx != nx_log:
        slp, sla, n2 = (a[..., :nx_log] for a in (slp, sla, n2))
    return slp, sla, n2


def available(cfg, grid) -> bool:
    """The fused slope chain applies: MWJF EOS, full cells, closed/cyclic
    E-W, closed/tripole N-S, an admissible y-tiling, float32 on TPU;
    single chip or y-sharded dispatch meshes (per-shard blocks behind
    the shard_map/ppermute front-end)."""
    from pop2_tpu.tracer_pallas import _mesh_y_only
    mesh = _mesh_y_only()
    if mesh is None:
        return False               # x-sharded mesh: jnp fallback
    ny_loc = cfg.ny if mesh == "none" else cfg.ny // mesh.shape["y"]
    ok = (cfg.state_choice == "mwjf"
          and grid.DZT is None
          and cfg.ns_boundary in ("closed", "tripole")
          and cfg.ew_boundary in ("cyclic", "closed")
          and ny_loc % 8 == 0
          and _pick_by(cfg.km, ny_loc,
                       -(-cfg.nx // 128) * 128) is not None)
    if not ok:
        return False
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    return (jnp.dtype(cfg.jnp_dtype) == jnp.float32
            and jax.default_backend() == "tpu")


def slopes_raw(cfg, grid, bc, ts_range, tmix):
    """Model-facing wrapper: run the fused slope kernel (per shard under
    a y-sharded dispatch mesh), then re-patch the tripole top row from an
    8-row full-width jnp slab.  Returns (slpack, sla, n2) in the packed
    channel layout (SXE0..SYS1)."""
    from pop2_tpu import gm as gm_mod
    from pop2_tpu.tracer_pallas import _mesh_y_only
    f32 = jnp.float32
    coef = jnp.asarray(_level_coeffs(cfg, grid, ts_range))
    mesh = _mesh_y_only()
    if mesh == "none":
        slp, sla, n2 = slopes_tiles(
            coef, tmix.astype(f32), grid.KMT, grid.DXT.astype(f32),
            grid.DYT.astype(f32), ew=cfg.ew_boundary,
            interpret=force_interpret)
    else:
        slp, sla, n2 = _slopes_sharded(cfg, mesh, coef, tmix.astype(f32),
                                       grid.KMT, grid.DXT.astype(f32),
                                       grid.DYT.astype(f32))

    if cfg.ns_boundary == "tripole":
        # recompute the top rows from an 8-row full-width jnp slab (the
        # kernel treats the northern edge as closed; only the last row
        # reads the fold, but the slab is cheap insurance for row ny-1)
        rows = 8
        sgrid = _slice_grid(cfg, grid, rows)
        tx, ty, tz, slx_s, sly_s = gm_mod._slopes(
            cfg, sgrid, bc, ts_range, tmix[:, :, -rows:, :])
        sla_s = gm_mod._sla(cfg, sgrid, slx_s, sly_s)
        slp = slp.at[:, :, -1:, :].set(jnp.stack(
            [slx_s[0, 0], slx_s[0, 1], slx_s[1, 0], slx_s[1, 1],
             sly_s[0, 0], sly_s[0, 1], sly_s[1, 0], sly_s[1, 1]]
        )[:, :, -1:, :].astype(slp.dtype))
        sla = sla.at[:, :, -1:, :].set(sla_s[:, :, -1:, :].astype(sla.dtype))
    return slp, sla, n2


def unpack_slopes(slp):
    """(slx, sly) in gm.py's (face, half, km, ny, nx) layout."""
    slx = jnp.stack([jnp.stack([slp[0], slp[1]]),
                     jnp.stack([slp[2], slp[3]])])
    sly = jnp.stack([jnp.stack([slp[4], slp[5]]),
                     jnp.stack([slp[6], slp[7]])])
    return slx, sly


def slopes_wrapper(cfg, grid, bc, ts_range, tmix):
    """slopes_raw + unpack: (slx, sly, sla, n2)."""
    slp, sla, n2 = slopes_raw(cfg, grid, bc, ts_range, tmix)
    slx, sly = unpack_slopes(slp)
    return slx, sly, sla, n2


def _slice_grid(cfg, grid, rows):
    ny = cfg.ny

    def cut(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[-2] == ny:
            return leaf[..., -rows:, :]
        return leaf

    return jax.tree_util.tree_map(cut, grid)


def _slopes_sharded(cfg, mesh, coef, tmix, kmt, dxt, dyt):
    """shard_map front-end: each y shard exchanges 8-row T/S + KMT edge
    blocks with its neighbors via ppermute, then runs the fused slope
    kernel on its local block (gm_pallas._flux_assembly_sharded
    pattern).  Mesh edges receive ppermute zeros (== closed)."""
    from jax.sharding import PartitionSpec as P
    py = mesh.shape["y"]

    def body(tmix, kmt, dxt, dyt):
        up = [(i, i + 1) for i in range(py - 1)]
        dn = [(i + 1, i) for i in range(py - 1)]

        def from_south(x):
            return jax.lax.ppermute(x[..., -8:, :], "y", up)

        def from_north(x):
            return jax.lax.ppermute(x[..., :8, :], "y", dn)

        kmt32 = kmt.astype(jnp.int32)
        tm2 = tmix[:2]
        edges = {
            "sed_tm": from_south(tm2), "sed_kmt": from_south(kmt32),
            "ned_tm": from_north(tm2), "ned_kmt": from_north(kmt32),
        }
        return slopes_tiles(coef, tmix, kmt, dxt, dyt, edges=edges,
                            ew=cfg.ew_boundary, s_edge="data",
                            n_edge="data", interpret=force_interpret)

    yx = ("y", "x")
    p2 = P(*yx)
    p3 = P(None, *yx)
    p4 = P(None, None, *yx)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(p4, p2, p2, p2),
        out_specs=(p4, p4, p3),
        check_vma=False,
    )(tmix, kmt, dxt, dyt)
