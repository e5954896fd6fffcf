"""Fused Pallas TPU kernel for the GM taper/streamfunction/flux chain.

Consumes the slope kernel's outputs (gm_slope_pallas: slpack/sla/n2) and
runs, per y-tile and level, everything downstream of the slopes in
hdifft_gm (source/hmix_gm.F90:1102-2219) in ONE HBM pass:

  notanh slope tapers (:1405-1601)       -> taper_isop/taper_thic
  bfre/const kappa assembly (:1345-1399) -> KAPPA_ISOP/KAPPA_THIC
  merged streamfunction (:3441-3738)     -> SF through dia/trans/interior
  vertical transition profile (:3745-3840)
  skew-flux weight packs + per-tracer flux divergence (:1720-2080)
  VDC_GM (:1720-1750)
  [optionally] the submesoscale skew fluxes (mix_submeso.F90:779-1008),
  whose streamfunction Psi = amp2d(face) * mu(z) folds into the same
  weight packs — GM + submeso tendencies ride one flux assembly.

The tracer face/vertical differences are formed in-kernel from the
tracer columns (the jnp chain materializes tx/ty/tz = 3*nt fields), and
the merged-streamfunction boundary values W1/W2 (jnp: take_along_axis
gathers at K_LEVEL) are captured during an in-VMEM pre-pass over the
slope columns — the gather indices klev/ztw arrive as 2-D fields from
the transition-layer search, which stays in jnp (sequential scans).

Everything is evaluated on an EXTENDED block (8 halo rows each side of
the tile, gm_slope_pallas pattern): N/S neighbor access is a plain
sublane roll and the weight packs exist on the halo rows without any
special-casing; only the center rows are written back.

Scope: gm_transition_layer on, isotropic const/bfre kappa, full cells,
closed/cyclic E-W, closed/tripole N-S (top row re-patched by the
wrapper), float32.  Equivalence vs the jnp hdifft_gm is asserted by
tests/test_gm_chain.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pop2_tpu.tracer_pallas import (_VMEM_BUDGET, _lane_pad, _roll_e,
                                    _roll_w)
from pop2_tpu.gm_slope_pallas import (SXE0, SXE1, SXW0, SXW1, SYN0, SYN1,
                                      SYS0, SYS1)

#: None = auto (TPU + float32 + supported config); True/False forces.
USE_PALLAS = None
force_interpret = False

EPS = 1.0e-10

_I0, _I1 = np.int32(0), np.int32(1)

# per-level SMEM scalar channels
(_DZ, _DZR, _RDT, _RDB, _TRT, _TRB, _DZWKP) = range(7)
_NL = 7

# 2-D pack channels
(_KMT, _HYX, _HXY, _TAR, _DD, _THK, _IDP, _KLEV, _ZTW,
 _DZK, _DZK1, _DZK2, _DZWRK, _DZWRK1,
 _SMAXE, _SMAXW, _SMAYN, _SMAYS, _SMML) = range(19)
_N2D = 19


class ChainParams(NamedTuple):
    nt: int
    km: int
    by: int
    nx: int
    ew: str
    s_edge: str
    n_edge: str
    kv_bfre: bool          # bfre kappa (max(kv, deep)); else const
    with_sm: bool          # fold the submesoscale skew fluxes in
    want_diags: bool       # emit kappa_isop/kappa_thic/hor_diff columns
    slm_r: float
    slm_b: float
    ah: float
    ah_bolus: float
    isop_deep: float
    thic_deep: float
    ah_srfbl: float
    hd_const: bool         # gm_use_const_ah_bkg_srfbl
    ah_bottom: float


def _level_scalars(cfg, grid):
    km = cfg.km
    dz = np.asarray(grid.vgrid.dz, np.float64).ravel()
    zt = np.asarray(grid.vgrid.zt, np.float64).ravel()
    zw = np.asarray(grid.vgrid.zw, np.float64).ravel()
    dzw = np.asarray(grid.vgrid.dzw, np.float64).ravel()
    out = np.zeros((_NL, km), np.float64)
    out[_DZ] = dz
    out[_DZR] = 1.0 / dz
    out[_RDT] = zt - 0.25 * dz
    out[_RDB] = zt + 0.25 * dz
    kp1 = np.minimum(np.arange(1, km + 1), km - 1)
    trt = zt[kp1].copy()
    trt[km - 1] = zw[km - 1]
    out[_TRT] = trt
    out[_TRB] = zw[kp1]
    out[_DZWKP] = dzw[1:km + 1]
    return out.astype(np.float32)


def _notanh(x_in, slm):
    x = x_in / slm
    mid = 0.5 * (1.0 - (2.5 * x - 1.0) * (4.0 - jnp.abs(10.0 * x - 4.0)))
    return jnp.where(x <= 0.2, 1.0, jnp.where(x >= 0.6, 0.0, mid))


def _pick_by(nt, km, ny, nx, want_diags):
    """Largest y-tile whose VMEM working set fits: extended blocks
    (by+16 rows) for tmix(nt)+slp(8)+sla(2)+kv(1), staged outputs (by
    rows) for gtk(nt)+vdc(1)[+diags(3)]."""
    nout = nt + 1 + (3 if want_diags else 0)
    for by in (16, 8):
        if ny % by:
            continue
        ext = by + 16
        b = ((nt + 11) * km * ext * nx * 4
             + nout * km * by * nx * 4
             + (_N2D + 8) * ext * nx * 4)
        if b <= _VMEM_BUDGET - (8 << 20):
            return by
    return None


def _kernel(p: ChainParams, lev_ref,
            # HBM operands
            tmix_hbm, slp_hbm, sla_hbm, kv_hbm, g2d_hbm,
            sed_tm, sed_slp, sed_sla, sed_kv, sed_g2d,
            ned_tm, ned_slp, ned_sla, ned_kv, ned_g2d,
            # outputs
            gtk_hbm, vdc_hbm, diag_hbm,
            # VMEM scratch
            etm, eslp, esla, ekv, eg2d, ogtk, ovdc, odiag, sems):
    nt, km, by, nx, ew = p.nt, p.km, p.by, p.nx, p.ew
    ext = by + 16
    t = pl.program_id(0)
    ntiles = pl.num_programs(0)
    j0 = pl.multiple_of(t * by, 8)
    _E8 = np.int32(8)
    nrow0 = np.int32(8 + by)

    # ---- DMA the extended blocks ------------------------------------------
    copies = []

    def dma(src, dst, slot):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        copies.append(c)

    dma(tmix_hbm.at[:, :, pl.ds(j0, by), :],
        etm.at[:, :, pl.ds(_E8, by), :], 0)
    dma(slp_hbm.at[:, :, pl.ds(j0, by), :],
        eslp.at[:, :, pl.ds(_E8, by), :], 1)
    dma(sla_hbm.at[:, :, pl.ds(j0, by), :],
        esla.at[:, :, pl.ds(_E8, by), :], 2)
    dma(kv_hbm.at[:, pl.ds(j0, by), :], ekv.at[:, pl.ds(_E8, by), :], 3)
    dma(g2d_hbm.at[:, pl.ds(j0, by), :], eg2d.at[:, pl.ds(_E8, by), :], 4)

    south = ((tmix_hbm, etm, 5), (slp_hbm, eslp, 6), (sla_hbm, esla, 7))

    @pl.when(t > 0)
    def _():
        js = pl.multiple_of(j0 - 8, 8)
        h = []
        for src, dst, slot in south:
            c = pltpu.make_async_copy(src.at[:, :, pl.ds(js, 8), :],
                                      dst.at[:, :, pl.ds(_I0, 8), :],
                                      sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for src, dst, slot in ((kv_hbm, ekv, 8), (g2d_hbm, eg2d, 9)):
            c = pltpu.make_async_copy(src.at[:, pl.ds(js, 8), :],
                                      dst.at[:, pl.ds(_I0, 8), :],
                                      sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for c in h:
            c.wait()

    if p.s_edge == "data":
        @pl.when(t == 0)
        def _():
            h = []
            for src, dst, slot in ((sed_tm, etm, 5), (sed_slp, eslp, 6),
                                   (sed_sla, esla, 7)):
                c = pltpu.make_async_copy(src,
                                          dst.at[:, :, pl.ds(_I0, 8), :],
                                          sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for src, dst, slot in ((sed_kv, ekv, 8), (sed_g2d, eg2d, 9)):
                c = pltpu.make_async_copy(src,
                                          dst.at[:, pl.ds(_I0, 8), :],
                                          sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for c in h:
                c.wait()
    else:
        @pl.when(t == 0)
        def _():
            etm[:, :, 0:8, :] = jnp.zeros((nt, km, 8, nx), jnp.float32)
            eslp[:, :, 0:8, :] = jnp.zeros((8, km, 8, nx), jnp.float32)
            esla[:, :, 0:8, :] = jnp.zeros((2, km, 8, nx), jnp.float32)
            ekv[:, 0:8, :] = jnp.zeros((km, 8, nx), jnp.float32)
            eg2d[:, 0:8, :] = jnp.zeros((_N2D, 8, nx), jnp.float32)

    @pl.when(t < ntiles - 1)
    def _():
        jn = pl.multiple_of(j0 + by, 8)
        h = []
        for src, dst, slot in ((tmix_hbm, etm, 10), (slp_hbm, eslp, 11),
                               (sla_hbm, esla, 12)):
            c = pltpu.make_async_copy(src.at[:, :, pl.ds(jn, 8), :],
                                      dst.at[:, :, pl.ds(nrow0, 8), :],
                                      sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for src, dst, slot in ((kv_hbm, ekv, 13), (g2d_hbm, eg2d, 14)):
            c = pltpu.make_async_copy(src.at[:, pl.ds(jn, 8), :],
                                      dst.at[:, pl.ds(nrow0, 8), :],
                                      sems.at[np.int32(slot)])
            c.start()
            h.append(c)
        for c in h:
            c.wait()

    if p.n_edge == "data":
        @pl.when(t == ntiles - 1)
        def _():
            h = []
            for src, dst, slot in ((ned_tm, etm, 10), (ned_slp, eslp, 11),
                                   (ned_sla, esla, 12)):
                c = pltpu.make_async_copy(src,
                                          dst.at[:, :, pl.ds(nrow0, 8), :],
                                          sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for src, dst, slot in ((ned_kv, ekv, 13), (ned_g2d, eg2d, 14)):
                c = pltpu.make_async_copy(src,
                                          dst.at[:, pl.ds(nrow0, 8), :],
                                          sems.at[np.int32(slot)])
                c.start()
                h.append(c)
            for c in h:
                c.wait()
    else:
        @pl.when(t == ntiles - 1)
        def _():
            etm[:, :, 8 + by:, :] = jnp.zeros((nt, km, 8, nx), jnp.float32)
            eslp[:, :, 8 + by:, :] = jnp.zeros((8, km, 8, nx), jnp.float32)
            esla[:, :, 8 + by:, :] = jnp.zeros((2, km, 8, nx), jnp.float32)
            ekv[:, 8 + by:, :] = jnp.zeros((km, 8, nx), jnp.float32)
            eg2d[:, 8 + by:, :] = jnp.zeros((_N2D, 8, nx), jnp.float32)

    for c in copies:
        c.wait()

    # ---- uniform N/S shifts over the extended block -----------------------
    def sh_n(x):
        return pltpu.roll(x, np.int32(ext - 1), axis=x.ndim - 2)

    def sh_s(x):
        return pltpu.roll(x, np.int32(1), axis=x.ndim - 2)

    def g2(ch):
        return eg2d[np.int32(ch)]

    kmt = g2(_KMT)
    kmt_e = _roll_e(kmt, ew)
    kmt_n = sh_n(kmt)
    hyx = g2(_HYX)
    hyxw = _roll_w(hyx, ew)
    hxy = g2(_HXY)
    hxys = sh_s(hxy)
    tarea_r = g2(_TAR)
    dd = g2(_DD)
    thick = g2(_THK)
    idp = g2(_IDP)
    ocean = kmt > 0.0
    w5 = jnp.where(ocean, 1.0 / jnp.where(ocean, 2.0 * dd + thick, 1.0),
                   0.0)
    thick_ok = thick > EPS
    safe_thick = jnp.where(thick_ok, thick, 1.0)
    w6 = jnp.where(ocean & thick_ok, w5 / safe_thick, 0.0)

    def lv(ch, k):
        return lev_ref[np.int32(ch), np.int32(k)]

    # ---- per-level taper/kappa (pre-profile kthic; profiled kisop/hd) ----
    def tapers_kappa(k):
        kk = k + 1.0
        ki = np.int32(k)
        sla_t = esla[_I0, ki]
        sla_b = esla[_I1, ki]
        t2_t = _notanh(sla_t, p.slm_r)
        t2_b = _notanh(sla_b, p.slm_r)
        if p.slm_b == p.slm_r:
            t3_t, t3_b = t2_t, t2_b
        else:
            t3_t = _notanh(sla_t, p.slm_b)
            t3_b = _notanh(sla_b, p.slm_b)
        ind_t = lv(_TRT, k) <= dd
        ind_b = lv(_TRB, k) <= dd
        tapI_t = jnp.where(ind_t, 1.0, t2_t)
        tapI_b = jnp.where(ind_b, 1.0, t2_b)
        tapT_t = jnp.where(ind_t, 1.0, t3_t)
        tapT_b = jnp.where(ind_b, 1.0, t3_b)

        kvv = ekv[ki]
        if p.kv_bfre:
            kis0 = p.ah * jnp.maximum(kvv, p.isop_deep)
            kth0 = p.ah_bolus * jnp.maximum(kvv, p.thic_deep)
        else:
            ones = jnp.ones_like(kvv)
            kis0 = p.ah * ones
            kth0 = p.ah_bolus * ones
        kisop_t = tapI_t * kis0
        kisop_b = tapI_b * kis0
        kthic_t = tapT_t * kth0
        kthic_b = tapT_b * kth0
        if k == 0:
            kisop_t = jnp.zeros_like(kisop_t)
            kthic_t = jnp.zeros_like(kthic_t)
        at_bot = kk == kmt
        kisop_b = jnp.where(at_bot, 0.0, kisop_b)
        kthic_b = jnp.where(at_bot, 0.0, kthic_b)
        return kisop_t, kisop_b, kthic_t, kthic_b, kis0

    # ---- pre-pass: capture W1/W2 inputs at K_LEVEL ------------------------
    klev = g2(_KLEV)
    ztw = g2(_ZTW)
    idx0 = jnp.clip(klev - 1.0, 0.0, km - 1.0)
    idx1 = jnp.clip(klev, 0.0, km - 1.0)
    idx2 = jnp.clip(klev + 1.0, 0.0, km - 1.0)

    zeros2 = jnp.zeros((ext, nx), jnp.float32)
    faces = (SXE0, SXW0, SYN0, SYS0)      # ktp channel per face
    facesb = (SXE1, SXW1, SYN1, SYS1)     # kbt channel per face
    cap_b_k = [zeros2] * 4
    cap_t_k1 = [zeros2] * 4
    cap_b_k1 = [zeros2] * 4
    cap_t_k2 = [zeros2] * 4
    th_b_k = th_t_k1 = th_b_k1 = th_t_k2 = zeros2

    for k in range(km):
        ki = np.int32(k)
        kf = float(k)
        s0 = idx0 == kf
        s1 = idx1 == kf
        s2 = idx2 == kf
        for f in range(4):
            slt = eslp[np.int32(faces[f]), ki]
            slb = eslp[np.int32(facesb[f]), ki]
            cap_b_k[f] = cap_b_k[f] + jnp.where(s0, slb, 0.0)
            cap_t_k1[f] = cap_t_k1[f] + jnp.where(s1, slt, 0.0)
            cap_b_k1[f] = cap_b_k1[f] + jnp.where(s1, slb, 0.0)
            cap_t_k2[f] = cap_t_k2[f] + jnp.where(s2, slt, 0.0)
        _, _, tht, thb, _ = tapers_kappa(k)
        th_b_k = th_b_k + jnp.where(s0, thb, 0.0)
        th_t_k1 = th_t_k1 + jnp.where(s1, tht, 0.0)
        th_b_k1 = th_b_k1 + jnp.where(s1, thb, 0.0)
        th_t_k2 = th_t_k2 + jnp.where(s2, tht, 0.0)

    dz_k = g2(_DZK)
    dz_k1 = g2(_DZK1)
    dz_k2 = g2(_DZK2)
    dzwr_k = g2(_DZWRK)
    dzwr_k1 = g2(_DZWRK1)
    m1 = (ztw == 1.0) & (klev < kmt) & (klev > 0.0)
    m2 = (ztw == 2.0) & (klev < kmt) & (klev > 0.0)
    deeper = m2 & (klev + 1.0 < kmt)

    w1f = []
    w2f = []
    for f in range(4):
        w1_a = th_b_k * cap_b_k[f] * dz_k
        w2_a = 2.0 * dzwr_k * (w1_a - th_t_k1 * cap_t_k1[f] * dz_k1)
        w2n_a = 2.0 * (th_t_k1 * cap_t_k1[f] - th_b_k1 * cap_b_k1[f])
        w2_a = jnp.where(jnp.abs(w2n_a) < jnp.abs(w2_a), w2n_a, w2_a)
        w1_b0 = th_t_k1 * cap_t_k1[f]
        w2_b = 2.0 * (w1_b0 - th_b_k1 * cap_b_k1[f])
        w1_b = w1_b0 * dz_k1
        w2n_b = 2.0 * dzwr_k1 * (th_b_k1 * cap_b_k1[f] * dz_k1
                                 - th_t_k2 * cap_t_k2[f] * dz_k2)
        w2_b = jnp.where(deeper & (jnp.abs(w2n_b) < jnp.abs(w2_b)),
                         w2n_b, w2_b)
        w1f.append(jnp.where(m1, w1_a, jnp.where(m2, w1_b, 0.0)))
        w2f.append(jnp.where(m1, w2_a, jnp.where(m2, w2_b, 0.0)))

    if p.with_sm:
        sm_a = [g2(_SMAXE), g2(_SMAXW), g2(_SMAYN), g2(_SMAYS)]
        ml = g2(_SMML)
        ml_safe = jnp.where(ml > 0.0, ml, 1.0)

    # ---- per-level chain: packs for the flux assembly ---------------------
    def chain(k):
        kk = k + 1.0
        ki = np.int32(k)
        kisop_t, kisop_b, kthic_t, kthic_b, kis0 = tapers_kappa(k)

        rdt = lv(_RDT, k)
        rdb = lv(_RDB, k)
        in_col = kk <= kmt
        dzk = lv(_DZ, k)

        # hor_diff + vertical transition profile (:1603-1628, :3745-3840)
        if p.hd_const:
            hd0 = jnp.full((ext, nx), p.ah_srfbl, jnp.float32)
        else:
            hd0 = kis0
        out = {}
        for half, rd in (("t", rdt), ("b", rdb)):
            z_dia = (rd <= dd) & in_col
            z_tlp = (rd > dd) & (rd <= idp) & in_col & thick_ok
            z_int = (rd > idp) & in_col
            kis = kisop_t if half == "t" else kisop_b
            kis = jnp.where(z_dia, 0.0,
                            jnp.where(z_tlp, (rd - dd) * kis / safe_thick,
                                      kis))
            hd = jnp.where(z_tlp, (idp - rd) * hd0 / safe_thick, hd0)
            hd = jnp.where(z_int, 0.0, hd)
            out["kis_" + half] = kis
            out["hd_" + half] = hd

            # merged streamfunction regions (:3613-3655; no thick gate)
            z_tl = (rd > dd) & (rd <= idp) & in_col
            kth = kthic_t if half == "t" else kthic_b
            sf = []
            for f, cht, chb in ((0, SXE0, SXE1), (1, SXW0, SXW1),
                                (2, SYN0, SYN1), (3, SYS0, SYS1)):
                sl = eslp[np.int32(cht if half == "t" else chb), ki]
                lin = rd * w5 * (2.0 * w1f[f] + thick * w2f[f])
                quad = (-(dd - rd) ** 2 * w6
                        * (w1f[f] + idp * w2f[f]) + lin)
                interior = kth * sl * dzk
                v = jnp.where(z_dia, lin,
                              jnp.where(z_tl, quad,
                                        jnp.where(z_int, interior, 0.0)))
                if p.with_sm:
                    act = (rd < ml) & in_col
                    w3s = (1.0 - 2.0 * rd / ml_safe) ** 2
                    mu = (1.0 - w3s) * (1.0 + (5.0 / 21.0) * w3s)
                    v = v + jnp.where(act, mu * sm_a[f], 0.0)
                sf.append(v)
            out["sf_" + half] = sf

        if p.ah_bottom != 0.0:
            out["hd_b"] = jnp.where(kk == kmt, p.ah_bottom, out["hd_b"])

        kis_t, kis_b = out["kis_t"], out["kis_b"]
        sf_t, sf_b = out["sf_t"], out["sf_b"]
        sl = [[eslp[np.int32(faces[f]), ki], eslp[np.int32(facesb[f]), ki]]
              for f in range(4)]

        # weight packs (gm_pallas._packs, cancellation=False)
        out["v_t"] = [kis_t * sl[f][0] * dzk - sf_t[f] for f in range(4)]
        out["v_b"] = [kis_b * sl[f][1] * dzk - sf_b[f] for f in range(4)]
        out["A"] = [dzk * kis_b * sl[f][1] + sf_b[f] for f in range(4)]
        out["B"] = [dzk * kis_t * sl[f][0] + sf_t[f] for f in range(4)]
        out["weff"] = kis_t + kis_b + out["hd_t"] + out["hd_b"]
        out["kisop_t"] = kis_t
        out["kisop_b"] = kis_b
        out["kthic_t"] = kthic_t
        out["kthic_b"] = kthic_b

        # VDC_GM quadratic slope sums (:1720-1750)
        qx_b = hyx * sl[0][1] ** 2 + hyxw * sl[1][1] ** 2
        qy_b = hxy * sl[2][1] ** 2 + hxys * sl[3][1] ** 2
        qx_t = hyx * sl[0][0] ** 2 + hyxw * sl[1][0] ** 2
        qy_t = hxy * sl[2][0] ** 2 + hxys * sl[3][0] ** 2
        out["part_a"] = dzk * 0.25 * kis_b * (qx_b + qy_b)
        out["part_b"] = dzk * 0.25 * kis_t * (qx_t + qy_t)

        out["cx"] = jnp.where((kk <= kmt) & (kk <= kmt_e), 0.25 * hyx, 0.0)
        out["cy"] = jnp.where((kk <= kmt) & (kk <= kmt_n), 0.25 * hxy, 0.0)
        out["kmask"] = (kk < kmt).astype(jnp.float32)
        out["tmask"] = in_col.astype(jnp.float32)

        if p.want_diags:
            odiag[_I0, ki] = _center(0.5 * (kis_t + kis_b), by)
            odiag[_I1, ki] = _center(0.5 * (kthic_t + kthic_b), by)
            odiag[np.int32(2), ki] = _center(
                0.5 * (out["hd_t"] + out["hd_b"]), by)
        return out

    # ---- flux assembly loop with one-level carries ------------------------
    def tdiffs(L, k):
        ki = np.int32(k)
        kp = np.int32(min(k + 1, km - 1))
        km1 = np.int32(max(k - 1, 0))
        kk = k + 1.0
        maskE = ((kk <= kmt) & (kk <= kmt_e)).astype(jnp.float32)
        maskN = ((kk <= kmt) & (kk <= kmt_n)).astype(jnp.float32)
        txs, tys, tzs, tzps = [], [], [], []
        for n in range(nt):
            nn = np.int32(n)
            trc = etm[nn, ki]
            txs.append(maskE * (_roll_e(trc, ew) - trc))
            tys.append(maskN * (sh_n(trc) - trc))
            if k > 0:
                tzs.append(etm[nn, km1] - trc)
            else:
                tzs.append(jnp.zeros((ext, nx), jnp.float32))
            if k < km - 1:
                tzps.append(trc - etm[nn, kp])
            else:
                tzps.append(tzs[n])
        return txs, tys, tzs, tzps

    def fluxes(L, txs, tys, tzs, tzps):
        weff = L["weff"]
        work3 = weff + _roll_e(weff, ew)
        work4 = weff + sh_n(weff)
        vE0, vW0 = L["v_t"][0], L["v_t"][1]
        vE1, vW1 = L["v_b"][0], L["v_b"][1]
        wN0, wS0 = L["v_t"][2], L["v_t"][3]
        wN1, wS1 = L["v_b"][2], L["v_b"][3]
        vW0e = _roll_e(vW0, ew)
        vW1e = _roll_e(vW1, ew)
        wS0n = sh_n(wS0)
        wS1n = sh_n(wS1)
        dzk = L["dzk"]
        fxs, fys = [], []
        for n in range(nt):
            fx = (dzk * L["cx"] * txs[n] * work3
                  - L["cx"] * (vE0 * tzs[n] + vE1 * tzps[n]
                               + vW0e * _roll_e(tzs[n], ew)
                               + vW1e * _roll_e(tzps[n], ew)))
            fy = (dzk * L["cy"] * tys[n] * work4
                  - L["cy"] * (wN0 * tzs[n] + wN1 * tzps[n]
                               + wS0n * sh_n(tzs[n])
                               + wS1n * sh_n(tzps[n])))
            fxs.append(fx)
            fys.append(fy)
        return fxs, fys

    def emit(j, Lp, txp, typ_, fxp, fyp, fztop, Bcur, txc, tyc, pb_cur):
        """gtk/vdc for level j (carried) using level j+1's B pack."""
        ji = np.int32(j)
        dzrj = lv(_DZR, j)
        kmaskj = Lp["kmask"]
        new_fz = []
        for n in range(nt):
            work = (Lp["A"][0] * hyx * txp[n]
                    + Lp["A"][1] * hyxw * _roll_w(txp[n], ew)
                    + Lp["A"][2] * hxy * typ_[n]
                    + Lp["A"][3] * hxys * sh_s(typ_[n]))
            if Bcur is not None:
                work = work + (Bcur[0] * hyx * txc[n]
                               + Bcur[1] * hyxw * _roll_w(txc[n], ew)
                               + Bcur[2] * hxy * tyc[n]
                               + Bcur[3] * hxys * sh_s(tyc[n]))
            fz = -kmaskj * 0.25 * work
            gtk = ((fxp[n] - _roll_w(fxp[n], ew) + fyp[n] - sh_s(fyp[n])
                    + fztop[n] - fz) * dzrj * tarea_r)
            ogtk[np.int32(n), ji] = _center(Lp["tmask"] * gtk, by)
            new_fz.append(fz)
        vdc = (lv(_DZWKP, j) * kmaskj * tarea_r
               * (Lp["part_a"] + (pb_cur if pb_cur is not None else 0.0)))
        ovdc[ji] = _center(vdc, by)
        return new_fz

    carry = None
    fztop = [jnp.zeros((ext, nx), jnp.float32) for _ in range(nt)]
    for k in range(km):
        L = chain(k)
        L["dzk"] = lv(_DZ, k)
        txs, tys, tzs, tzps = tdiffs(L, k)
        fxs, fys = fluxes(L, txs, tys, tzs, tzps)
        if carry is not None:
            Lp, txp, typ_, fxp, fyp = carry
            fztop = emit(k - 1, Lp, txp, typ_, fxp, fyp, fztop,
                         L["B"], txs, tys, L["part_b"])
        carry = (L, txs, tys, fxs, fys)
    Lp, txp, typ_, fxp, fyp = carry
    emit(km - 1, Lp, txp, typ_, fxp, fyp, fztop, None, None, None, None)

    # ---- write the tile back ----------------------------------------------
    outs = []
    for src, dst, slot in (
            (ogtk, gtk_hbm.at[:, :, pl.ds(j0, by), :], 15),
            (ovdc, vdc_hbm.at[:, pl.ds(j0, by), :], 16)):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        outs.append(c)
    if p.want_diags:
        c = pltpu.make_async_copy(odiag,
                                  diag_hbm.at[:, :, pl.ds(j0, by), :],
                                  sems.at[np.int32(17)])
        c.start()
        outs.append(c)
    for c in outs:
        c.wait()


def _center(v, by):
    return v[8:8 + by, :]


@functools.partial(jax.jit, static_argnames=("p", "interpret"))
def chain_tiles(p: ChainParams, lev, tmix, slp, sla, kv, g2d, edges=None,
                interpret=False):
    """(gtk, vdc_gm[, diags]) in one HBM pass.  ``g2d`` is the (N2D, ny,
    nx) 2-D pack (see channel constants); ``edges`` the shard_map
    neighbor blocks (sed_/ned_ tm/slp/sla/kv/g2d)."""
    nt, km, ny, nx_log = tmix.shape
    nx = p.nx
    f32 = jnp.float32
    if edges is None:
        edges = {}
    e = {}
    for pre in ("sed", "ned"):
        e[pre + "_tm"] = edges.get(pre + "_tm",
                                   jnp.zeros((nt, km, 8, nx_log), f32))
        e[pre + "_slp"] = edges.get(pre + "_slp",
                                    jnp.zeros((8, km, 8, nx_log), f32))
        e[pre + "_sla"] = edges.get(pre + "_sla",
                                    jnp.zeros((2, km, 8, nx_log), f32))
        e[pre + "_kv"] = edges.get(pre + "_kv",
                                   jnp.zeros((km, 8, nx_log), f32))
        e[pre + "_g2d"] = edges.get(pre + "_g2d",
                                    jnp.zeros((_N2D, 8, nx_log), f32))
    if nx != nx_log:
        pad = functools.partial(_lane_pad, ew=p.ew)
        tmix, slp, sla, kv, g2d = (pad(a) for a in
                                   (tmix, slp, sla, kv, g2d))
        e = {k: pad(v) for k, v in e.items()}
    by = p.by
    ntiles = ny // by
    ext = by + 16

    out_shape = [jax.ShapeDtypeStruct((nt, km, ny, nx), f32),
                 jax.ShapeDtypeStruct((km, ny, nx), f32),
                 jax.ShapeDtypeStruct((3 if p.want_diags else 1, km, ny,
                                       nx), f32)]
    scratch = [
        pltpu.VMEM((nt, km, ext, nx), f32),       # etm
        pltpu.VMEM((8, km, ext, nx), f32),        # eslp
        pltpu.VMEM((2, km, ext, nx), f32),        # esla
        pltpu.VMEM((km, ext, nx), f32),           # ekv
        pltpu.VMEM((_N2D, ext, nx), f32),         # eg2d
        pltpu.VMEM((nt, km, by, nx), f32),        # ogtk
        pltpu.VMEM((km, by, nx), f32),            # ovdc
        pltpu.VMEM((3 if p.want_diags else 1, km, by, nx), f32),  # odiag
        pltpu.SemaphoreType.DMA((18,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 15,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        scratch_shapes=scratch,
    )
    gtk, vdc, diags = pl.pallas_call(
        functools.partial(_kernel, p),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024),
    )(lev, tmix.astype(f32), slp.astype(f32), sla.astype(f32),
      kv.astype(f32), g2d.astype(f32),
      e["sed_tm"].astype(f32), e["sed_slp"].astype(f32),
      e["sed_sla"].astype(f32), e["sed_kv"].astype(f32),
      e["sed_g2d"].astype(f32),
      e["ned_tm"].astype(f32), e["ned_slp"].astype(f32),
      e["ned_sla"].astype(f32), e["ned_kv"].astype(f32),
      e["ned_g2d"].astype(f32))
    if nx != nx_log:
        gtk, vdc, diags = (a[..., :nx_log] for a in (gtk, vdc, diags))
    return gtk, vdc, diags


# ---------------------------------------------------------------------------
# model-facing wrapper
# ---------------------------------------------------------------------------

def available(cfg, grid) -> bool:
    """The fused GM chain applies on the production menu: transition
    layer on, isotropic const/bfre kappa, MWJF EOS, full cells,
    closed/cyclic E-W, closed/tripole N-S, float32 on TPU; single chip
    or y-sharded dispatch meshes."""
    from pop2_tpu import gm_slope_pallas
    from pop2_tpu.tracer_pallas import _mesh_y_only
    mesh = _mesh_y_only()
    if mesh is None:
        return False
    ny_loc = cfg.ny if mesh == "none" else cfg.ny // mesh.shape["y"]
    ok = (cfg.gm_transition_layer
          and cfg.gm_aniso is None
          and cfg.gm_kappa_isop_type == cfg.gm_kappa_thic_type
          and cfg.gm_kappa_isop_type in ("const", "bfre")
          and _pick_by(cfg.nt, cfg.km, ny_loc, -(-cfg.nx // 128) * 128,
                       True) is not None
          and gm_slope_pallas.available(cfg, grid))
    if not ok:
        return False
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    return (jnp.dtype(cfg.jnp_dtype) == jnp.float32
            and jax.default_backend() == "tpu")


def _g2d_pack(cfg, grid, tlt, sm2d):
    """(N2D, ny, nx) float32 2-D operand pack."""
    km = cfg.km
    f32 = jnp.float32
    dz = np.asarray(grid.vgrid.dz, np.float64).ravel()
    dzwr = np.asarray(grid.vgrid.dzwr, np.float64).ravel()[1:km + 1]
    klev = tlt.k_level.astype(f32)
    k0 = jnp.clip(tlt.k_level - 1, 0, km - 1)
    k0p = jnp.clip(tlt.k_level, 0, km - 1)
    k0pp = jnp.clip(tlt.k_level + 1, 0, km - 1)
    dzj = jnp.asarray(dz, f32)
    dzwrj = jnp.asarray(dzwr, f32)
    chans = [
        grid.KMT.astype(f32),
        (grid.HTE / grid.HUS).astype(f32),
        (grid.HTN / grid.HUW).astype(f32),
        grid.TAREA_R.astype(f32),
        tlt.diabatic_depth.astype(f32),
        tlt.thickness.astype(f32),
        tlt.interior_depth.astype(f32),
        klev,
        tlt.ztw.astype(f32),
        dzj[k0], dzj[k0p], dzj[k0pp],
        dzwrj[k0], dzwrj[k0p],
    ]
    if sm2d is None:
        z = jnp.zeros_like(klev)
        chans += [z, z, z, z, jnp.ones_like(klev)]
    else:
        chans += list(sm2d)
    return jnp.stack(chans)


def _submeso_amps(cfg, grid, bc, ts_range, tmix, hmxl):
    """2-D streamfunction amplitudes (sm_ax_e, sm_ax_w, sm_ay_n,
    sm_ay_s, ml) such that SF_SUBM = amp * mu(z) per quarter cell
    (submeso.streamfunction, mix_submeso.F90:341-772, with the vertical
    shape mu applied in-kernel)."""
    from pop2_tpu import constants as const
    from pop2_tpu import gm as gm_mod
    km = cfg.km
    zw = np.asarray(grid.vgrid.zw)
    zt = np.asarray(grid.vgrid.zt)
    dzw = np.asarray(grid.vgrid.dzw)
    ocean = grid.KMT > 0
    ml = hmxl if hmxl is not None else jnp.full_like(grid.HT, zw[0])
    ml = jnp.where(ocean, jnp.maximum(ml, zw[0]), zw[0])

    # only the T/S density diffs are needed here: slicing to two
    # tracers skips nt-2 wasted tx/ty/tz face-difference fields
    _, _, _, rx, ry, rz_ktp_raw, _ = gm_mod.face_density_diffs(
        cfg, grid, bc, ts_range, tmix[:2])
    rz_save = jnp.minimum(rz_ktp_raw, 0.0)

    from pop2_tpu.submeso import _ml_layer_weights
    w = _ml_layer_weights(grid, ml)
    bx = -const.GRAV * jnp.sum(rx * w[None], axis=1) / ml[None]
    by = -const.GRAV * jnp.sum(ry * w[None], axis=1) / ml[None]
    bx = jnp.where(ocean[None], bx, 0.0)
    by = jnp.where(ocean[None], by, 0.0)

    ts = 1.0 / jnp.sqrt(grid.FCORT ** 2 + 1.0 / cfg.submeso_timescale ** 2)

    if cfg.submeso_const_hls:
        hls = jnp.where(ocean, cfg.submeso_hor_length_scale, 0.0)
    else:
        w1 = jnp.sqrt(0.5 * ((bx[0] ** 2 + bx[1] ** 2) / grid.DXT ** 2
                             + (by[0] ** 2 + by[1] ** 2) / grid.DYT ** 2))
        w1 = w1 * ml * ts ** 2
        ztk = zt[1:, None, None]
        ztkm1 = zt[:-1, None, None]
        dzwk = dzw[1:km, None, None]
        full = ml[None] > ztk
        partial = (ml[None] <= ztk) & (ml[None] >= ztkm1)
        w3 = jnp.where(full, dzwk,
                       jnp.where(partial,
                                 (ml[None] - ztkm1) ** 2 / dzwk, 0.0))
        w2 = jnp.sum(jnp.sqrt(jnp.maximum(-rz_save[1:] * w3, 0.0)), axis=0)
        w2 = jnp.sqrt(const.GRAV) * w2 * ts
        hls = jnp.where(ocean,
                        jnp.maximum(jnp.maximum(w1, w2),
                                    cfg.submeso_hor_length_scale), 0.0)

    hls_safe = jnp.where(hls > 0.0, hls, 1.0)
    amp = cfg.submeso_efficiency * ml ** 2 * ts / hls_safe
    amp = jnp.where(ocean, amp, 0.0)
    cdx = jnp.minimum(grid.DXT, cfg.submeso_max_grid_scale)
    cdy = jnp.minimum(grid.DYT, cfg.submeso_max_grid_scale)
    return (amp * bx[0] * cdx, amp * bx[1] * cdx,
            amp * by[0] * cdy, amp * by[1] * cdy, ml)


def hdifft_chain(cfg, grid, bc, ts_range, tmix, hblt=None, hmxl=None,
                 want_diags=True):
    """Full fused GM(+submeso) tendency: slope kernel -> jnp transition-
    layer search + bfre profile (2-D/column scans) -> chain kernel.
    Returns (GMOut, submeso_included)."""
    from pop2_tpu import gm as gm_mod
    from pop2_tpu import gm_slope_pallas
    from pop2_tpu.tracer_pallas import _mesh_y_only
    f32 = jnp.float32
    km = cfg.km
    tmix = tmix.astype(f32)
    with_sm = bool(cfg.lsubmeso)

    # ---- slopes (fused kernel, incl. tripole patch) -----------------------
    slp, sla, n2 = gm_slope_pallas.slopes_raw(cfg, grid, bc, ts_range,
                                              tmix)

    # ---- transition-layer search + bfre profile (jnp scans) ---------------
    if hblt is not None:
        from pop2_tpu import kpp as kpp_mod
        dd, _ = kpp_mod.smooth_hblt(cfg, grid, bc, hblt)
    else:
        dd = jnp.full_like(grid.FCORT,
                           float(np.asarray(grid.vgrid.zw)[0]))
    tlt = gm_mod.transition_layer(cfg, grid, dd, sla,
                                  gm_mod._rossby_radius(grid))

    if cfg.gm_kappa_isop_type == "bfre":
        kv = gm_mod.kappa_vertical_bfre(cfg, grid, ts_range, tmix,
                                        tlt.interior_depth, n2=n2)
        kv_bfre = True
    else:
        kv = jnp.ones((km,) + grid.FCORT.shape, f32)
        kv_bfre = False

    sm2d = (_submeso_amps(cfg, grid, bc, ts_range, tmix, hmxl)
            if with_sm else None)
    g2d = _g2d_pack(cfg, grid, tlt, sm2d)
    lev = jnp.asarray(_level_scalars(cfg, grid))

    mesh = _mesh_y_only()
    ny_loc = cfg.ny if mesh == "none" else cfg.ny // mesh.shape["y"]
    nx_pad = -(-cfg.nx // 128) * 128
    p = ChainParams(
        nt=cfg.nt, km=km, by=_pick_by(cfg.nt, km, ny_loc, nx_pad, True),
        nx=nx_pad, ew=cfg.ew_boundary, s_edge="closed", n_edge="closed",
        kv_bfre=kv_bfre, with_sm=with_sm, want_diags=want_diags,
        slm_r=cfg.gm_slm_r, slm_b=cfg.gm_slm_b, ah=cfg.gm_ah,
        ah_bolus=cfg.gm_ah_bolus, isop_deep=cfg.gm_kappa_isop_deep,
        thic_deep=cfg.gm_kappa_thic_deep, ah_srfbl=cfg.gm_ah_bkg_srfbl,
        hd_const=cfg.gm_use_const_ah_bkg_srfbl,
        ah_bottom=cfg.gm_ah_bkg_bottom)

    if mesh == "none":
        gtk, vdc, diags = chain_tiles(p, lev, tmix, slp, sla, kv, g2d,
                                      interpret=force_interpret)
    else:
        gtk, vdc, diags = _chain_sharded(p, mesh, lev, tmix, slp, sla,
                                         kv, g2d)

    if cfg.ns_boundary == "tripole":
        # recompute the global top row from an 8-row full-width jnp slab
        rows = 8
        from pop2_tpu.gm_slope_pallas import _slice_grid
        sgrid = _slice_grid(cfg, grid, rows)
        cut2 = lambda a: a[..., -rows:, :] if a is not None else None  # noqa
        out_s = gm_mod.hdifft_gm(cfg, sgrid, bc, ts_range,
                                 cut2(tmix), hblt=cut2(hblt),
                                 use_kernels=False)
        top = out_s.gtk[..., -1:, :]
        if with_sm:
            from pop2_tpu import submeso as submeso_mod
            gtk_sm, _ = submeso_mod.submeso_tendency(
                cfg, sgrid, bc, ts_range, cut2(tmix), hmxl=cut2(hmxl))
            top = top + gtk_sm[..., -1:, :]
        gtk = gtk.at[..., -1:, :].set(top.astype(gtk.dtype))

    out = gm_mod.GMOut(
        gtk=gtk, vdc_gm=vdc,
        kappa_isop=diags[0] if want_diags else None,
        kappa_thic=diags[1] if want_diags else None,
        hor_diff=diags[2] if want_diags else None,
        dia_depth=tlt.diabatic_depth, tlt_thick=tlt.thickness,
        int_depth=tlt.interior_depth)
    return out, with_sm


def _chain_sharded(p, mesh, lev, tmix, slp, sla, kv, g2d):
    """shard_map front-end: 8-row neighbor edge blocks via ppermute
    (gm_slope_pallas._slopes_sharded pattern)."""
    from jax.sharding import PartitionSpec as P
    py = mesh.shape["y"]
    p_loc = p._replace(s_edge="data", n_edge="data")

    def body(tmix, slp, sla, kv, g2d):
        up = [(i, i + 1) for i in range(py - 1)]
        dn = [(i + 1, i) for i in range(py - 1)]

        def from_south(x):
            return jax.lax.ppermute(x[..., -8:, :], "y", up)

        def from_north(x):
            return jax.lax.ppermute(x[..., :8, :], "y", dn)

        edges = {}
        for name, arr in (("tm", tmix), ("slp", slp), ("sla", sla),
                          ("kv", kv), ("g2d", g2d)):
            edges["sed_" + name] = from_south(arr)
            edges["ned_" + name] = from_north(arr)
        return chain_tiles(p_loc, lev, tmix, slp, sla, kv, g2d,
                           edges=edges, interpret=force_interpret)

    yx = ("y", "x")
    p3 = P(None, *yx)
    p4 = P(None, None, *yx)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(p4, p4, p4, p3, p3),
        out_specs=(p4, p3, p4),
        check_vma=False,
    )(tmix, slp, sla, kv, g2d)
