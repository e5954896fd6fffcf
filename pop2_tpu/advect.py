"""Advection of momentum and tracers.

Reference: ``source/advection.F90`` — flux velocities ``comp_flux_vel``
(:1970), centered tracer advection ``advt_centered`` (:2139), momentum
advection with metric terms ``advu`` (:1127). TPU-first: the reference's
k-sequential carry of the vertical velocity (WTK -> WTKB per level) becomes a
masked ``cumsum`` over the whole column, and all levels/tracers are computed
at once. Schemes: centered, upwind3 (QUICKEST); lw_lim later.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid, thickness_t, thickness_u
from pop2_tpu.stencil import BC


class FluxVel(NamedTuple):
    """Tracer flux velocities across T-cell faces and vertical velocity."""
    ute: jnp.ndarray   # (km, ny, nx) east-face volume flux velocity
    utw: jnp.ndarray
    vtn: jnp.ndarray   # north face
    vts: jnp.ndarray
    wtk: jnp.ndarray   # (km, ny, nx) vertical velocity at TOP of each T box
    wtkb: jnp.ndarray  # (km, ny, nx) vertical velocity at BOTTOM of T box


def comp_flux_vel(cfg: ModelConfig, grid: Grid, bc: BC, uvel, vvel,
                  dh) -> FluxVel:
    """Flux velocities across T-cell faces and w from continuity
    (source/advection.F90:2066-2127), all levels at once.

    The surface boundary condition is w = DH (d(eta)/dt - F_w) for the
    variable-thickness surface layer. For k < KMT,
    WTKB_k = DH + sum_{m<=k} dz_m * FC_m, which equals the reference's
    per-level recurrence because masking can only first apply at k = KMT.
    """
    km = uvel.shape[0]
    dzu = thickness_u(cfg, grid)
    a = uvel * grid.DYU * dzu
    b = vvel * grid.DXU * dzu
    ute = 0.5 * (a + bc.s(a))
    utw = bc.w(ute)
    vtn = 0.5 * (b + bc.w(b))
    vts = bc.s(vtn)

    # fluxes carry the layer thickness (volume fluxes, cm^3/s; the
    # reference's partial-bottom-cell form, advection.F90:2066-2127, which
    # reduces to dz(k) times the uniform-cell form)
    fc = (vtn - vts + ute - utw) * grid.TAREA_R
    wtkb = dh[None] + jnp.cumsum(fc, axis=0)
    below = jnp.concatenate(  # k < KMT
        [grid.kmask_t[1:], jnp.zeros_like(grid.kmask_t[:1])])
    wtkb = jnp.where(below, wtkb, 0.0)
    wtk = jnp.concatenate([jnp.broadcast_to(dh[None], wtkb[:1].shape),
                           wtkb[:-1]], axis=0)
    return FluxVel(ute=ute, utw=utw, vtn=vtn, vts=vts, wtk=wtk, wtkb=wtkb)


def advt_centered(cfg: ModelConfig, grid: Grid, bc: BC, fv: FluxVel, trcr):
    """Centered tracer advection L(T) (source/advection.F90:2139-2306) for
    all tracers and levels: flux-form horizontal + centered vertical.

    trcr: (nt, km, ny, nx) tracers at current time.
    Returns L(T), (nt, km, ny, nx) — the caller subtracts it from FT.
    """
    km = cfg.km
    dzt = thickness_t(cfg, grid)
    ute, vtn = fv.ute[None], fv.vtn[None]
    uts = fv.vts[None]
    utw = fv.utw[None]
    cc = vtn - uts + ute - utw
    ltk = 0.5 * (cc * trcr
                 + vtn * bc.n(trcr) - uts * bc.s(trcr)
                 + ute * bc.e(trcr) - utw * bc.w(trcr)) \
        * grid.TAREA_R / dzt[None]

    # vertical advection (source/advection.F90:2266-2301); for the
    # variable-thickness surface layer there is no advection through the
    # surface at k=1
    dz2r = 0.5 / dzt[None]
    t_km1 = jnp.concatenate([trcr[:, :1], trcr[:, :-1]], axis=1)
    t_kp1 = jnp.concatenate([trcr[:, 1:], trcr[:, -1:]], axis=1)
    top = fv.wtk[None] * (t_km1 + trcr)
    if cfg.sfc_layer != "varthick":
        top = top.at[:, 0].set(2.0 * fv.wtk[0][None] * trcr[:, 0])
    else:
        top = top.at[:, 0].set(0.0)
    bot = fv.wtkb[None] * (trcr + t_kp1)
    bot = bot.at[:, -1].set(0.0)
    ltk = ltk + dz2r * (top - bot)
    return ltk


def advu(cfg: ModelConfig, grid: Grid, bc: BC, uvel, vvel, dhu):
    """Momentum advection L(U), L(V) with metric terms
    (source/advection.F90:1127-1570), all levels at once.

    Returns (luk, lvk), each (km, ny, nx), masked to zero on land.
    """
    km = cfg.km
    dzu = thickness_u(cfg, grid)
    a = uvel * grid.DYU * dzu
    b = vvel * grid.DXU * dzu
    # 4-point averages of T-face fluxes onto U-cell faces, thickness-
    # weighted (the reference's partial-bottom-cell form,
    # source/advection.F90:1245-1339; reduces to dz(k)x the uniform form)
    uuw = (0.25 * (a + bc.w(a))
           + 0.125 * (bc.s(a) + bc.sw(a) + bc.n(a, "necorner", "vector")
                      + bc.nw(a, "necorner", "vector")))
    uue = bc.e(uuw)
    vus = (0.25 * (b + bc.s(b))
           + 0.125 * (bc.w(b) + bc.sw(b) + bc.e(b) + bc.se(b)))
    # vus folds as an E-face vector given the degenerate top-row
    # antisymmetry of b (enforced each step for tripole grids)
    vun = bc.n(vus, "eface", "vector")

    # vertical velocity at U-box bottoms by continuity, integrated from the
    # surface value DHU (source/advection.F90:1345-1357)
    fc = (vun - vus + uue - uuw) * grid.UAREA_R
    wukb = dhu[None] + jnp.cumsum(fc, axis=0)
    wuk = jnp.concatenate([jnp.broadcast_to(dhu[None], wukb[:1].shape),
                           wukb[:-1]], axis=0)

    cc = vun - vus + uue - uuw
    luk = 0.5 * (cc * uvel + vun * bc.n(uvel, "necorner", "vector")
                 - vus * bc.s(uvel)
                 + uue * bc.e(uvel) - uuw * bc.w(uvel)) \
        * grid.UAREA_R / dzu
    lvk = 0.5 * (cc * vvel + vun * bc.n(vvel, "necorner", "vector")
                 - vus * bc.s(vvel)
                 + uue * bc.e(vvel) - uuw * bc.w(vvel)) \
        * grid.UAREA_R / dzu

    # vertical advection through top/bottom of U box
    # (source/advection.F90:1439-1471)
    dzr = 1.0 / dzu
    dz2r = 0.5 / dzu
    u_km1 = jnp.concatenate([uvel[:1], uvel[:-1]], axis=0)
    v_km1 = jnp.concatenate([vvel[:1], vvel[:-1]], axis=0)
    u_kp1 = jnp.concatenate([uvel[1:], uvel[-1:]], axis=0)
    v_kp1 = jnp.concatenate([vvel[1:], vvel[-1:]], axis=0)

    top_u = dz2r * wuk * (u_km1 + uvel)
    top_v = dz2r * wuk * (v_km1 + vvel)
    top_u = top_u.at[0].set(dzr[0] * wuk[0] * uvel[0])
    top_v = top_v.at[0].set(dzr[0] * wuk[0] * vvel[0])
    bot_u = dz2r * wukb * (uvel + u_kp1)
    bot_v = dz2r * wukb * (vvel + v_kp1)
    bot_u = bot_u.at[-1].set(0.0)
    bot_v = bot_v.at[-1].set(0.0)
    luk = luk + top_u - bot_u
    lvk = lvk + top_v - bot_v

    # metric terms (source/advection.F90:1479-1491)
    luk = luk + uvel * vvel * grid.KYU - vvel ** 2 * grid.KXU
    lvk = lvk + uvel * vvel * grid.KXU - uvel ** 2 * grid.KYU

    zero = jnp.zeros_like(luk)
    return (jnp.where(grid.kmask_u, luk, zero),
            jnp.where(grid.kmask_u, lvk, zero))


# ---------------------------------------------------------------------------
# 3rd-order upwind (QUICKEST) tracer advection
# (source/advection.F90:2313-2677; coefficients :420-562)
# ---------------------------------------------------------------------------

def _upwind3_vert_coeffs(dz):
    """Vertical QUICKEST interpolation coefficients
    (source/advection.F90:448-486). Returns 6 arrays of shape (km,)."""
    km = dz.shape[0]
    dzc = jnp.concatenate([dz[:1], dz, dz[-1:]])  # dzc(0..km+1), 1-based fold
    d_k = dz
    d_kp1 = jnp.concatenate([dz[1:], dz[-1:]])
    d_km1 = dzc[:km]          # dzc(k-1)
    d_kp2 = dzc[2:km + 2]     # dzc(k+2)

    talfzp = d_k * (2 * d_k + d_km1) / ((d_k + d_kp1)
                                        * (d_km1 + 2 * d_k + d_kp1))
    tbetzp = d_kp1 * (2 * d_k + d_km1) / ((d_k + d_kp1) * (d_k + d_km1))
    tgamzp = -(d_k * d_kp1) / ((d_k + d_km1) * (d_kp1 + d_km1 + 2 * d_k))
    tbetzp = tbetzp.at[0].add(tgamzp[0])
    tgamzp = tgamzp.at[0].set(0.0)
    talfzp = talfzp.at[km - 1].set(0.0)
    tbetzp = tbetzp.at[km - 1].set(0.0)
    tgamzp = tgamzp.at[km - 1].set(0.0)

    talfzm = d_k * (2 * d_kp1 + d_kp2) / ((d_k + d_kp1) * (d_kp1 + d_kp2))
    tbetzm = d_kp1 * (2 * d_kp1 + d_kp2) / ((d_k + d_kp1)
                                            * (d_k + d_kp2 + 2 * d_kp1))
    tdelzm = -(d_k * d_kp1) / ((d_kp1 + d_kp2) * (d_k + d_kp2 + 2 * d_kp1))
    talfzm = talfzm.at[km - 2].add(tdelzm[km - 2])
    tdelzm = tdelzm.at[km - 2].set(0.0)
    talfzm = talfzm.at[km - 1].set(0.0)
    tbetzm = tbetzm.at[km - 1].set(0.0)
    tdelzm = tdelzm.at[km - 1].set(0.0)
    return talfzp, tbetzp, tgamzp, talfzm, tbetzm, tdelzm


def _upwind3_horiz_coeffs(dc, dw, de, de2):
    """Face interpolation coefficients along one direction
    (source/advection.F90:510-551): dc/dw/de/de2 are the cell widths at
    (i), (i-1), (i+1), (i+2). Widths shifted in across closed boundaries are
    zero; clamp so land-row coefficients stay finite (they are masked out of
    the result anyway)."""
    tiny = 1.0e-20
    dc = jnp.maximum(dc, tiny)
    dw = jnp.maximum(dw, tiny)
    de = jnp.maximum(de, tiny)
    de2 = jnp.maximum(de2, tiny)
    alfp = dc * (2 * dc + dw) / ((dc + de) * (dw + 2 * dc + de))
    betp = de * (2 * dc + dw) / ((dc + dw) * (dc + de))
    gamp = -(dc * de) / ((dc + dw) * (dw + 2 * dc + de))
    alfm = dc * (2 * de + de2) / ((dc + de) * (de + de2))
    betm = de * (2 * de + de2) / ((dc + de) * (dc + 2 * de + de2))
    delm = -(dc * de) / ((de2 + de) * (dc + 2 * de + de2))
    return alfp, betp, gamp, alfm, betm, delm


def advt_upwind3(cfg: ModelConfig, grid: Grid, bc: BC, fv: FluxVel, trcr):
    """3rd-order upwind tracer advection L(T) for all tracers/levels
    (source/advection.F90:2313-2677). Land columns degrade the stencil to
    lower order by folding the missing-point weight into the remaining ones.
    """
    km = cfg.km
    kidx = jax.lax.broadcasted_iota(jnp.int32, (km, 1, 1), 0) + 1

    # -- horizontal: east-face upwind-interpolated tracer -------------------
    alfxp, betxp, gamxp, alfxm, betxm, delxm = _upwind3_horiz_coeffs(
        grid.DXT, bc.w(grid.DXT), bc.e(grid.DXT), bc.e(bc.e(grid.DXT)))
    alfyp, betyp, gamyp, alfym, betym, delym = _upwind3_horiz_coeffs(
        grid.DYT, bc.s(grid.DYT), bc.n(grid.DYT), bc.nn(grid.DYT))

    kmtee = bc.e(bc.e(grid.KMT.astype(jnp.int32)))
    kmtnn = bc.nn(grid.KMT.astype(jnp.int32))

    def faceval(X, c_pos, mask_up1, mask_dn1, mask_up2,
                alfp, betp, gamp, alfm, betm, delm, sh_p1, sh_m1, sh_p2):
        """Upwind-biased face value; X (nt,km,ny,nx), c_pos is the
        positive-flux condition at the face, masks gate stencil width."""
        ap = jnp.where(mask_up1, alfp, 0.0)
        work = jnp.where(mask_up1, betp, betp + alfp)
        bp = jnp.where(mask_dn1, work, work + gamp)
        gp = jnp.where(mask_dn1, gamp, 0.0)
        am = jnp.where(mask_up2, alfm, alfm + delm)
        dm = jnp.where(mask_up2, delm, 0.0)
        bm = betm
        plus = ap * sh_p1(X) + bp * X + gp * sh_m1(X)
        minus = am * sh_p1(X) + bm * X + dm * sh_p2(X)
        return jnp.where(c_pos, plus, minus)

    ce = (fv.ute * grid.TAREA_R)[None]
    cw = (-fv.utw * grid.TAREA_R)[None]
    cn = (fv.vtn * grid.TAREA_R)[None]
    cs = (-fv.vts * grid.TAREA_R)[None]

    mask_e = (kidx <= grid.KMTE[None])[None]
    mask_w = (kidx <= grid.KMTW[None])[None]
    mask_ee = (kidx <= kmtee[None])[None]
    tr_e = faceval(trcr, ce > 0, mask_e, mask_w, mask_ee,
                   alfxp, betxp, gamxp, alfxm, betxm, delxm,
                   bc.e, bc.w, lambda x: bc.e(bc.e(x)))
    mask_n = (kidx <= grid.KMTN[None])[None]
    mask_s = (kidx <= grid.KMTS[None])[None]
    mask_nn = (kidx <= kmtnn[None])[None]
    tr_n = faceval(trcr, cn > 0, mask_n, mask_s, mask_nn,
                   alfyp, betyp, gamyp, alfym, betym, delym,
                   bc.n, bc.s, bc.nn)

    dzt = thickness_t(cfg, grid)
    ltk = (ce * tr_e + cw * bc.w(tr_e)
           + cn * tr_n + cs * bc.s(tr_n)) / dzt[None]

    # -- vertical (source/advection.F90:2402-2476) --------------------------
    talfzp, tbetzp, tgamzp, talfzm, tbetzm, tdelzm = _upwind3_vert_coeffs(
        grid.vgrid.dz)

    def kcol(a):
        return jnp.reshape(a, (1, km, 1, 1))

    interior2 = (kidx < grid.KMT[None] - 1)[None]  # k < KMT-1
    azminus = jnp.where(interior2, kcol(talfzm), kcol(talfzm + tdelzm))
    dzminus = jnp.where(interior2, kcol(tdelzm), 0.0)

    t_kp1 = jnp.concatenate([trcr[:, 1:], trcr[:, -1:]], axis=1)
    t_km1 = jnp.concatenate([trcr[:, :1], trcr[:, :-1]], axis=1)
    t_kp2 = jnp.concatenate([trcr[:, 2:], trcr[:, -1:], trcr[:, -1:]],
                            axis=1)
    tplus = (kcol(talfzp) * t_kp1 + kcol(tbetzp) * trcr
             + kcol(tgamzp) * t_km1)
    tminus = azminus * t_kp1 + kcol(tbetzm) * trcr + dzminus * t_kp2
    wtkb = fv.wtkb[None]
    auxb = (wtkb - jnp.abs(wtkb)) * tplus + (wtkb + jnp.abs(wtkb)) * tminus
    auxb = auxb.at[:, -1].set(0.0)
    aux = jnp.concatenate([jnp.zeros_like(auxb[:, :1]), auxb[:, :-1]],
                          axis=1)

    dz2r = 0.5 / dzt[None]
    vert = dz2r * (aux - auxb)
    if cfg.sfc_layer != "varthick":
        vert = vert.at[:, 0].set(
            fv.wtk[0][None] * trcr[:, 0] / dzt[0]
            - 0.5 * auxb[:, 0] / dzt[0])
    return jnp.where(grid.kmask_t[None], ltk + vert, 0.0)


def advt(cfg: ModelConfig, grid: Grid, bc: BC, fv: FluxVel, trcr):
    """Tracer-advection dispatch (source/advection.F90:1684-1729); the
    reference allows per-tracer schemes, here one scheme for all tracers."""
    if cfg.tadvect == "centered":
        return advt_centered(cfg, grid, bc, fv, trcr)
    if cfg.tadvect == "upwind3":
        return advt_upwind3(cfg, grid, bc, fv, trcr)
    raise NotImplementedError(f"tadvect {cfg.tadvect}")
