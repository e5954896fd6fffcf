"""Advection of momentum and tracers.

Reference: ``source/advection.F90`` — flux velocities ``comp_flux_vel``
(:1970), centered tracer advection ``advt_centered`` (:2139), momentum
advection with metric terms ``advu`` (:1127). TPU-first: the reference's
k-sequential carry of the vertical velocity (WTK -> WTKB per level) becomes a
masked ``cumsum`` over the whole column, and all levels/tracers are computed
at once. upwind3 and lw_lim schemes follow in a later round.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid
from pop2_tpu.stencil import BC


class FluxVel(NamedTuple):
    """Tracer flux velocities across T-cell faces and vertical velocity."""
    ute: jnp.ndarray   # (km, ny, nx) east-face volume flux velocity
    utw: jnp.ndarray
    vtn: jnp.ndarray   # north face
    vts: jnp.ndarray
    wtk: jnp.ndarray   # (km, ny, nx) vertical velocity at TOP of each T box
    wtkb: jnp.ndarray  # (km, ny, nx) vertical velocity at BOTTOM of T box


def comp_flux_vel(grid: Grid, bc: BC, uvel, vvel, dh) -> FluxVel:
    """Flux velocities across T-cell faces and w from continuity
    (source/advection.F90:2066-2127), all levels at once.

    The surface boundary condition is w = DH (d(eta)/dt - F_w) for the
    variable-thickness surface layer. For k < KMT,
    WTKB_k = DH + sum_{m<=k} dz_m * FC_m, which equals the reference's
    per-level recurrence because masking can only first apply at k = KMT.
    """
    km = uvel.shape[0]
    a = uvel * grid.DYU
    b = vvel * grid.DXU
    ute = 0.5 * (a + bc.s(a))
    utw = bc.w(ute)
    vtn = 0.5 * (b + bc.w(b))
    vts = bc.s(vtn)

    fc = (vtn - vts + ute - utw) * grid.TAREA_R
    dz = jnp.reshape(grid.vgrid.dz, (km, 1, 1))
    wtkb = dh[None] + jnp.cumsum(dz * fc, axis=0)
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
    ute, vtn = fv.ute[None], fv.vtn[None]
    uts = fv.vts[None]
    utw = fv.utw[None]
    cc = vtn - uts + ute - utw
    ltk = 0.5 * (cc * trcr
                 + vtn * bc.n(trcr) - uts * bc.s(trcr)
                 + ute * bc.e(trcr) - utw * bc.w(trcr)) * grid.TAREA_R

    # vertical advection (source/advection.F90:2266-2301); for the
    # variable-thickness surface layer there is no advection through the
    # surface at k=1
    dz2r = jnp.reshape(grid.vgrid.dz2r, (1, km, 1, 1))
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
    a = uvel * grid.DYU
    b = vvel * grid.DXU
    # 4-point averages of T-face fluxes onto U-cell faces
    # (source/advection.F90:1307-1339)
    uuw = (0.25 * (a + bc.w(a))
           + 0.125 * (bc.s(a) + bc.sw(a) + bc.n(a) + bc.nw(a)))
    uue = bc.e(uuw)
    vus = (0.25 * (b + bc.s(b))
           + 0.125 * (bc.w(b) + bc.sw(b) + bc.e(b) + bc.se(b)))
    vun = bc.n(vus)

    # vertical velocity at U-box bottoms by continuity, integrated from the
    # surface value DHU (source/advection.F90:1352-1357)
    c2dz = jnp.reshape(grid.vgrid.c2dz, (km, 1, 1))
    fc = 0.5 * (vun - vus + uue - uuw) * grid.UAREA_R
    wukb = dhu[None] + jnp.cumsum(c2dz * fc, axis=0)
    wuk = jnp.concatenate([jnp.broadcast_to(dhu[None], wukb[:1].shape),
                           wukb[:-1]], axis=0)

    cc = vun - vus + uue - uuw
    luk = 0.5 * (cc * uvel + vun * bc.n(uvel) - vus * bc.s(uvel)
                 + uue * bc.e(uvel) - uuw * bc.w(uvel)) * grid.UAREA_R
    lvk = 0.5 * (cc * vvel + vun * bc.n(vvel) - vus * bc.s(vvel)
                 + uue * bc.e(vvel) - uuw * bc.w(vvel)) * grid.UAREA_R

    # vertical advection through top/bottom of U box
    # (source/advection.F90:1439-1471)
    dzr = jnp.reshape(grid.vgrid.dzr, (km, 1, 1))
    dz2r = jnp.reshape(grid.vgrid.dz2r, (km, 1, 1))
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
