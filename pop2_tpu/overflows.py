"""Overflow (marginal-sea outflow) parameterization.

Reference: ``source/overflows.F90`` — the Briegleb, Danabasoglu & Large
(2010) scheme: regional averages over inflow/source/entrainment regions
(ovf_reg_avgs :3558-3747), the source/entrainment transport law
(ovf_transports :3754-4182):

    g'_s = g (rho_s - rho_i)/rho_sw,   M_s = g'_s h_u^2 / (2 f)
    g'_e = g (rho_sed - rho_e)/rho_sw, U_geo = g'_e alpha / f
    h_geo from  (f W/2) h^2 + (f W h_s/2 + 2 c_d U_avg x_se
                 - M_s f/(2 U_geo)) h - f M_s h_s/(2 U_geo) = 0
    F_geo = U_geo / sqrt(g'_e h_geo),  phi = 1 - F_geo^(-2/3)
    M_e = M_s phi/(1-phi),  M_p = M_s + M_e,
    T_p = (1-phi) T_s + phi T_e  (same for every tracer)

and product-water insertion at the product region.

TPU-first reduction: instead of the reference's point-to-point moves,
modified continuity/momentum RHS and solver changes (ovf_UV, ovf_solvers,
~3000 lines of MPI plumbing), the overflow enters as a conservative
closed-circuit tracer exchange: product cells are relaxed toward the
product mixture at rate M_p/V_p while source/entrainment cells receive the
implied return flow — globally tracer-conserving by construction and fully
fused (a handful of masked reductions per overflow). Regions are static
config boxes (the reference reads them from ``overflows_infile``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import eos
from pop2_tpu.config import ModelConfig, OverflowSpec, RegionBox
from pop2_tpu.grid import Grid, pressure_bars, thickness_t


class OverflowStatics(NamedTuple):
    masks: jnp.ndarray      # (n_ovf, 4 regions, km, ny, nx) {0,1}
    volumes: jnp.ndarray    # (n_ovf, 4)
    press_s: jnp.ndarray    # (n_ovf,) pressure at source depth (bars)
    press_e: jnp.ndarray    # (n_ovf,)
    fs: jnp.ndarray         # (n_ovf,) coriolis parameter
    params: jnp.ndarray     # (n_ovf, 6) Ws, hu, xse, alpha, cd, hs
    fmask: jnp.ndarray      # (n_ovf, 4, ny, nx) column footprints {0,1}
    areas: jnp.ndarray      # (n_ovf, 4) footprint areas (cm^2)


REG_INF, REG_SRC, REG_ENT, REG_PRD = 0, 1, 2, 3


def build_statics(cfg: ModelConfig, grid: Grid) -> OverflowStatics:
    n = len(cfg.overflows)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    masks = np.zeros((n, 4, km, ny, nx))
    kmask = np.asarray(grid.kmask_t)
    vol3 = (np.asarray(thickness_t(cfg, grid))
            * np.asarray(grid.TAREA)[None]) * kmask
    zt = np.asarray(grid.vgrid.zt)
    press_s = np.zeros(n)
    press_e = np.zeros(n)
    fs = np.zeros(n)
    params = np.zeros((n, 6))
    volumes = np.zeros((n, 4))
    for o, spec in enumerate(cfg.overflows):
        for r, box in enumerate((spec.inf, spec.src, spec.ent, spec.prd)):
            m = np.zeros((km, ny, nx))
            m[box.kmin:box.kmax + 1, box.jmin:box.jmax + 1,
              box.imin:box.imax + 1] = 1.0
            m *= kmask
            masks[o, r] = m
            volumes[o, r] = (m * vol3).sum()
            if volumes[o, r] <= 0.0:
                raise ValueError(
                    f"overflow {spec.name}: region {r} has no ocean cells")
        press_s[o] = pressure_bars(zt[cfg.overflows[o].src.kmin]
                                   * const.MPERCM)
        press_e[o] = pressure_bars(zt[cfg.overflows[o].ent.kmin]
                                   * const.MPERCM)
        fs[o] = 2.0 * const.OMEGA * np.sin(np.deg2rad(spec.lat))
        params[o] = (spec.width, spec.source_thick, spec.distnc_str_ssb,
                     spec.bottom_slope, spec.bottom_drag,
                     spec.source_thick * 2.0 / 3.0)
    dt = cfg.jnp_dtype
    fmask = (masks.max(axis=2) > 0).astype(float)       # (n, 4, ny, nx)
    areas = (fmask * np.asarray(grid.TAREA)[None, None]).sum(axis=(2, 3))
    return OverflowStatics(
        masks=jnp.asarray(masks, dt), volumes=jnp.asarray(volumes, dt),
        press_s=jnp.asarray(press_s, dt), press_e=jnp.asarray(press_e, dt),
        fs=jnp.asarray(fs, dt), params=jnp.asarray(params, dt),
        fmask=jnp.asarray(fmask, dt), areas=jnp.asarray(areas, dt))


def transports(cfg: ModelConfig, grid: Grid, st: OverflowStatics, tracer):
    """Regional averages and (Ms, Me, Mp, phi, tracer averages) for every
    overflow (ovf_reg_avgs + ovf_transports). tracer: (nt, km, ny, nx).
    Returns (ms, me, mp, phi, tavg) with tavg (n_ovf, 4, nt)."""
    vol3 = thickness_t(cfg, grid) * grid.TAREA[None]
    vol3 = jnp.where(grid.kmask_t, vol3, 0.0)
    # (n, 4, nt): masked volume-weighted tracer means per region
    wsum = jnp.einsum("orkji,kji,nkji->orn", st.masks, vol3, tracer)
    tavg = wsum / st.volumes[:, :, None]

    t_i, s_i = tavg[:, REG_INF, 0], tavg[:, REG_INF, 1]
    t_s, s_s = tavg[:, REG_SRC, 0], tavg[:, REG_SRC, 1]
    t_e, s_e = tavg[:, REG_ENT, 0], tavg[:, REG_ENT, 1]

    rho_i = eos.state_at_level(cfg, st.press_s, t_i, s_i)
    rho_s = eos.state_at_level(cfg, st.press_s, t_s, s_s)
    rho_sed = eos.state_at_level(cfg, st.press_e, t_s, s_s)
    rho_e = eos.state_at_level(cfg, st.press_e, t_e, s_e)

    ws, hu, xse, alpha, cd, hs = [st.params[:, i] for i in range(6)]
    f = st.fs
    gp_s = const.GRAV * (rho_s - rho_i) / const.RHO_SW
    ms = jnp.where(gp_s > 0.0, gp_s * hu * hu / (2.0 * f), 0.0)
    us = ms / (hs * ws)
    gp_e = const.GRAV * (rho_sed - rho_e) / const.RHO_SW
    gp_e_safe = jnp.where(gp_e > 0.0, gp_e, 1.0)
    ugeo = gp_e_safe * alpha / f
    uavg = 0.5 * (us + ugeo)
    a = f * ws / 2.0
    b = (f * ws * hs / 2.0 + 2.0 * cd * uavg * xse
         - ms * f / (2.0 * ugeo))
    c = -f * ms * hs / (2.0 * ugeo)
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    hgeo = jnp.maximum((-b + jnp.sqrt(disc)) / (2.0 * a), 1.0e-10)
    fgeo = ugeo / jnp.sqrt(gp_e_safe * hgeo)
    phi = jnp.where((gp_e > 0.0) & (ms > 0.0),
                    1.0 - jnp.maximum(fgeo, 1.0e-10) ** (-2.0 / 3.0), 0.0)
    phi = jnp.clip(phi, 0.0, 0.999)
    me = jnp.where(phi > 0.0, ms * phi / (1.0 - phi), 0.0)
    mp = ms + me
    return ms, me, mp, phi, tavg


def tendency(cfg: ModelConfig, grid: Grid, st: OverflowStatics, tracer,
             trans=None):
    """Conservative closed-circuit overflow tracer tendency
    (nt, km, ny, nx): product cells are relaxed toward the source/
    entrainment mixture at rate M_p/V_p; source and entrainment cells
    receive the implied return flow at M_s/V_s and M_e/V_e.

    ``trans``: optionally the precomputed ``transports(...)`` tuple (shared
    with the barotropic injection, one evaluation per step)."""
    ms, me, mp, phi, tavg = (trans if trans is not None
                             else transports(cfg, grid, st, tracer))
    t_src = tavg[:, REG_SRC]       # (n, nt)
    t_ent = tavg[:, REG_ENT]
    t_prd = tavg[:, REG_PRD]
    t_mix = (1.0 - phi)[:, None] * t_src + phi[:, None] * t_ent

    r_src = (ms / st.volumes[:, REG_SRC])[:, None] * (t_prd - t_src)
    r_ent = (me / st.volumes[:, REG_ENT])[:, None] * (t_prd - t_ent)
    r_prd = (mp / st.volumes[:, REG_PRD])[:, None] * (t_mix - t_prd)

    # (n, nt) per-region rates broadcast onto the masks, summed over n
    out = (jnp.einsum("on,okji->nkji", r_src, st.masks[:, REG_SRC])
           + jnp.einsum("on,okji->nkji", r_ent, st.masks[:, REG_ENT])
           + jnp.einsum("on,okji->nkji", r_prd, st.masks[:, REG_PRD]))
    return out


def qsurf(cfg: ModelConfig, grid: Grid, st: OverflowStatics, trans):
    """Vertically-integrated prescribed overflow transports as an equivalent
    surface volume-flux field (cm/s, positive into the column).

    This is the TPU-native re-expression of the reference's barotropic
    continuity RHS injection (ovf_rhs_brtrpc_continuity + the prescribed
    sidewall transports of ovf_UV_solution, source/overflows.F90:5068-5120,
    :5381, :5884): the product-water transport M_p arrives in the product
    columns while M_s + M_e leaves the source/entrainment columns, so the
    column-integrated continuity — and through it the implicit free-surface
    solve and the barotropic circulation between the basins — sees the
    overflow. Globally sum(q * TAREA) = M_p - M_s - M_e = 0, preserving the
    solvability of the elliptic problem. Point-to-point sidewall momentum
    sources need per-point orientation data from ``overflows_infile`` and
    are not represented for config-box regions.
    """
    ms, me, mp, _, _ = trans
    q = (jnp.einsum("o,oji->ji", mp / st.areas[:, REG_PRD],
                    st.fmask[:, REG_PRD])
         - jnp.einsum("o,oji->ji", ms / st.areas[:, REG_SRC],
                      st.fmask[:, REG_SRC])
         - jnp.einsum("o,oji->ji", me / st.areas[:, REG_ENT],
                      st.fmask[:, REG_ENT]))
    return q
