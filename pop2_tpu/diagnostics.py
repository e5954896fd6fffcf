"""Runtime scalar diagnostics, CFL monitors, transports, BSF and MOC.

Reference: ``source/diagnostics.F90`` (global means/tendencies
``diag_global_*`` :1174, printed table ``diag_print`` :1777, section
transports ``diag_transport`` :2010, CFL monitors :2262-2837, ``check_KE``
blow-up guard :3260, ``diag_velocity`` :2774), ``source/diag_bsf.F90``
(barotropic streamfunction) and ``source/diags_on_lat_aux_grid.F90``
(meridional overturning / heat transport on an auxiliary latitude grid).

All reductions are single fused jitted passes; the host only formats.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid
from pop2_tpu.state import State
from pop2_tpu.stencil import BC


def global_diagnostics(cfg: ModelConfig, grid: Grid, state: State,
                       prev: Optional[State] = None) -> Dict[str, float]:
    """Volume-weighted global means and rates of change
    (diag_global_preupdate/afterupdate, source/diagnostics.F90:1174-1770)."""
    g = grid
    dz = jnp.reshape(g.vgrid.dz, (-1, 1, 1))
    wt_u = jnp.where(g.kmask_u, dz * g.UAREA, 0.0)
    wt_t = jnp.where(g.kmask_t, dz * g.TAREA, 0.0)
    uvol = jnp.sum(wt_u)
    tvol = jnp.sum(wt_t)

    ke = 0.5 * jnp.sum(wt_u * (state.u_cur ** 2 + state.v_cur ** 2)) / uvol
    tmean = jnp.sum(wt_t * state.tracer_cur[0]) / tvol
    smean = jnp.sum(wt_t * state.tracer_cur[1]) / tvol
    out = {
        "KE": float(ke),
        "TEMP_mean": float(tmean),
        "SALT_mean_psu": float(smean) * const.SALT_TO_PPT,
        "SSH_rms_cm": float(jnp.sqrt(
            jnp.sum((state.psurf_cur / const.GRAV) ** 2 * g.RCALCT * g.TAREA)
            / jnp.sum(g.RCALCT * g.TAREA))),
        "UVEL_max": float(jnp.abs(state.u_cur).max()),
        "WVEL_like_divmax": float(jnp.abs(state.psurf_cur).max()
                                  / const.GRAV),
    }
    if prev is not None:
        dt = cfg.time.dtt
        out["dTEMP_dt_per_day"] = (
            float(jnp.sum(wt_t * (state.tracer_cur[0]
                                  - prev.tracer_cur[0])) / tvol)
            / dt * 86400.0)
    return out


def cfl_numbers(cfg: ModelConfig, grid: Grid, state: State
                ) -> Dict[str, float]:
    """Maximum advective / diffusive CFL numbers
    (cfl_advect :2262, cfl_vdiff :2500, cfl_hdiff :2700,
    cfl_check :2837)."""
    dt = cfg.time.dtt
    u, v = state.u_cur, state.v_cur
    cfl_x = jnp.abs(u) * dt * grid.DXUR
    cfl_y = jnp.abs(v) * dt * grid.DYUR
    out = {
        "cfl_advect_x": float(cfl_x.max()),
        "cfl_advect_y": float(cfl_y.max()),
    }
    if cfg.hmix_momentum == "del2":
        hd = 4.0 * cfg.auto_am * (grid.DXUR ** 2 + grid.DYUR ** 2) * dt
        out["cfl_hdiff"] = float(jnp.where(grid.kmask_u[0], hd, 0.0).max())
    elif cfg.hmix_momentum == "del4":
        hd = (16.0 * abs(cfg.am4)
              * (grid.DXUR ** 2 + grid.DYUR ** 2) ** 2 * dt)
        out["cfl_hdiff"] = float(jnp.where(grid.kmask_u[0], hd, 0.0).max())
    return out


def check_ke(cfg: ModelConfig, grid: Grid, state: State,
             ke_limit: float = 100.0) -> float:
    """Blow-up guard (source/diagnostics.F90:3260); raises on violation."""
    ke = global_diagnostics(cfg, grid, state)["KE"]
    if not np.isfinite(ke) or ke > ke_limit:
        raise FloatingPointError(
            f"KE blow-up: KE={ke} exceeds {ke_limit} cm^2/s^2")
    return ke


def zonal_transport(cfg: ModelConfig, grid: Grid, state: State,
                    i_index: int) -> float:
    """Volume transport (Sv) through the meridional section at x-index i
    (diag_transport, source/diagnostics.F90:2010-2260 simplified to full
    meridional sections)."""
    dz = jnp.reshape(grid.vgrid.dz, (-1, 1))
    u = state.u_cur[:, :, i_index]
    hte_like = grid.DYU[:, i_index]
    mask = grid.kmask_u[:, :, i_index]
    tr = jnp.sum(jnp.where(mask, u * dz * hte_like[None, :], 0.0))
    return float(tr) * 1.0e-12  # cm^3/s -> Sv


def section_transport(cfg: ModelConfig, grid: Grid, state: State,
                      section) -> tuple:
    """Volume/heat/salt transport through one named section
    (diag_transport, source/diagnostics.F90:2010-2255), driven by the
    reference's per-grid ``*_transport_contents`` files
    (io/input_templates.read_transport_contents).

    ``section``: a TransportSection (0-based inclusive bounds + 'zonal' /
    'merid'). Returns (mass_Sv, heat_PW, salt_Svppt) floats.

    The B-grid face transports follow :2124-2155: through the east face
    of T-cell (i,j), MASS = 0.5*(U(i,j)DYU(i,j) + U(i,j-1)DYU(i,j-1))*dzu
    with the tracer face average 0.5*(T(i+1,j)+T(i,j)); through the north
    face, the (i-1, j+1) analogues."""
    from pop2_tpu.grid import thickness_u
    k0, k1 = section.kmin, section.kmax
    j0, j1 = section.jmin, section.jmax
    i0, i1 = section.imin, section.imax
    dzu = thickness_u(cfg, grid)                      # (km, ny, nx)
    T, S = state.tracer_cur[0], state.tracer_cur[1]

    if section.orient.startswith("merid"):
        # zonal (U) transport through a meridional section (MASS_M)
        uh = jnp.where(grid.kmask_u, state.u_cur * grid.DYU[None] * dzu,
                       0.0)
        mass = 0.5 * (uh[:, j0:j1 + 1, i0:i1 + 1]
                      + uh[:, j0 - 1:j1, i0:i1 + 1])
        tf = 0.5 * (T[:, j0:j1 + 1, i0 + 1:i1 + 2]
                    + T[:, j0:j1 + 1, i0:i1 + 1])
        sf = 0.5 * (S[:, j0:j1 + 1, i0 + 1:i1 + 2]
                    + S[:, j0:j1 + 1, i0:i1 + 1])
    else:
        # meridional (V) transport through a zonal section (MASS_Z)
        vh = jnp.where(grid.kmask_u, state.v_cur * grid.DXU[None] * dzu,
                       0.0)
        mass = 0.5 * (vh[:, j0:j1 + 1, i0:i1 + 1]
                      + vh[:, j0:j1 + 1, i0 - 1:i1])
        tf = 0.5 * (T[:, j0 + 1:j1 + 2, i0:i1 + 1]
                    + T[:, j0:j1 + 1, i0:i1 + 1])
        sf = 0.5 * (S[:, j0 + 1:j1 + 2, i0:i1 + 1]
                    + S[:, j0:j1 + 1, i0:i1 + 1])
    mass = mass[k0:k1 + 1]
    heat = (mass * tf[k0:k1 + 1]).sum()
    salt = (mass * sf[k0:k1 + 1]).sum()
    mass = mass.sum()
    return (float(mass) * const.MASS_TO_SV,
            float(heat) * const.HEAT_TO_PW,
            float(salt) * const.SALT_TO_SVPPT)


def barotropic_streamfunction(cfg: ModelConfig, grid: Grid,
                              state: State) -> jnp.ndarray:
    """Barotropic streamfunction psi (Sv) by meridional integration of the
    vertically-integrated zonal transport (diagnostic analogue of
    source/diag_bsf.F90 without the elliptic inversion):
    psi(i,j) = -sum_{j'<=j} U_btrop*HU*DYU."""
    uh = grid.HU * state.ubtrop_cur * grid.DYU * grid.RCALCU
    psi = -jnp.cumsum(uh, axis=0)
    return psi * 1.0e-12


def moc_streamfunction(cfg: ModelConfig, grid: Grid, state: State,
                       nlat_bins: int = 36):
    """Meridional overturning circulation on an auxiliary latitude grid
    (diags_on_lat_aux_grid.F90): zonally/latitudinally binned northward
    transport, cumulated from the bottom. Returns (lat_edges_deg,
    moc[km, nbins]) in Sv."""
    dz = jnp.reshape(grid.vgrid.dz, (-1, 1, 1))
    vdx = jnp.where(grid.kmask_u, state.v_cur * grid.DXU * dz, 0.0)
    lat = grid.ULAT * const.RADIAN
    edges = jnp.linspace(-90.0, 90.0, nlat_bins + 1)
    # bin index per column
    idx = jnp.clip(jnp.searchsorted(edges, lat) - 1, 0, nlat_bins - 1)
    one_hot = jax.nn.one_hot(idx, nlat_bins, dtype=vdx.dtype)  # (ny,nx,nb)
    vt = jnp.einsum("kyx,yxb->kb", vdx, one_hot)  # northward transport
    moc = jnp.cumsum(vt[::-1], axis=0)[::-1] * 1.0e-12
    return np.asarray(edges), moc


def meridional_transport(cfg: ModelConfig, grid: Grid, state: State,
                         nlat_bins: int = 36):
    """Northward heat and salt transport on the auxiliary latitude grid
    (diags_on_lat_aux_grid.F90 N_HEAT/N_SALT): zonally binned
    sum of v * T * dz * dx, advective part. Returns
    (lat_edges_deg, heat_pw[nbins], salt_sv_ppt[nbins])."""
    from pop2_tpu.grid import thickness_u
    from pop2_tpu.stencil import BC
    bc = BC(ew=cfg.ew_boundary, ns=cfg.ns_boundary)
    dz = thickness_u(cfg, grid)
    # tracer at the U point's latitude: average the two T rows around the
    # U row (B-grid; the reference interpolates to the aux grid)
    t_u = jnp.stack([
        0.5 * (state.tracer_cur[n]
               + bc.n(state.tracer_cur[n])) for n in range(2)])
    vdx = jnp.where(grid.kmask_u, state.v_cur * grid.DXU * dz, 0.0)
    lat = grid.ULAT * const.RADIAN
    edges = jnp.linspace(-90.0, 90.0, nlat_bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, lat) - 1, 0, nlat_bins - 1)
    one_hot = jax.nn.one_hot(idx, nlat_bins, dtype=vdx.dtype)
    heat = jnp.einsum("kyx,yxb->b", vdx * t_u[0], one_hot)
    salt = jnp.einsum("kyx,yxb->b", vdx * t_u[1], one_hot)
    # heat: degC cm^3/s -> PW via rho cp; salt: msu cm^3/s -> Sv*ppt
    heat_pw = heat * const.RHO_SW * const.CP_SW * 1.0e-22
    salt_svppt = salt * const.SALT_TO_PPT * 1.0e-12
    return np.asarray(edges), heat_pw, salt_svppt


def diag_print(cfg: ModelConfig, grid: Grid, state: State, step: int,
               prev: Optional[State] = None,
               solver_iters: Optional[int] = None) -> str:
    """Formatted per-interval diagnostics table
    (diag_print, source/diagnostics.F90:1777)."""
    d = global_diagnostics(cfg, grid, state, prev)
    c = cfl_numbers(cfg, grid, state)
    lines = [f"Step {step:8d}  global diagnostics:"]
    for k, v in {**d, **c}.items():
        lines.append(f"  {k:<22s} {v: .10e}")
    if solver_iters is not None:
        lines.append(f"  {'solver_iterations':<22s} {solver_iters:d}")
    return "\n".join(lines)
