"""Barotropic (implicit free-surface) driver.

Reference: ``source/barotropic.F90:267-735`` — builds auxiliary velocities and
the elliptic RHS, solves for the new surface pressure, removes the
checkerboard null space, and reconstructs barotropic velocities and pressure
gradients. Matsuno branches are not rebuilt; the non-leapfrog path is the
Euler-forward first step (mix_pass==1 / f_euler_ts branch of the reference).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from pop2_tpu import solvers
from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.forcing import Forcing
from pop2_tpu.grid import Grid
from pop2_tpu.state import State
from pop2_tpu.stencil import BC, div, grad


class BarotropicOut(NamedTuple):
    psurf_new: jnp.ndarray
    gradpx_new: jnp.ndarray
    gradpy_new: jnp.ndarray
    ubtrop_new: jnp.ndarray
    vbtrop_new: jnp.ndarray
    solver_iters: jnp.ndarray
    solver_rr: jnp.ndarray


def diagonal_correction(cfg: ModelConfig, grid: Grid, leapfrog: bool):
    """Time-dependent diagonal term of the implicit free-surface operator
    (source/barotropic.F90:532-552)."""
    if cfg.sfc_layer == "rigid":
        return jnp.zeros_like(grid.TAREA)
    dtp = cfg.time.dtp
    beta = cfg.time.alpha if leapfrog else cfg.time.theta
    c2dtp = (2.0 if leapfrog else 1.0) * dtp
    return jnp.where(grid.RCALCT > 0,
                     grid.TAREA / (beta * c2dtp * dtp * const.GRAV), 0.0)


def driver(cfg: ModelConfig, grid: Grid, bc: BC, state: State,
           forcing: Forcing, zx, zy, leapfrog: bool,
           pcsi_eigs: Optional[Tuple[float, float]] = None,
           precond=None, ovf_qsurf=None) -> BarotropicOut:
    dtp = cfg.time.dtp
    beta = cfg.time.alpha if leapfrog else cfg.time.theta
    gamma = cfg.time.gamma
    c2dtp = (2.0 if leapfrog else 1.0) * dtp
    varthick = cfg.sfc_layer == "varthick"
    mask_u = grid.kmask_u[0]
    mask_t = grid.kmask_t[0]

    # ---- r.h.s. of barotropic momentum (source/barotropic.F90:420-445) ----
    if leapfrog:
        work3 = c2dtp * (zx - gamma * state.gradpx_cur
                         - (1.0 - gamma) * state.gradpx_old)
        work4 = c2dtp * (zy - gamma * state.gradpy_cur
                         - (1.0 - gamma) * state.gradpy_old)
    else:  # Euler-forward first step
        work3 = c2dtp * (zx - state.gradpx_cur)
        work4 = c2dtp * (zy - state.gradpy_cur)

    # atmospheric pressure forcing (none in round-1 standalone config)

    # ---- auxiliary velocities (source/barotropic.F90:468-482) -------------
    if cfg.time.impcor:
        w1 = c2dtp * beta * grid.FCOR
        w2 = 1.0 / (1.0 + w1 ** 2)
        uh = w2 * (work3 + w1 * work4) + state.ubtrop_old
        vh = w2 * (work4 - w1 * work3) + state.vbtrop_old
    else:
        uh = work3 + state.ubtrop_old
        vh = work4 + state.vbtrop_old

    # ---- elliptic RHS (source/barotropic.F90:490-552) ---------------------
    gpx_ref = state.gradpx_old if leapfrog else state.gradpx_cur
    gpy_ref = state.gradpy_old if leapfrog else state.gradpy_cur
    w3 = grid.HU * (uh + beta * c2dtp * gpx_ref)
    w4 = grid.HU * (vh + beta * c2dtp * gpy_ref)
    rhs = div(w3, w4, grid.DXU, grid.DYU, mask_t, bc) / (beta * c2dtp)

    diag_corr = diagonal_correction(cfg, grid, leapfrog)
    fw_eff = forcing.fw
    if ovf_qsurf is not None:
        # prescribed overflow transports enter the column-integrated
        # continuity like a (globally zero-sum) surface volume flux
        # (ovf_rhs_brtrpc_continuity, source/overflows.F90:5068-5120)
        fw_eff = fw_eff + ovf_qsurf
    if varthick:
        rhs = (rhs - diag_corr * state.psurf_cur
               - fw_eff * grid.TAREA / (beta * c2dtp))
    elif cfg.sfc_layer == "oldfree":
        rhs = rhs - diag_corr * state.psurf_cur

    # ---- solve (source/barotropic.F90:564-598) ----------------------------
    op = solvers.make_operator(grid, diag_corr)
    x0 = state.pguess
    if (cfg.solver.solve_dtype == "float64"
            and cfg.jnp_dtype != jnp.float64):
        # f64-grade solve on an fp32 model: mixed-precision iterative
        # refinement with a compensated residual (solvers.solve_refined)
        # — the production tolerance 1e-13 is below the plain-fp32
        # residual floor, and TPUs have no native f64 datapath (straight
        # dtype promotion is either demoted or runs at emulation speed)
        psurf_new, iters, rr = solvers.solve_refined(
            cfg, op, bc, x0, rhs, eigs=pcsi_eigs, precond=precond)
    else:
        psurf_new, iters, rr = solvers.solve(cfg, op, bc, x0, rhs,
                                             eigs=pcsi_eigs,
                                             precond=precond)

    # ---- checkerboard null-space removal (source/barotropic.F90:606-634) --
    if varthick:
        from pop2_tpu.reductions import global_sum
        xcheck = global_sum(psurf_new * grid.checker, b4b=cfg.b4b)
        psurf_new = (psurf_new + grid.constnt * grid.rcheck * xcheck
                     - grid.checker * grid.rconst * xcheck)

    # ---- new gradients and barotropic velocities --------------------------
    gradpx_new, gradpy_new = grad(psurf_new, grid.DXUR, grid.DYUR, mask_u, bc)
    gpx_base = state.gradpx_old if leapfrog else state.gradpx_cur
    gpy_base = state.gradpy_old if leapfrog else state.gradpy_cur
    ubtrop_new = uh - beta * c2dtp * (gradpx_new - gpx_base)
    vbtrop_new = vh - beta * c2dtp * (gradpy_new - gpy_base)

    return BarotropicOut(psurf_new=psurf_new, gradpx_new=gradpx_new,
                         gradpy_new=gradpy_new, ubtrop_new=ubtrop_new,
                         vbtrop_new=vbtrop_new, solver_iters=iters,
                         solver_rr=rr)
