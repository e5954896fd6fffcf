"""Vertical mixing: coefficients (constant / Richardson; KPP to follow),
explicit vertical diffusion terms, and convective adjustment.

Reference: ``source/vertical_mix.F90`` (dispatch, vdifft :691, vdiffu :853,
convad :1888), ``source/vmix_const.F90``, ``source/vmix_rich.F90:179-414``.
All routines are whole-column vectorized over (km, ny, nx) — the reference's
per-level calls with carried top-flux state become shifted-array expressions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import eos
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid, thickness_t, thickness_u
from pop2_tpu.stencil import BC, tgrid_to_ugrid, ugrid_to_tgrid

EPS = 1.0e-10


class VmixCoeffs(NamedTuple):
    vdc: jnp.ndarray   # (2, km, ny, nx) tracer diffusivity at layer bottoms
    #                     class 0: temperature, class 1: salinity/others
    vvc: jnp.ndarray   # (km, ny, nx) momentum viscosity at layer bottoms
    kpp: object = None  # KPPOut when cfg.vmix == 'kpp' (ghat, hblt, ...)


def vmix_coeffs(cfg: ModelConfig, grid: Grid, bc: BC, tmix, umix, vmix_,
                rhomix, forcing=None, kpp_statics=None,
                ucur=None, vcur=None, chl=None) -> VmixCoeffs:
    """Dispatch to the chosen scheme (source/vertical_mix.F90:518-667)."""
    if cfg.vmix == "const":
        return _coeffs_const(cfg, grid)
    if cfg.vmix == "rich":
        return _coeffs_rich(cfg, grid, bc, tmix, umix, vmix_, rhomix)
    if cfg.vmix == "kpp":
        from pop2_tpu import kpp as kpp_mod
        out = kpp_mod.kpp_coeffs(
            cfg, grid, bc, kpp_statics, tmix, umix, vmix_,
            forcing.stf, forcing.shf_qsw, forcing.smft,
            cfg.convect_diff, cfg.convect_visc, ucur=ucur, vcur=vcur,
            chl=chl, tidal_lnc=forcing.tidal_lnc, rhomix=rhomix)
        return VmixCoeffs(vdc=out.vdc, vvc=out.vvc, kpp=out)
    raise NotImplementedError(f"vmix scheme {cfg.vmix}")


def _coeffs_const(cfg: ModelConfig, grid: Grid) -> VmixCoeffs:
    """Uniform background coefficients (source/vmix_const.F90)."""
    shape = grid.kmask_t.shape
    dt = cfg.jnp_dtype
    vdc = jnp.where(grid.kmask_t, jnp.asarray(cfg.const_vdc, dt), 0.0)
    vvc = jnp.where(grid.kmask_u, jnp.asarray(cfg.const_vvc, dt), 0.0)
    return VmixCoeffs(vdc=jnp.stack([vdc, vdc]), vvc=vvc)


def _coeffs_rich(cfg: ModelConfig, grid: Grid, bc: BC, tmix, umix, vmix_,
                 rhomix) -> VmixCoeffs:
    """Pacanowski-Philander Richardson-number mixing
    (source/vmix_rich.F90:179-414), with the diffusion form of convection:
    coefficients capped at convect_diff/convect_visc where unstable."""
    km = cfg.km
    kp1 = jnp.minimum(jnp.arange(km) + 1, km - 1)

    # velocities averaged to T points at every level (vectorized over km)
    ut = ugrid_to_tgrid(umix, bc)
    vt = ugrid_to_tgrid(vmix_, bc)
    dU2 = (ut - ut[kp1]) ** 2 + (vt - vt[kp1]) ** 2 + EPS

    # density of level-k water adiabatically displaced to level k+1
    rhok_disp = eos.state(cfg, grid.vgrid.pressz[kp1], tmix[0], tmix[1])
    drho = rhok_disp - rhomix[kp1]

    dzw_k = jnp.reshape(grid.vgrid.dzw[1:km + 1], (km, 1, 1))
    rich = -const.GRAV * dzw_k * drho / dU2
    interior_t = grid.kmask_t & jnp.concatenate(
        [grid.kmask_t[1:], jnp.zeros_like(grid.kmask_t[:1])])  # k < KMT
    rich = jnp.where(interior_t, rich, 0.0)

    critnu_t = cfg.convect_diff
    fac = 1.0 / (1.0 + 5.0 * jnp.maximum(rich, 0.0))
    vdc = jnp.minimum(critnu_t,
                      cfg.bckgrnd_vdc
                      + (cfg.bckgrnd_vvc + cfg.rich_mix * fac ** 2) * fac)
    vdc = jnp.where(rich < 0.0, critnu_t, vdc)
    vdc = jnp.where(interior_t, vdc, 0.0)

    richu = tgrid_to_ugrid(rich, grid.AU0, grid.AUN, grid.AUE, grid.AUNE, bc)
    interior_u = grid.kmask_u & jnp.concatenate(
        [grid.kmask_u[1:], jnp.zeros_like(grid.kmask_u[:1])])  # k < KMU
    richu = jnp.where(interior_u, richu, 0.0)
    critnu_u = cfg.convect_visc
    facu = 1.0 / (1.0 + 5.0 * jnp.maximum(richu, 0.0))
    vvc = jnp.minimum(critnu_u, cfg.bckgrnd_vvc + cfg.rich_mix * facu ** 2)
    vvc = jnp.where(richu < 0.0, critnu_u, vvc)
    vvc = jnp.where(interior_u, vvc, 0.0)

    return VmixCoeffs(vdc=jnp.stack([vdc, vdc]), vvc=vvc)


def vdifft(cfg: ModelConfig, grid: Grid, vdc, told, stf):
    """Explicit vertical tracer diffusion D_V(T_old)
    (source/vertical_mix.F90:691-847), all (nt, km, ny, nx) at once.

    vdc: (2, km, ny, nx); tracer n uses class min(n, 1).
    told: (nt, km, ny, nx); stf: (nt, ny, nx) surface fluxes.
    Returns (nt, km, ny, nx) tendency.
    """
    nt, km = told.shape[0], told.shape[1]
    mt2 = jnp.minimum(jnp.arange(nt), vdc.shape[0] - 1)
    vdc_n = vdc[mt2]  # (nt, km, ny, nx)

    t_kp1 = jnp.concatenate([told[:, 1:], told[:, -1:]], axis=1)
    # interface spacing 0.5*(DZT_k + DZT_{k+1}) — the partial-bottom-cell
    # form (vertical_mix.F90:786-800), identical to dzw for full cells
    dzt = thickness_t(cfg, grid)
    dzt_kp1 = jnp.concatenate([dzt[1:], dzt[-1:]], axis=0)
    dzwr_k = (1.0 / (0.5 * (dzt + dzt_kp1)))[None]
    below = jnp.concatenate(  # k < KMT, broadcast over tracers
        [grid.kmask_t[1:], jnp.zeros_like(grid.kmask_t[:1])])[None]
    vtfb = jnp.where(below, vdc_n * (told - t_kp1) * dzwr_k, 0.0)

    sfc_flux = jnp.where(grid.kmask_t[0][None], stf, 0.0)[:, None]
    vtf = jnp.concatenate([sfc_flux, vtfb[:, :-1]], axis=1)
    return jnp.where(grid.kmask_t[None], (vtf - vtfb) / dzt[None], 0.0)


def vdiffu(cfg: ModelConfig, grid: Grid, vvc, uold, vold, smf):
    """Explicit vertical momentum diffusion with wind-stress top BC and
    quadratic bottom drag (source/vertical_mix.F90:853-1026).

    smf: (2, ny, nx) surface momentum flux. Returns (du, dv)."""
    km = uold.shape[0]
    u_kp1 = jnp.concatenate([uold[1:], uold[-1:]], axis=0)
    v_kp1 = jnp.concatenate([vold[1:], vold[-1:]], axis=0)
    dzu = thickness_u(cfg, grid)
    dzu_kp1 = jnp.concatenate([dzu[1:], dzu[-1:]], axis=0)
    dzwr_k = 1.0 / (0.5 * (dzu + dzu_kp1))
    vufb = vvc * (uold - u_kp1) * dzwr_k
    vvfb = vvc * (vold - v_kp1) * dzwr_k

    # quadratic bottom drag at k == KMU (source/vertical_mix.F90:975-983)
    kidx = jax.lax.broadcasted_iota(jnp.int32, uold.shape, 0) + 1
    at_bottom = kidx == grid.KMU[None]
    vmag = cfg.bottom_drag * jnp.sqrt(uold ** 2 + vold ** 2)
    vufb = jnp.where(at_bottom, vmag * uold, vufb)
    vvfb = jnp.where(at_bottom, vmag * vold, vvfb)

    sfc_u = jnp.where(grid.kmask_u[0], smf[0], 0.0)[None]
    sfc_v = jnp.where(grid.kmask_u[0], smf[1], 0.0)[None]
    vuf = jnp.concatenate([sfc_u, vufb[:-1]], axis=0)
    vvf = jnp.concatenate([sfc_v, vvfb[:-1]], axis=0)
    du = jnp.where(grid.kmask_u, (vuf - vufb) / dzu, 0.0)
    dv = jnp.where(grid.kmask_u, (vvf - vvfb) / dzu, 0.0)
    return du, dv


def convad(cfg: ModelConfig, grid: Grid, tnew, ts_range=None):
    """Full convective adjustment by pairwise mixing of unstable adjacent
    levels (source/vertical_mix.F90:1888-2027). Only active for
    convection_type='adjustment'; the 'diffusion' form lives in the vmix
    coefficient schemes. Returns adjusted tracers (nt, km, ny, nx)."""
    if cfg.convection_type != "adjustment":
        return tnew
    km = cfg.km
    dz = grid.vgrid.dz
    # dztxcel = dz/dttxcel under depth acceleration; == dz without
    # (source/time_management.F90:1003-1009, used by convad's pair mixing)
    if cfg.time.laccel and cfg.time.dttxcel is not None:
        xcel = jnp.asarray(cfg.time.dttxcel, dz.dtype).at[0].set(1.0)
        dz = dz / xcel
    pressz = grid.vgrid.pressz

    def mix_pair(tr, k):
        # density of level k displaced to k+1 vs in-situ density at k+1
        rhok = eos.state_at_level(cfg, pressz[k + 1], tr[0, k], tr[1, k])
        rhokp = eos.state_at_level(cfg, pressz[k + 1], tr[0, k + 1],
                                   tr[1, k + 1])
        unstable = (rhok > rhokp) & grid.kmask_t[k + 1]
        w = 1.0 / (dz[k] + dz[k + 1])
        mixed = w * (dz[k] * tr[:, k] + dz[k + 1] * tr[:, k + 1])
        tr_k = jnp.where(unstable[None], mixed, tr[:, k])
        tr_kp = jnp.where(unstable[None], mixed, tr[:, k + 1])
        return tr.at[:, k].set(tr_k).at[:, k + 1].set(tr_kp)

    for _ in range(cfg.nconvad):
        for ks in (0, 1):
            for k in range(ks, km - 1, 2):
                tnew = mix_pair(tnew, k)
    return tnew
