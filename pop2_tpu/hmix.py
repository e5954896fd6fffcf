"""Horizontal mixing (Laplacian del2 for momentum and tracers; del4/GM/aniso
follow in later rounds).

Reference: ``source/hmix_del2.F90:670-1144`` using the stencil coefficients
precomputed in grid.py (the reference builds them in init_del2u/init_del2t,
source/hmix_del2.F90:287-404, 611-634). Land boundary conditions enter through
per-level masking of the tracer coefficients (zero-flux) and through zeroing
over land for momentum (no-slip, since u = v = 0 on boundaries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid
from pop2_tpu.stencil import BC


def hdifft_del2(cfg: ModelConfig, grid: Grid, bc: BC, tmix):
    """Laplacian tracer diffusion ah*Del2(T) for all tracers/levels
    (source/hmix_del2.F90:1034-1095). tmix: (nt, km, ny, nx)."""
    km = cfg.km
    kidx = jax.lax.broadcasted_iota(jnp.int32, (km, 1, 1), 0) + 1
    mask = grid.kmask_t
    cn = jnp.where((kidx <= grid.KMTN[None]) & mask, grid.DTN[None], 0.0)
    cs = jnp.where((kidx <= grid.KMTS[None]) & mask, grid.DTS[None], 0.0)
    ce = jnp.where((kidx <= grid.KMTE[None]) & mask, grid.DTE[None], 0.0)
    cw = jnp.where((kidx <= grid.KMTW[None]) & mask, grid.DTW[None], 0.0)
    cc = -(cn + cs + ce + cw)

    ah = cfg.auto_ah
    hdtk = ah * (cc[None] * tmix
                 + cn[None] * bc.n(tmix) + cs[None] * bc.s(tmix)
                 + ce[None] * bc.e(tmix) + cw[None] * bc.w(tmix))
    return hdtk


def hdiffu_del2(cfg: ModelConfig, grid: Grid, bc: BC, umixk, vmixk):
    """Laplacian momentum diffusion with metric terms that mix U and V
    (source/hmix_del2.F90:892-936). umixk/vmixk: (km, ny, nx).
    Returns (hduk, hdvk) masked to zero over land."""
    am = cfg.auto_am
    if cfg.ltopostress:
        # subtract the Neptune equilibrium velocity so friction relaxes the
        # flow toward it (source/hmix_del2.F90:765-772)
        umixk = jnp.where(grid.kmask_u, umixk - grid.TSU, umixk)
        vmixk = jnp.where(grid.kmask_u, vmixk - grid.TSV, vmixk)
    cc = grid.DUC + grid.DUM
    nu = bc.n(umixk, "necorner", "vector")
    nv = bc.n(vmixk, "necorner", "vector")
    lap_u = (cc * umixk + grid.DUN * nu + grid.DUS * bc.s(umixk)
             + grid.DUE * bc.e(umixk) + grid.DUW * bc.w(umixk))
    lap_v = (cc * vmixk + grid.DUN * nv + grid.DUS * bc.s(vmixk)
             + grid.DUE * bc.e(vmixk) + grid.DUW * bc.w(vmixk))
    mix_v = (grid.DMC * vmixk + grid.DMN * nv
             + grid.DMS * bc.s(vmixk) + grid.DME * bc.e(vmixk)
             + grid.DMW * bc.w(vmixk))
    mix_u = (grid.DMC * umixk + grid.DMN * nu
             + grid.DMS * bc.s(umixk) + grid.DME * bc.e(umixk)
             + grid.DMW * bc.w(umixk))
    hduk = am * (lap_u + mix_v)
    hdvk = am * (lap_v - mix_u)
    zero = jnp.zeros_like(hduk)
    return (jnp.where(grid.kmask_u, hduk, zero),
            jnp.where(grid.kmask_u, hdvk, zero))


def _tracer_lap_coeffs(cfg: ModelConfig, grid: Grid):
    """Per-level masked 5-point tracer Laplacian coefficients (zero-flux
    land BC); shared by del2 and del4."""
    km = cfg.km
    kidx = jax.lax.broadcasted_iota(jnp.int32, (km, 1, 1), 0) + 1
    mask = grid.kmask_t
    cn = jnp.where((kidx <= grid.KMTN[None]) & mask, grid.DTN[None], 0.0)
    cs = jnp.where((kidx <= grid.KMTS[None]) & mask, grid.DTS[None], 0.0)
    ce = jnp.where((kidx <= grid.KMTE[None]) & mask, grid.DTE[None], 0.0)
    cw = jnp.where((kidx <= grid.KMTW[None]) & mask, grid.DTW[None], 0.0)
    cc = -(cn + cs + ce + cw)
    return cc, cn, cs, ce, cw


def _apply_t5(bc, coeffs, t):
    cc, cn, cs, ce, cw = coeffs
    return (cc[None] * t + cn[None] * bc.n(t) + cs[None] * bc.s(t)
            + ce[None] * bc.e(t) + cw[None] * bc.w(t))


def hdifft_del4(cfg: ModelConfig, grid: Grid, bc: BC, tmix):
    """Biharmonic tracer mixing ah*Del2(Del2(T))
    (source/hmix_del4.F90:963-1060): repeated application of the masked
    Laplacian; ah (cfg.ah4) is negative."""
    coeffs = _tracer_lap_coeffs(cfg, grid)
    d2 = _apply_t5(bc, coeffs, tmix)
    return cfg.ah4 * _apply_t5(bc, coeffs, d2)


def _mom_lap(cfg, grid, bc, u, v):
    """Momentum Laplacian with U/V-mixing metric terms (shared stencil of
    del2/del4; source/hmix_del4.F90:727-770)."""
    cc = grid.DUC + grid.DUM
    nu = bc.n(u, "necorner", "vector")
    nv = bc.n(v, "necorner", "vector")
    lap_u = (cc * u + grid.DUN * nu + grid.DUS * bc.s(u)
             + grid.DUE * bc.e(u) + grid.DUW * bc.w(u))
    lap_v = (cc * v + grid.DUN * nv + grid.DUS * bc.s(v)
             + grid.DUE * bc.e(v) + grid.DUW * bc.w(v))
    mix_v = (grid.DMC * v + grid.DMN * nv + grid.DMS * bc.s(v)
             + grid.DME * bc.e(v) + grid.DMW * bc.w(v))
    mix_u = (grid.DMC * u + grid.DMN * nu + grid.DMS * bc.s(u)
             + grid.DME * bc.e(u) + grid.DMW * bc.w(u))
    return lap_u + mix_v, lap_v - mix_u


def hdiffu_del4(cfg: ModelConfig, grid: Grid, bc: BC, umixk, vmixk):
    """Biharmonic momentum mixing am*Del2(Del2(u,v))
    (source/hmix_del4.F90:637-880); am (cfg.am4) is negative. The
    intermediate Del2 field is zeroed over land before the second
    application (boundary condition, :770-776)."""
    d2u, d2v = _mom_lap(cfg, grid, bc, umixk, vmixk)
    zero = jnp.zeros_like(d2u)
    d2u = jnp.where(grid.kmask_u, d2u, zero)
    d2v = jnp.where(grid.kmask_u, d2v, zero)
    hdu, hdv = _mom_lap(cfg, grid, bc, d2u, d2v)
    return (jnp.where(grid.kmask_u, cfg.am4 * hdu, zero),
            jnp.where(grid.kmask_u, cfg.am4 * hdv, zero))


def hdifft(cfg: ModelConfig, grid: Grid, bc: BC, tmix, umix=None, vmix=None):
    """Dispatch (source/horizontal_mix.F90:486-)."""
    if cfg.hmix_tracer == "del2":
        return hdifft_del2(cfg, grid, bc, tmix)
    if cfg.hmix_tracer == "del4":
        return hdifft_del4(cfg, grid, bc, tmix)
    raise NotImplementedError(f"hmix_tracer {cfg.hmix_tracer}")


def hdiffu(cfg: ModelConfig, grid: Grid, bc: BC, umixk, vmixk):
    """Dispatch (source/horizontal_mix.F90:427-)."""
    if cfg.hmix_momentum == "del2":
        return hdiffu_del2(cfg, grid, bc, umixk, vmixk)
    if cfg.hmix_momentum == "del4":
        return hdiffu_del4(cfg, grid, bc, umixk, vmixk)
    if cfg.hmix_momentum == "aniso":
        from pop2_tpu import hmix_aniso
        return hmix_aniso.hdiffu_aniso(cfg, grid, bc, grid.aniso,
                                       umixk, vmixk)
    raise NotImplementedError(f"hmix_momentum {cfg.hmix_momentum}")
