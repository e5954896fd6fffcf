"""Penetrating shortwave absorption.

Reference: ``source/sw_absorption.F90`` — Jerlov water-type double-exponential
transmission (:786-805), per-level absorption profile (:364-369), tracer
source ``add_sw_absorb`` (:818-905). The chlorophyll option follows with
file-based forcing.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid

# Jerlov water types I, IA, IB, II, III (source/sw_absorption.F90:786-788)
RFAC = np.array([0.58, 0.62, 0.67, 0.77, 0.78])
DEPTH1 = np.array([0.35, 0.60, 1.00, 1.50, 1.40])
DEPTH2 = np.array([23.0, 20.0, 17.0, 14.0, 7.90])
DEPTH_CUTOFF = -200.0  # meters


def sw_absorb_frac(depth_cm, water_type: int):
    """Transmission fraction at depth (source/sw_absorption.F90:796-805)."""
    i = water_type - 1
    z = -np.asarray(depth_cm) * const.MPERCM
    frac = (RFAC[i] * np.exp(z / DEPTH1[i])
            + (1.0 - RFAC[i]) * np.exp(z / DEPTH2[i]))
    return np.where(z < DEPTH_CUTOFF, 0.0, frac)


def absorb_profile(cfg: ModelConfig, grid: Grid) -> jnp.ndarray:
    """Per-interface transmission sw_absorb(0:km)
    (source/sw_absorption.F90:364-369): 1 at the surface, 0 below km."""
    km = cfg.km
    zw = np.asarray(grid.vgrid.zw)
    prof = np.zeros(km + 1)
    prof[0] = 1.0
    prof[1:km] = sw_absorb_frac(zw[:km - 1], cfg.jerlov_water_type)
    prof[km] = 0.0
    return jnp.asarray(prof, cfg.jnp_dtype)


def add_sw_absorb(cfg: ModelConfig, grid: Grid, ft, shf_qsw, sw_absorb):
    """Add penetrative shortwave heating to the temperature tendency
    (source/sw_absorption.F90:875-898): in the interior the layer absorbs
    the transmission difference; at the local bottom it absorbs everything
    that reached it (no energy into the ground)."""
    km = cfg.km
    work = jnp.maximum(shf_qsw, 0.0)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (km, 1, 1), 0) + 1
    dzr = jnp.reshape(grid.vgrid.dzr, (km, 1, 1))
    frac_interior = jnp.reshape(sw_absorb[:-1] - sw_absorb[1:], (km, 1, 1))
    frac_bottom = jnp.reshape(sw_absorb[:-1], (km, 1, 1))
    frac = jnp.where(kidx < grid.KMT[None], frac_interior, frac_bottom)
    src = jnp.where(kidx <= grid.KMT[None], work[None] * frac * dzr, 0.0)
    return ft.at[0].add(src)
