"""Tracer budget diagnostics.

Reference: ``source/budget_diagnostics.F90`` — ``diag_for_tracer_budgets``
(volume-weighted tracer totals including the variable-thickness surface
volume, and the mean SSH/volume bookkeeping) and ``tracer_budgets`` (budget
closure over an averaging interval: dV*T/dt vs. the accumulated surface
flux, shortwave, and ice terms). All sums are single fused jnp reductions.
"""

from __future__ import annotations

import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.forcing import Forcing
from pop2_tpu.grid import Grid, thickness_t
from pop2_tpu.state import State


def tracer_totals(cfg: ModelConfig, grid: Grid, state: State):
    """Volume integral of each tracer over the ocean (tracer * cm^3),
    using the current time level. With a variable-thickness surface layer
    the top-cell volume includes the SSH contribution psurf/g
    (diag_for_tracer_budgets, budget_diagnostics.F90)."""
    dzvol = thickness_t(cfg, grid) * grid.TAREA[None]
    tot = jnp.sum(jnp.where(grid.kmask_t[None],
                            state.tracer_cur * dzvol[None], 0.0),
                  axis=(1, 2, 3))
    if cfg.sfc_layer == "varthick":
        ssh_vol = (state.psurf_cur / const.GRAV) * grid.TAREA * grid.RCALCT
        tot = tot + jnp.sum(state.tracer_cur[:, 0] * ssh_vol[None],
                            axis=(1, 2))
    return tot


def ocean_volume(cfg: ModelConfig, grid: Grid, state: State):
    """Total ocean volume (cm^3) incl. the SSH contribution."""
    vol = grid.volume_t
    if cfg.sfc_layer == "varthick":
        vol = vol + jnp.sum((state.psurf_cur / const.GRAV)
                            * grid.TAREA * grid.RCALCT)
    return vol


def surface_flux_integral(cfg: ModelConfig, grid: Grid, forcing: Forcing):
    """Area integral of the prescribed surface tracer input per second
    (tracer * cm^3 / s): STF plus, for temperature, penetrating shortwave,
    plus the freshwater tracer content TFW."""
    area = grid.TAREA * grid.RCALCT
    tot = jnp.sum(forcing.stf * area[None], axis=(1, 2))
    tot = tot.at[0].add(jnp.sum(forcing.shf_qsw * area))
    if cfg.sfc_layer == "varthick":
        tot = tot + jnp.sum(forcing.tfw * area[None], axis=(1, 2))
    return tot


def budget_residual(cfg: ModelConfig, grid: Grid, before: State,
                    after: State, forcing: Forcing, nsteps: int):
    """Normalized closure error of each tracer budget over ``nsteps``
    full steps: ((total_after - total_before) - flux*dt) / volume
    (tracer_budgets, budget_diagnostics.F90). Returns per-tracer mean
    concentration drift not explained by the surface input."""
    dt = nsteps * cfg.time.dtt
    d_tot = tracer_totals(cfg, grid, after) - tracer_totals(cfg, grid,
                                                            before)
    influx = surface_flux_integral(cfg, grid, forcing) * dt
    return (d_tot - influx) / grid.volume_t
