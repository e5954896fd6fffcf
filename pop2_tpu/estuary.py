"""Estuary virtual-salt-flux parameterization (river runoff).

Reference: ``source/estuary_vsf_mod.F90`` — with ``lvsf_river`` the virtual
salt flux of river runoff uses the LOCAL surface salinity instead of the
constant reference salinity, plus a globally-uniform correction so the
global salt budget matches the reference-salinity formulation
(set_estuary_vsf_forcing; vsf_river_correction). The estuary box model
(EBM exchange circulation, set_estuary_exch_circ) requires estuary
geometry datasets and is not rebuilt.
"""

from __future__ import annotations

import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid


def river_vsf(cfg: ModelConfig, grid: Grid, roff_f, s_surface):
    """Virtual salt flux of river water using local salinity.

    roff_f: (ny, nx) river runoff (kg freshwater/m^2/s, positive into
    ocean); s_surface: (ny, nx) model surface salinity (msu).
    Returns the STF_S contribution (msu cm/s): local-salinity flux plus
    the uniform correction term (estuary_vsf_mod.F90
    set_estuary_vsf_forcing).
    """
    r = grid.RCALCT
    # local-salinity virtual salt flux: fresh water dilutes at S_local
    flux_loc = -roff_f * const.FWFLUX_FACTOR_SALT * s_surface \
        * const.SALT_TO_PPT * r
    # reference-salinity flux (the standard salinity_factor form)
    flux_ref = roff_f * const.SALINITY_FACTOR * r
    area = grid.area_t
    correction = (jnp.sum((flux_ref - flux_loc) * grid.TAREA * r) / area)
    return flux_loc + correction * r
