"""Surface forcing.

Reference: ``source/forcing.F90`` dispatch + per-field modules. Round 1
implements the standalone analytic options matching the reference's test
configuration (``input_templates/test_pop2_in``): analytic zonal wind stress
(source/forcing_ws.F90:266-292), zero heat/freshwater/interior restoring.
File-based and coupled forcing arrive with the gx-grid support.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid


@struct.dataclass
class Forcing:
    smf: jnp.ndarray       # (2, ny, nx) surface momentum flux at U points
    smft: jnp.ndarray      # (2, ny, nx) same at T points
    stf: jnp.ndarray       # (nt, ny, nx) surface tracer fluxes
    tfw: jnp.ndarray       # (nt, ny, nx) tracer content of freshwater flux
    shf_qsw: jnp.ndarray   # (ny, nx) penetrating shortwave
    fw: jnp.ndarray        # (ny, nx) freshwater flux (cm/s)
    atm_press: jnp.ndarray  # (ny, nx) atmospheric pressure


def analytic_forcing(cfg: ModelConfig, grid: Grid) -> Forcing:
    """Constant-in-time analytic wind stress
    tau_x = -cos(3*lat) (source/forcing_ws.F90:275-277), everything else zero.
    """
    dt = cfg.jnp_dtype
    ny, nx, nt = cfg.ny, cfg.nx, cfg.nt
    z = jnp.zeros((ny, nx), dt)
    smf = jnp.stack([-jnp.cos(3.0 * grid.ULAT) * grid.RCALCU, z])
    smft = jnp.stack([-jnp.cos(3.0 * grid.TLAT) * grid.RCALCT, z])
    return Forcing(
        smf=smf.astype(dt), smft=smft.astype(dt),
        stf=jnp.zeros((nt, ny, nx), dt), tfw=jnp.zeros((nt, ny, nx), dt),
        shf_qsw=z, fw=z, atm_press=z)
