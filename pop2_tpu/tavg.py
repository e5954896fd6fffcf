"""Time-averaged history output (tavg).

Reference: ``source/tavg.F90`` (7985 lines) — a multi-stream registry of ~630
accumulated fields written at stream frequencies, with the accumulators
checkpointed so running means survive restarts (:1570, :2325). This module
rebuilds the core mechanism TPU-first:

  * a registry of pure field functions state -> (ny,nx) or (km,ny,nx) arrays
    (the reference's scattered ``accumulate_tavg_field`` calls become one
    jitted accumulation pass over the requested fields),
  * per-stream accumulators summed on device, normalized and written on host,
  * NetCDF3-classic output via scipy (PIO/netCDF parity target), with
    coordinates zt/TLAT/TLONG like the reference's tavg files,
  * accumulator save/restore for exact-restart of running means.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid
from pop2_tpu.state import State


@dataclasses.dataclass(frozen=True)
class FieldDef:
    name: str
    long_name: str
    units: str
    ndims: int                     # 2 or 3
    fn: Callable                   # (cfg, grid, state) -> array


def _sfc(cfg, grid, state):
    return state.psurf_cur / const.GRAV


FIELDS: Dict[str, FieldDef] = {}


def _register(name, long_name, units, ndims, fn):
    FIELDS[name] = FieldDef(name, long_name, units, ndims, fn)


# -- standard fields (subset of the reference registrations; e.g.
#    SSH source/surface_hgt.F90:90, TEMP/SALT source/baroclinic.F90:2349,
#    UVEL/VVEL source/baroclinic.F90:772, SU/SV source/barotropic.F90:152) --
_register("SSH", "Sea Surface Height", "centimeter", 2, _sfc)
_register("SST", "Sea Surface Temperature", "degC", 2,
          lambda c, g, s: s.tracer_cur[0, 0])
_register("SSS", "Sea Surface Salinity", "psu", 2,
          lambda c, g, s: s.tracer_cur[1, 0] * const.SALT_TO_PPT)
_register("TEMP", "Potential Temperature", "degC", 3,
          lambda c, g, s: s.tracer_cur[0])
_register("SALT", "Salinity", "gram/gram", 3,
          lambda c, g, s: s.tracer_cur[1])
_register("UVEL", "Velocity in grid-x direction", "cm/s", 3,
          lambda c, g, s: s.u_cur)
_register("VVEL", "Velocity in grid-y direction", "cm/s", 3,
          lambda c, g, s: s.v_cur)
_register("RHO", "In-situ density", "g/cm^3", 3,
          lambda c, g, s: s.rho_cur)
_register("KE", "Horizontal Kinetic Energy", "cm^2/s^2", 3,
          lambda c, g, s: 0.5 * (s.u_cur ** 2 + s.v_cur ** 2))
_register("UV", "UV velocity product", "cm^2/s^2", 3,
          lambda c, g, s: s.u_cur * s.v_cur)
_register("SU", "Vertically Integrated U", "cm^2/s", 2,
          lambda c, g, s: g.HU * s.ubtrop_cur)
_register("SV", "Vertically Integrated V", "cm^2/s", 2,
          lambda c, g, s: g.HU * s.vbtrop_cur)
_register("SSH2", "SSH**2", "cm^2", 2,
          lambda c, g, s: (s.psurf_cur / const.GRAV) ** 2)
_register("TEMP2", "Temperature**2", "degC^2", 3,
          lambda c, g, s: s.tracer_cur[0] ** 2)
_register("SALT2", "Salinity**2", "(g/g)^2", 3,
          lambda c, g, s: s.tracer_cur[1] ** 2)


def write_fields_netcdf(cfg, grid, fname: str, contents, arrays,
                        step_number: int = 0) -> str:
    """Shared NetCDF3-classic writer with z_t/TLAT/TLONG coordinates
    (the reference's io_netcdf.F90 field-writing path). ``arrays`` maps
    field name -> numpy array shaped per FIELDS[name].ndims."""
    from scipy.io import netcdf_file
    with netcdf_file(fname, "w") as f:
        f.createDimension("time", 1)
        f.createDimension("z_t", cfg.km)
        f.createDimension("nlat", cfg.ny)
        f.createDimension("nlon", cfg.nx)

        zt = f.createVariable("z_t", "d", ("z_t",))
        zt[:] = np.asarray(grid.vgrid.zt)
        zt.units = b"centimeters"
        tlat = f.createVariable("TLAT", "d", ("nlat", "nlon"))
        tlat[:] = np.asarray(grid.TLAT) * const.RADIAN
        tlat.units = b"degrees_north"
        tlon = f.createVariable("TLONG", "d", ("nlat", "nlon"))
        tlon[:] = np.asarray(grid.TLON) * const.RADIAN
        tlon.units = b"degrees_east"
        tvar = f.createVariable("time", "d", ("time",))
        tvar[:] = [float(step_number)]
        tvar.units = b"steps"

        for n in contents:
            d = FIELDS[n]
            arr = np.asarray(arrays[n])
            dims = (("time", "z_t", "nlat", "nlon") if arr.ndim == 3
                    else ("time", "nlat", "nlon"))
            v = f.createVariable(n, "f", dims)
            v[:] = arr[None].astype(np.float32)
            v.units = d.units.encode()
            v.long_name = d.long_name.encode()
    return fname


class TavgStream:
    """One output stream: a set of fields accumulated every step and written
    every ``freq_steps`` steps (reference stream mechanism,
    source/tavg.F90:482-1568)."""

    def __init__(self, cfg: ModelConfig, grid: Grid, contents: List[str],
                 freq_steps: int, outfile_prefix: str = "tavg"):
        unknown = [n for n in contents if n not in FIELDS]
        if unknown:
            raise KeyError(f"unknown tavg fields: {unknown} "
                           f"(available: {sorted(FIELDS)})")
        self.cfg = cfg
        self.grid = grid
        self.contents = list(contents)
        self.freq_steps = freq_steps
        self.prefix = outfile_prefix
        self.nsamples = 0
        self.sums = self._zeros()

        defs = [FIELDS[n] for n in self.contents]

        @jax.jit
        def _accumulate(sums, state):
            out = {}
            for d in defs:
                out[d.name] = sums[d.name] + d.fn(cfg, grid, state)
            return out

        self._accumulate = _accumulate

    def _zeros(self):
        cfg, grid = self.cfg, self.grid
        z = {}
        for n in self.contents:
            d = FIELDS[n]
            shape = ((cfg.km, cfg.ny, cfg.nx) if d.ndims == 3
                     else (cfg.ny, cfg.nx))
            z[n] = jnp.zeros(shape, cfg.jnp_dtype)
        return z

    def accumulate(self, state: State):
        self.sums = self._accumulate(self.sums, state)
        self.nsamples += 1

    @property
    def ready(self) -> bool:
        return self.nsamples >= self.freq_steps

    def reset(self):
        self.sums = self._zeros()
        self.nsamples = 0

    def write(self, path: str, step_number: int = 0) -> str:
        """Write the normalized averages as NetCDF3 classic; returns path."""
        fname = f"{path}/{self.prefix}.{step_number:08d}.nc" \
            if not path.endswith(".nc") else path
        norm = 1.0 / max(self.nsamples, 1)
        arrays = {n: np.asarray(self.sums[n]) * norm for n in self.contents}
        write_fields_netcdf(self.cfg, self.grid, fname, self.contents,
                            arrays, step_number)
        return fname

    # -- accumulator checkpointing (read_tavg/write_tavg,
    #    source/tavg.F90:2325,1570) --
    def save_accumulators(self):
        return {"nsamples": self.nsamples,
                **{f"sum_{k}": np.asarray(v) for k, v in self.sums.items()}}

    def restore_accumulators(self, data):
        self.nsamples = int(data["nsamples"])
        self.sums = {k[4:]: jnp.asarray(v) for k, v in data.items()
                     if k.startswith("sum_")}
