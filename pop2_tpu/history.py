"""Instantaneous snapshot streams: history and movie files.

Reference: ``source/history.F90`` (full-field instantaneous snapshots every
``history_freq``) and ``source/movie.F90`` (2-D slices — surface level of
3-D fields — at ``movie_freq``). Both reuse the tavg field registry and the
shared NetCDF writer; unlike tavg there is no accumulation, so writes are a
pure host-side sample of the current state.
"""

from __future__ import annotations

from typing import List

import numpy as np

from pop2_tpu.config import ModelConfig
from pop2_tpu.grid import Grid
from pop2_tpu.state import State
from pop2_tpu.tavg import FIELDS, write_fields_netcdf


class HistoryStream:
    """Instantaneous full-field snapshots (history.F90)."""

    ndims_out = None     # full fields

    def __init__(self, cfg: ModelConfig, grid: Grid, contents: List[str],
                 freq_steps: int, outfile_prefix: str = "pop2_tpu.h"):
        unknown = [n for n in contents if n not in FIELDS]
        if unknown:
            raise ValueError(f"unknown history fields {unknown}")
        self.cfg, self.grid = cfg, grid
        self.contents = list(contents)
        self.freq_steps = int(freq_steps)
        self.prefix = outfile_prefix
        from pop2_tpu.grid import grid_bc
        from pop2_tpu.tavg import TavgAux
        self.aux = TavgAux(bc=grid_bc(cfg))  # Model refreshes with extras

    def due(self, step_number: int) -> bool:
        return self.freq_steps > 0 and step_number % self.freq_steps == 0

    def _sample(self, state: State):
        out = {}
        for n in self.contents:
            arr = np.asarray(FIELDS[n].fn(self.cfg, self.grid, state,
                                          self.aux))
            out[n] = arr
        return out

    def write(self, path: str, state: State, step_number: int) -> str:
        fname = f"{path}/{self.prefix}.{step_number:08d}.nc"
        return write_fields_netcdf(self.cfg, self.grid, fname,
                                   self.contents, self._sample(state),
                                   step_number)


class MovieStream(HistoryStream):
    """2-D snapshot stream: 3-D fields are sampled at a fixed level
    (movie.F90; default the surface)."""

    def __init__(self, cfg: ModelConfig, grid: Grid, contents: List[str],
                 freq_steps: int, level: int = 0,
                 outfile_prefix: str = "pop2_tpu.m"):
        super().__init__(cfg, grid, contents, freq_steps, outfile_prefix)
        self.level = level

    def _sample(self, state: State):
        out = {}
        for n in self.contents:
            arr = np.asarray(FIELDS[n].fn(self.cfg, self.grid, state,
                                          self.aux))
            if arr.ndim == 3:
                arr = arr[self.level]
            out[n] = arr
        return out
