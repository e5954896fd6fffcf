"""Exact-restart checkpointing.

Reference: ``source/restart.F90`` — the reference dumps all three time levels
of the prognostic state plus FW_OLD and module extras, with pointer files
recording the latest restart path (:255-275). Here the checkpoint is the full
two-level State pytree plus the step counter; restart is exact (bitwise) by
construction because the state is the complete jit carry.

Format: one .npz per checkpoint + a JSON sidecar of metadata, plus a pointer
file mirroring the reference's ``rpointer.ocn.restart`` mechanism. Sharded
zarr/tensorstore output arrives with multi-host support.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from pop2_tpu.config import ModelConfig
from pop2_tpu.state import State

POINTER_FILE = "rpointer.ocn.restart"


def write_restart(path: str, state: State, nsteps_total: int,
                  cfg: ModelConfig, pointer_dir: str = None) -> str:
    """Write a checkpoint; returns the file path written."""
    arrays = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(State)}
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **arrays)
    fname = path if path.endswith(".npz") else path + ".npz"
    meta = {
        "nsteps_total": nsteps_total,
        "nx": cfg.nx, "ny": cfg.ny, "km": cfg.km, "nt": cfg.nt,
        "dtype": cfg.dtype,
    }
    with open(fname + ".json", "w") as f:
        json.dump(meta, f)
    pdir = pointer_dir or os.path.dirname(os.path.abspath(fname))
    with open(os.path.join(pdir, POINTER_FILE), "w") as f:
        f.write(fname + "\n")
    return fname


def read_restart(path: str, cfg: ModelConfig) -> Tuple[State, int]:
    """Read a checkpoint (or follow a pointer file/directory); returns
    (state, nsteps_total). Shapes are validated against the config."""
    if os.path.isdir(path):
        with open(os.path.join(path, POINTER_FILE)) as f:
            path = f.read().strip()
    data = np.load(path)
    with open(path + ".json") as f:
        meta = json.load(f)
    for dim in ("nx", "ny", "km", "nt"):
        if meta[dim] != getattr(cfg, dim):
            raise ValueError(
                f"restart {dim}={meta[dim]} != config {getattr(cfg, dim)}")
    dt = cfg.jnp_dtype
    kwargs = {}
    for f_ in dataclasses.fields(State):
        arr = data[f_.name]
        kwargs[f_.name] = jnp.asarray(
            arr, dt if np.issubdtype(arr.dtype, np.floating) else None)
    return State(**kwargs), int(meta["nsteps_total"])
