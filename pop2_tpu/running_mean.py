"""Generic exponential running-mean service.

Reference: ``source/running_mean_mod.F90`` — named variables with a
timescale, updated each step as X <- (1 - dt/tau) X + (dt/tau) x, with
restart save/restore of the accumulators. Pytree-friendly: the state is a
dict of arrays the caller carries (so it can live inside or outside jit).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


class RunningMeans:
    """Registry of named running means (running_mean_define_var :214,
    update :175, get :295)."""

    def __init__(self, dt_seconds: float):
        self.dt = float(dt_seconds)
        self.timescales: Dict[str, float] = {}
        self.values: Dict[str, jnp.ndarray] = {}

    def define(self, name: str, timescale_seconds: float, init_value):
        self.timescales[name] = float(timescale_seconds)
        self.values[name] = jnp.asarray(init_value)

    def update(self, name: str, sample) -> jnp.ndarray:
        """One-step exponential update; returns the new mean."""
        tau = self.timescales[name]
        w = min(self.dt / tau, 1.0)
        new = (1.0 - w) * self.values[name] + w * jnp.asarray(sample)
        self.values[name] = new
        return new

    def get(self, name: str) -> jnp.ndarray:
        return self.values[name]

    def save(self) -> Dict[str, np.ndarray]:
        """Accumulator checkpoint (running_mean write/read restart)."""
        return {k: np.asarray(v) for k, v in self.values.items()}

    def restore(self, data: Dict[str, np.ndarray]) -> None:
        for k, v in data.items():
            if k in self.values:
                self.values[k] = jnp.asarray(v)
