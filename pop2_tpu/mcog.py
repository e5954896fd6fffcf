"""Multi-column ocean grid (per-ice-category coupler fluxes).

Reference: ``source/mcog.F90`` — the coupler optionally delivers shortwave
and fraction per ice-thickness category; MCOG keeps per-category columns
for the surface fluxes, aggregates them with the category fractions, and
provides per-category diagnostics. Here: the aggregation/normalization
core as pure functions (the per-category tavg columns map onto the field
registry)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_fractions(frac_cat, eps: float = 1.0e-12):
    """Category fractions (ncat, ny, nx) normalized to sum to 1 over the
    categories present (mcog.F90 frac normalization)."""
    tot = jnp.sum(frac_cat, axis=0, keepdims=True)
    return jnp.where(tot > eps, frac_cat / jnp.maximum(tot, eps),
                     jnp.zeros_like(frac_cat))


def aggregate(frac_cat, field_cat):
    """Fraction-weighted aggregate of a per-category field: the mean flux
    the single-column ocean physics sees (mcog.F90 mcog_aggregate)."""
    w = normalize_fractions(frac_cat)
    return jnp.sum(w * field_cat, axis=0)


def per_category_anomaly(frac_cat, field_cat):
    """Per-category deviation from the aggregate (diagnostic columns)."""
    agg = aggregate(frac_cat, field_cat)
    return field_cat - agg[None]
