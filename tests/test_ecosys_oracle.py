"""Golden-value oracle for the native BGC interior tendency.

tests/reference_oracle/oecosys.py is an independent per-column NumPy
re-derivation of the documented BEC/MARBL-parity equation set (MARBL's
Fortran is an external repo unavailable in this image — see the oracle's
docstring); the whole-field jnp implementation must match it column by
column to fp64 round-off. This pins the vectorization — broadcasts, the
light cumulative, the sinking-particle scan, burial modes, masking —
exactly the error class a transliteration oracle pins for KPP/GM.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import ecosys
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from tests.reference_oracle import oecosys


def _setup(lburial=True):
    cfg = get_config("mini").with_(
        dtype="float64", nt=2 + len(ecosys.TRACER_NAMES),
        flat_bottom=False,
        passive_tracers=())
    grid = build_grid(cfg)
    pkg = ecosys.Ecosystem(lburial=lburial)
    pkg.slot0 = 2
    return cfg, grid, pkg


@pytest.mark.parametrize("lburial", [True, False])
def test_interior_tendency_matches_column_oracle(lburial):
    cfg, grid, pkg = _setup(lburial)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    rng = np.random.RandomState(42)

    # physical-magnitude random state: init values perturbed 50%
    base = pkg.init_values(cfg, grid)
    pert = base * rng.uniform(0.5, 1.5, base.shape)
    tracers = np.zeros((cfg.nt, km, ny, nx))
    zt = np.asarray(grid.vgrid.zt)[:, None, None] * 0.01
    tracers[0] = (25.0 * np.exp(-zt / 800.0)
                  + rng.randn(km, ny, nx)) * np.asarray(grid.kmask_t)
    tracers[1] = 0.035
    tracers[2:] = pert
    tracers_j = jnp.asarray(tracers)

    import types
    from pop2_tpu import constants as const
    qsw_wm2 = np.maximum(150.0 + 80.0 * rng.randn(ny, nx), 0.0)
    forcing = types.SimpleNamespace(
        shf_qsw=jnp.asarray(qsw_wm2 * const.HFLUX_FACTOR))

    got = np.asarray(pkg.set_interior(cfg, grid, tracers_j, tracers_j,
                                      forcing=forcing))

    dz = np.asarray(grid.vgrid.dz)
    kmt = np.asarray(grid.KMT)
    ht = np.asarray(grid.HT)
    # a spread of columns: deep, shelf, near-land
    cols = [(j, i) for j in range(2, ny, 5) for i in range(1, nx, 7)]
    checked = 0
    for (j, i) in cols:
        if kmt[j, i] == 0:
            continue
        want = oecosys.interior_column(
            tracers[2:, :, j, i], tracers[0, :, j, i], qsw_wm2[j, i],
            dz, int(kmt[j, i]), float(ht[j, i]), lburial=lburial)
        np.testing.assert_allclose(
            got[:, :, j, i], want, rtol=1e-9, atol=1e-22,
            err_msg=f"column ({j},{i}) kmt={kmt[j, i]}")
        checked += 1
    assert checked >= 10
