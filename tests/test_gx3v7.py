"""gx3v7 end-to-end: generated gx-class input files through the file-grid
readers into a production-physics run (KPP + GM + aniso), exercising the
same code path the real gx3v7 inputdata would
(input_templates/gx3v7_domain_size.F90, source/grid.F90:1314,2032)."""

import numpy as np
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.gridgen import generate_gx_files
from pop2_tpu.grid import build_grid


@pytest.fixture(scope="module")
def gx3_files(tmp_path_factory):
    out = tmp_path_factory.mktemp("gx3")
    return generate_gx_files(str(out), nx=100, ny=116, km=60)


def _cfg(gx3_files):
    return get_config("gx3v7").with_(
        horiz_grid_file=gx3_files["horiz"],
        vert_grid_file=gx3_files["vert"],
        topography_file=gx3_files["topo"])


def test_gx3_grid_builds(gx3_files):
    cfg = _cfg(gx3_files)
    grid = build_grid(cfg)
    kmt = np.asarray(grid.KMT)
    frac = (kmt > 0).mean()
    assert 0.45 < frac < 0.85, f"ocean fraction {frac}"
    assert kmt.max() == cfg.km                      # abyssal plain reaches km
    zw = np.asarray(grid.vgrid.zw)
    assert 5.0e5 < zw[-1] < 6.0e5                   # ~5500 m column
    # equatorial refinement made it into the metrics: dy smaller at the
    # equator than at midlatitudes
    lat = np.asarray(grid.ULAT[:, 0]) * 180.0 / np.pi
    dy = np.asarray(grid.HTE[:, 0])
    eq = np.argmin(np.abs(lat))
    mid = np.argmin(np.abs(lat - 45.0))
    assert dy[eq] < 0.75 * dy[mid]


@pytest.mark.slow
def test_gx3_production_physics_run(gx3_files):
    """5 steps of the full production physics menu on the file grid:
    KPP + GM + anisotropic viscosity, stable and finite."""
    from pop2_tpu.model import Model
    cfg = _cfg(gx3_files)
    m = Model(cfg)
    st = m.initial_state()
    st = m.run(st, nsteps=5)
    d = m.diagnostics(st)
    assert all(np.isfinite(v) for v in d.values()), d
    assert d["KE"] < 100.0
    m.check_ke(st)
