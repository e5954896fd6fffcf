"""POP grid-file I/O tests (reference: source/grid.F90 readers).

Oracle: write the analytic internal grid out in POP file format, rebuild
from files, and compare the derived metrics against the internal build.
"""

import numpy as np

from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.io import grid_files


def _write_grid_files(tmp_path, cfg, grid):
    hg = str(tmp_path / "horiz_grid.ieeer8")
    vg = str(tmp_path / "vert_grid.txt")
    tp = str(tmp_path / "topography.ieeei4")
    grid_files.write_horiz_grid(hg, {
        "ULAT": np.asarray(grid.ULAT), "ULON": np.asarray(grid.ULON),
        "HTN": np.asarray(grid.HTN), "HTE": np.asarray(grid.HTE),
        "HUS": np.asarray(grid.HUS), "HUW": np.asarray(grid.HUW),
        "ANGLE": np.asarray(grid.ANGLE)})
    grid_files.write_vert_grid(vg, np.asarray(grid.vgrid.dz))
    grid_files.write_topography(tp, np.asarray(grid.KMT))
    return cfg.with_(horiz_grid="file", horiz_grid_file=hg,
                     vert_grid="file", vert_grid_file=vg,
                     topography="file", topography_file=tp)


def test_horiz_grid_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    fields = {n: rng.normal(size=(6, 5)) for n in grid_files.HORIZ_RECORDS}
    p = str(tmp_path / "hg")
    grid_files.write_horiz_grid(p, fields)
    back = grid_files.read_horiz_grid(p, 6, 5)
    for n in grid_files.HORIZ_RECORDS:
        np.testing.assert_array_equal(back[n], fields[n])
    # big-endian on disk: 7 records x 30 values x 8 bytes
    import os
    assert os.path.getsize(p) == 7 * 30 * 8
    raw = np.fromfile(p, dtype=">f8", count=30)
    np.testing.assert_array_equal(raw.reshape(6, 5), fields["ULAT"])


def test_topography_and_vert_roundtrip(tmp_path):
    kmt = np.arange(20, dtype=np.int32).reshape(4, 5) % 7
    p = str(tmp_path / "topo")
    grid_files.write_topography(p, kmt)
    np.testing.assert_array_equal(grid_files.read_topography(p, 4, 5), kmt)
    dz = np.array([1000.0, 2000.0, 4000.0])
    v = str(tmp_path / "vert")
    grid_files.write_vert_grid(v, dz)
    np.testing.assert_allclose(grid_files.read_vert_grid(v, 3), dz)
    import pytest
    with pytest.raises(ValueError):
        grid_files.read_vert_grid(v, 5)
    with pytest.raises(ValueError):
        grid_files.read_topography(p, 10, 10)


def test_file_grid_matches_internal(tmp_path):
    cfg = get_config("mini")
    g0 = build_grid(cfg)
    cfg_f = _write_grid_files(tmp_path, cfg, g0)
    g1 = build_grid(cfg_f)

    for name in ("ULAT", "ULON", "HTN", "HTE", "HUS", "HUW", "ANGLE"):
        np.testing.assert_allclose(np.asarray(getattr(g1, name)),
                                   np.asarray(getattr(g0, name)),
                                   rtol=0, atol=1e-12, err_msg=name)
    np.testing.assert_allclose(np.asarray(g1.vgrid.dz),
                               np.asarray(g0.vgrid.dz), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(g1.KMT), np.asarray(g0.KMT))

    # derived metrics: DXU = <HTN>_e; on the uniform-in-longitude analytic
    # grid this equals HTN exactly
    np.testing.assert_allclose(np.asarray(g1.DXU), np.asarray(g0.DXU),
                               rtol=1e-12)
    # top row excluded: with a closed north boundary the reference's halo
    # is zero there, so the file path halves DYU on that (land) row
    np.testing.assert_allclose(np.asarray(g1.DYU)[:-1],
                               np.asarray(g0.DYU)[:-1], rtol=1e-12)
    # DXT from file path averages HTN in j (reference formula) while the
    # analytic path averages cosines -- identical up to roundoff except the
    # south land row
    np.testing.assert_allclose(np.asarray(g1.DXT)[1:],
                               np.asarray(g0.DXT)[1:], rtol=1e-9)
    # TLAT via Cartesian averaging vs analytic cell centers: agree to the
    # grid's quadratic curvature error; land cap rows excluded
    tl0 = np.asarray(g0.TLAT)[2:-2]
    tl1 = np.asarray(g1.TLAT)[2:-2]
    assert np.abs(tl1 - tl0).max() < 3e-3


def test_model_runs_from_file_grid(tmp_path):
    from pop2_tpu.model import Model
    cfg = get_config("mini")
    g0 = build_grid(cfg)
    cfg_f = _write_grid_files(tmp_path, cfg, g0)
    m = Model(cfg_f)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    d = m.diagnostics(st)
    assert np.isfinite(d["KE"]) and d["KE"] > 0


def test_pop_binary_field_roundtrip(tmp_path):
    """General POP-binary field writer/reader (source/io_binary.F90):
    direct-access nx*ny records + .hdr record map; 2-D and 3-D fields."""
    from pop2_tpu.io import pop_binary
    ny, nx, km = 12, 16, 5
    rng = np.random.RandomState(0)
    fields = {"SSH": rng.randn(ny, nx),
              "TEMP": rng.randn(km, ny, nx),
              "KMTmask": rng.randint(0, 2, (ny, nx)).astype(float)}
    p = str(tmp_path / "hist.bin")
    pop_binary.write_pop_binary(p, ny, nx, fields,
                                attrs={"title": "test stream"})
    back = pop_binary.read_pop_binary(p, ny, nx)
    assert set(back) == set(fields)
    for k in fields:
        np.testing.assert_array_equal(back[k], fields[k])
    # raw record layout is exactly nx*ny big-endian doubles in order
    raw = np.fromfile(p, dtype=">f8")
    assert raw.size == (1 + km + 1) * ny * nx
    np.testing.assert_array_equal(raw[:ny * nx].reshape(ny, nx),
                                  fields["SSH"])
    import pytest
    with pytest.raises(FileNotFoundError):
        pop_binary.read_pop_binary(str(tmp_path / "nohdr.bin"), ny, nx)
