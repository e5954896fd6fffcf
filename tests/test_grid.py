"""Grid generation tests, using closed-form oracles in the style of the
reference's unit tests (test/unit/*, SURVEY.md §4.1)."""

import numpy as np

from pop2_tpu import constants as const


def test_vertical_grid_integrates_to_5500m(test_grid):
    zw = np.asarray(test_grid.vgrid.zw)
    assert abs(zw[-1] * const.MPERCM - 5500.0) / 5500.0 < 0.01
    dz = np.asarray(test_grid.vgrid.dz)
    # surface layer ~25 m, deep layers approach 400 m
    # (source/grid.F90:1565-1568)
    assert abs(dz[0] * const.MPERCM - 25.0) < 1.0
    assert dz[-1] * const.MPERCM < 400.0 + 1e-6
    assert np.all(np.diff(dz) >= 0)


def test_vertical_derived_quantities(test_grid):
    vg = test_grid.vgrid
    dz = np.asarray(vg.dz)
    dzw = np.asarray(vg.dzw)
    zt = np.asarray(vg.zt)
    zw = np.asarray(vg.zw)
    km = dz.shape[0]
    assert dzw[0] == 0.5 * dz[0]
    np.testing.assert_allclose(dzw[1:km], 0.5 * (dz[:-1] + dz[1:]))
    np.testing.assert_allclose(zw, np.cumsum(dz))
    np.testing.assert_allclose(zt[1:] - zt[:-1], dzw[1:km])


def test_horiz_metrics_match_latlon_formulas(test_cfg, test_grid):
    ny, nx = test_cfg.ny, test_cfg.nx
    dlat = 180.0 / ny
    dlon = 360.0 / nx
    ULAT = np.asarray(test_grid.ULAT)
    # ULAT(j) = -90 + (j+1)*dlat degrees (source/grid.F90:1240-1242)
    expect = (-90.0 + (np.arange(1, ny + 1)) * dlat) / const.RADIAN
    np.testing.assert_allclose(ULAT[:, 0], expect)
    # HTN = dlon*radius*cos(ULAT) (source/grid.F90:1281)
    HTN = np.asarray(test_grid.HTN)
    np.testing.assert_allclose(
        HTN[5, :], dlon * const.RADIUS / const.RADIAN * np.cos(ULAT[5, 0]))
    # areas positive, reciprocals consistent
    np.testing.assert_allclose(
        np.asarray(test_grid.TAREA) * np.asarray(test_grid.TAREA_R), 1.0)


def test_topography_masks(test_cfg, test_grid):
    KMT = np.asarray(test_grid.KMT)
    KMU = np.asarray(test_grid.KMU)
    km = test_cfg.km
    # flat bottom: ocean points have KMT == km (source/grid.F90:880-884)
    assert set(np.unique(KMT)) <= {0, km}
    # poleward of 75 deg is land (source/grid.F90:1985)
    ULAT = np.asarray(test_grid.ULAT) * const.RADIAN
    assert np.all(KMT[np.abs(ULAT) > 76.0] == 0)
    # KMU is min of 4 neighbors => KMU <= KMT
    assert np.all(KMU <= KMT)
    # ocean exists
    assert KMT.max() == km
    # 3-D masks consistent with KMT
    kmask_t = np.asarray(test_grid.kmask_t)
    assert kmask_t.sum() == KMT.sum()


def test_coriolis(test_grid):
    FCOR = np.asarray(test_grid.FCOR)
    ULAT = np.asarray(test_grid.ULAT)
    np.testing.assert_allclose(FCOR, 2 * const.OMEGA * np.sin(ULAT))


def test_del2_coeff_conservation(test_grid):
    """Tracer del2 stencil: interior column sums of (DTN+DTS+DTE+DTW) weighted
    by area telescope (conservation); here just check positivity and
    reciprocity DTS(j) == DTN(j-1)*TAREA_R(j)/TAREA_R(j-1)."""
    DTN = np.asarray(test_grid.DTN)
    DTS = np.asarray(test_grid.DTS)
    TAREA = np.asarray(test_grid.TAREA)
    # flux leaving cell j north == flux entering cell j+1 from south:
    # DTN(j)*TAREA(j) == DTS(j+1)*TAREA(j+1)  (symmetric operator)
    lhs = (DTN * TAREA)[5:-6, :]
    rhs = (DTS * TAREA)[6:-5, :]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
    assert np.all(DTN[2:-2, :] > 0)


def test_btrop_weights_symmetric(test_grid):
    """The 9-pt operator must be symmetric: E/N/NE weights shared between
    neighboring cells via shifts (source/POP_SolversMod.F90:2414-2424)."""
    C = np.asarray(test_grid.btrop_c_indep)
    NE = np.asarray(test_grid.btrop_ne)
    N = np.asarray(test_grid.btrop_n)
    E = np.asarray(test_grid.btrop_e)
    # center weight equals minus sum of the 4 distinct off-diagonal weights
    # evaluated with the shifts used in assembly
    recon = -(NE + np.roll(NE, 1, 0) + np.roll(NE, 1, 1)
              + np.roll(NE, (1, 1), (0, 1)))
    interior = np.zeros_like(C, dtype=bool)
    interior[2:-2, 2:-2] = True
    # C = -(NE + ase + anw + asw); ase etc involve x/y splits — just verify
    # magnitudes are commensurate and C < 0 over ocean interior
    ocean = np.asarray(test_grid.RCALCT) > 0
    sel = interior & ocean & (np.abs(recon) > 0)
    assert np.all(C[sel] < 0)


def test_smooth_topography_smooths_rough_bathymetry(tmp_path):
    """n_topo_smooth (smooth_topography, source/grid.F90:2393-2530):
    9-pt averaging of a rough depth field reduces depth variance while
    keeping land land."""
    import numpy as np
    from pop2_tpu.config import get_config
    from pop2_tpu.grid import build_grid
    from pop2_tpu.io import grid_files

    cfg0 = get_config("mini")
    rng = np.random.RandomState(3)
    kmt = rng.randint(3, cfg0.km + 1, size=(cfg0.ny, cfg0.nx))
    kmt[:2, :] = 0
    kmt[-2:, :] = 0
    path = str(tmp_path / "topo")
    grid_files.write_topography(path, kmt.astype(np.int32))

    mk = lambda n: build_grid(cfg0.with_(  # noqa: E731
        topography="file", topography_file=path, flat_bottom=False,
        n_topo_smooth=n))
    g0, g2 = mk(0), mk(2)
    k0 = np.asarray(g0.KMT)
    k2 = np.asarray(g2.KMT)
    # land stays land
    assert ((k0 == 0) == (k2 == 0)).all()
    # smoothing reduced the depth roughness (neighbor-difference variance)
    def rough(k):
        d = k.astype(float)
        return np.abs(np.diff(d, axis=1))[k[:, :-1] > 0].mean()
    assert rough(k2) < rough(k0)
    assert k2.min() >= 0 and k2.max() <= cfg0.km
