"""Hydro sections, current meters, drifters."""

import numpy as np

from pop2_tpu import constants as const
from pop2_tpu.model import Model
from pop2_tpu.samplers import (CurrentMeters, Drifters, HydroSection,
                               nearest_column)


def test_nearest_column(mini_cfg, mini_grid):
    lat = np.asarray(mini_grid.TLAT) * const.RADIAN
    lon = np.asarray(mini_grid.TLON) * const.RADIAN
    j, i = nearest_column(mini_grid, float(lat[10, 7]), float(lon[10, 7]))
    assert (j, i) == (10, 7)


def test_hydro_section_profiles(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    sec = HydroSection(m.grid, [(-30.0, 10.0), (0.0, 10.0), (30.0, 10.0)])
    prof = sec.sample(st)
    assert prof["TEMP"].shape == (3, mini_cfg.km)
    t = np.asarray(prof["TEMP"])
    # stratified initial condition: surface warmer than bottom (ocean pts)
    assert (t[:, 0] >= t[:, -1] - 1e-9).all()
    s = np.asarray(prof["SALT"])
    assert ((s == 0.0) | ((s > 30) & (s < 40))).all()


def test_current_meters_series(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    cm = CurrentMeters(m.grid, [(-20.0, 40.0, 0), (10.0, 100.0, 2)])
    for _ in range(4):
        st, _ = m.advance(st)
        cm.sample(st)
    series = cm.series()
    assert series.shape == (4, 2, 2)
    assert np.isfinite(series).all()
    assert np.abs(series).max() > 0.0   # wind-driven flow recorded


def test_drifters_move_with_flow(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    dr = Drifters(mini_cfg, m.grid, [(-20.0, 40.0), (15.0, 120.0)])
    lat0, lon0 = dr.lat.copy(), dr.lon.copy()
    for _ in range(3):
        dr.advance(st, dt_seconds=20 * 86400.0)  # exaggerate motion
    moved = (np.abs(dr.lat - lat0) + np.abs(dr.lon - lon0)).max()
    assert moved > 0.0
    assert (np.abs(dr.lat) <= 90.0).all()
