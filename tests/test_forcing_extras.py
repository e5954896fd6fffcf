"""Interior restoring, geothermal flux, damping, and time interpolation."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu.config import get_config
from pop2_tpu.forcing_tools import (MonthlyClimatology, midmonth_hours,
                                    HOURS_PER_YEAR)
from pop2_tpu.model import Model


def test_midmonth_times():
    te = midmonth_hours("monthly-equal")
    assert te.shape == (12,)
    np.testing.assert_allclose(np.diff(te), HOURS_PER_YEAR / 12.0)
    tc = midmonth_hours("monthly-calendar")
    np.testing.assert_allclose(tc[0], 31 * 24 / 2.0)
    np.testing.assert_allclose(tc[-1], (365 - 31 + 365) * 24 / 2.0)


def test_linear_interp_exact_at_midpoints_and_between():
    data = jnp.arange(12.0).reshape(12, 1, 1)
    clim = MonthlyClimatology.create(data, interp="linear")
    t = midmonth_hours()
    # exact at data points
    np.testing.assert_allclose(float(clim.at(t[3])[0, 0]), 3.0, atol=1e-12)
    # halfway between months 3 and 4
    np.testing.assert_allclose(float(clim.at(0.5 * (t[3] + t[4]))[0, 0]),
                               3.5, atol=1e-12)
    # periodic wrap: halfway between Dec mid and Jan mid (over new year)
    tmid = 0.5 * (t[11] + t[0] + HOURS_PER_YEAR)
    np.testing.assert_allclose(float(clim.at(tmid)[0, 0]), 5.5, atol=1e-12)
    # next year gives identical values
    np.testing.assert_allclose(float(clim.at(t[6] + HOURS_PER_YEAR)[0, 0]),
                               6.0, atol=1e-12)


def test_4point_reproduces_cubic():
    """Neville interpolation through 4 points is exact for cubics."""
    t = midmonth_hours()
    coeffs = (0.3, -2.0e-4, 5.0e-8, -1.0e-12)

    def poly(x):
        return coeffs[0] + coeffs[1] * x + coeffs[2] * x**2 + coeffs[3] * x**3

    data = jnp.asarray(poly(t)).reshape(12, 1, 1)
    clim = MonthlyClimatology.create(data, interp="4point")
    for tq in (0.5 * (t[4] + t[5]), t[6] + 100.0):
        np.testing.assert_allclose(float(clim.at(tq)[0, 0]), poly(tq),
                                   rtol=1e-9)


def test_nearest_interp():
    data = jnp.arange(12.0).reshape(12, 1, 1)
    clim = MonthlyClimatology.create(data, interp="nearest")
    t = midmonth_hours()
    assert float(clim.at(t[2] + 1.0)[0, 0]) == 2.0
    assert float(clim.at(t[3] - 1.0)[0, 0]) == 3.0


def test_interior_restoring_pulls_tracer(mini_cfg):
    cfg = mini_cfg.with_(pt_interior_restore_tau_days=1.0,
                        pt_interior_restore_max_level=mini_cfg.km,
                        pt_interior_surface_restore=True)
    m = Model(cfg)
    st = m.initial_state()
    target = st.tracer_cur[0] + 1.0  # restore 1 degC warmer everywhere
    f = m.forcing.replace(pt_interior_data=target)
    t0 = float(jnp.sum(st.tracer_cur[0] * m.grid.kmask_t))
    for _ in range(5):
        st, _ = m.advance(st, forcing=f)
    t1 = float(jnp.sum(st.tracer_cur[0] * m.grid.kmask_t))
    assert t1 > t0  # warming toward target

    # restoring off below max_level: with max_level=1 only the surface
    # (which is excluded unless surface_restore) contributes
    cfg2 = mini_cfg.with_(pt_interior_restore_tau_days=1.0,
                         pt_interior_restore_max_level=1,
                         pt_interior_surface_restore=False)
    m2 = Model(cfg2)
    st2 = m2.initial_state()
    f2 = m2.forcing.replace(pt_interior_data=target)
    stA, _ = m2.advance(st2, forcing=f2)
    m2b = Model(cfg2)  # fresh model: advance() counts steps internally
    stB, _ = m2b.advance(st2, forcing=m2b.forcing)
    np.testing.assert_allclose(np.asarray(stA.tracer_cur[0]),
                               np.asarray(stB.tracer_cur[0]), atol=1e-13)


def test_geothermal_heats_bottom(mini_cfg):
    cfg = mini_cfg.with_(geoheatflux_const=0.05, geoheatflux_depth=0.0)
    m = Model(cfg)
    m0 = Model(mini_cfg)
    st = m.initial_state()
    s1 = s0 = st
    for _ in range(5):
        s1, _ = m.advance(s1)
        s0, _ = m0.advance(s0)
    dz = m.grid.vgrid.dz[:, None, None]
    heat1 = float(jnp.sum(s1.tracer_cur[0] * m.grid.kmask_t * dz
                          * m.grid.TAREA))
    heat0 = float(jnp.sum(s0.tracer_cur[0] * m.grid.kmask_t * dz
                          * m.grid.TAREA))
    # added heat = flux * area * time (degC cm^3 budget)
    nsteps_heat = 0.05 * const.HFLUX_FACTOR * float(
        jnp.sum(m.grid.RCALCT * m.grid.TAREA))
    assert heat1 > heat0
    added_per_sec = (heat1 - heat0) / (5 * cfg.time.dtt)
    np.testing.assert_allclose(added_per_sec, nsteps_heat, rtol=0.3)


def test_damping_reduces_velocity(mini_cfg):
    m1 = Model(mini_cfg.with_(ldamp_uv=True))
    m0 = Model(mini_cfg)
    s1, _ = m1.advance(m1.initial_state())
    s0, _ = m0.advance(m0.initial_state())
    ke1 = float(jnp.sum(s1.u_cur ** 2 + s1.v_cur ** 2))
    ke0 = float(jnp.sum(s0.u_cur ** 2 + s0.v_cur ** 2))
    assert ke1 <= ke0


def test_file_wind_stress(tmp_path, mini_cfg, mini_grid):
    """Round-trip a POP-format monthly wind-stress file and interpolate:
    at a mid-month hour the field reproduces that month's record."""
    import jax.numpy as jnp
    from pop2_tpu import forcing as fmod
    from pop2_tpu.forcing_tools import midmonth_hours

    cfg, grid = mini_cfg, mini_grid
    ny, nx = cfg.ny, cfg.nx
    rng = np.random.RandomState(8)
    taux = rng.randn(12, ny, nx)
    tauy = rng.randn(12, ny, nx)
    rec = np.stack([taux, tauy], axis=1).astype(">f8")
    path = str(tmp_path / "ws.ieeer8")
    rec.tofile(path)

    tx, ty = fmod.read_ws_file(path, ny, nx)
    np.testing.assert_array_equal(tx, taux)

    base = fmod.analytic_forcing(cfg, grid)
    hours = midmonth_hours()
    f = fmod.file_wind_stress(cfg, grid, base, tx, ty, float(hours[3]))
    rcalcu = np.asarray(grid.RCALCU)
    np.testing.assert_allclose(np.asarray(f.smf[0]), taux[3] * rcalcu,
                               rtol=1e-12)
    # halfway between month 3 and 4 midpoints: the average
    tmid = 0.5 * (hours[3] + hours[4])
    f2 = fmod.file_wind_stress(cfg, grid, base, tx, ty, float(tmid))
    np.testing.assert_allclose(np.asarray(f2.smf[0]),
                               0.5 * (taux[3] + taux[4]) * rcalcu,
                               rtol=1e-10)


def test_timeseries_reader(tmp_path):
    """TimeSeries: interpolation, endpoint clamping, file round-trip
    (forcing_timeseries_mod.F90 semantics)."""
    from pop2_tpu.forcing_tools import TimeSeries
    years = np.array([1850.0, 1900.0, 1950.0, 2000.0])
    vals = np.array([285.0, 296.0, 311.0, 369.0])
    ts = TimeSeries.create(years, vals)
    np.testing.assert_allclose(float(ts.at(1900.0)), 296.0)
    np.testing.assert_allclose(float(ts.at(1925.0)), 303.5)
    np.testing.assert_allclose(float(ts.at(1700.0)), 285.0)   # clamp low
    np.testing.assert_allclose(float(ts.at(2100.0)), 369.0)   # clamp high

    path = str(tmp_path / "co2.txt")
    np.savetxt(path, np.column_stack([years, vals]))
    ts2 = TimeSeries.from_file(path)
    np.testing.assert_allclose(float(ts2.at(1975.0)), 340.0)

    # vector-valued series (e.g. per-hemisphere CFC mole fractions)
    vv = np.stack([vals, vals * 0.9], axis=1)
    ts3 = TimeSeries.create(years, vv)
    out = np.asarray(ts3.at(1925.0))
    np.testing.assert_allclose(out, [303.5, 303.5 * 0.9])


def test_timeseries_extrapolate_taxmode():
    """taxmode='extrapolate' continues the end-segment slopes
    (forcing_timeseries_mod.F90); 'extend' clamps."""
    import numpy as np
    from pop2_tpu.forcing_tools import TimeSeries
    ts = TimeSeries.create([2000.0, 2001.0, 2002.0], [1.0, 2.0, 4.0])
    assert float(ts.at(1999.0)) == 1.0                       # extend clamps
    assert float(ts.at(2003.0)) == 4.0
    assert float(ts.at(1999.0, taxmode="extrapolate")) == 0.0  # slope 1/yr
    assert float(ts.at(2003.0, taxmode="extrapolate")) == 6.0  # slope 2/yr
    assert float(ts.at(2001.5, taxmode="extrapolate")) == 3.0  # interior same
