"""Coupler adapter tests: unit conversions and roundtrip sanity."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import coupled
from pop2_tpu.config import get_config
from pop2_tpu.forcing import restoring_forcing
from pop2_tpu.model import Model


def test_import_wind_stress_conversion(mini_cfg, mini_grid):
    ny, nx = mini_cfg.ny, mini_cfg.nx
    x2o = {"taux": jnp.full((ny, nx), 0.1)}  # 0.1 N/m^2
    f = coupled.ocn_import(mini_cfg, mini_grid, x2o)
    ocean = np.asarray(mini_grid.RCALCT) > 0
    # 0.1 N/m^2 * momentum_factor(10) = 1 dyn/cm^2-equivalent
    np.testing.assert_allclose(np.asarray(f.smft[0])[ocean], 1.0)
    assert np.asarray(f.smft[0])[~ocean].max() == 0.0


def test_import_heat_flux_conversion(mini_cfg, mini_grid):
    ny, nx = mini_cfg.ny, mini_cfg.nx
    x2o = {"swnet": jnp.full((ny, nx), 200.0),   # W/m^2
           "sen": jnp.full((ny, nx), -15.0)}
    f = coupled.ocn_import(mini_cfg, mini_grid, x2o)
    ocean = np.asarray(mini_grid.RCALCT) > 0
    np.testing.assert_allclose(np.asarray(f.shf_qsw)[ocean],
                               200.0 * const.HFLUX_FACTOR, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f.stf[0])[ocean],
                               -15.0 * const.HFLUX_FACTOR, rtol=1e-12)


def test_import_freshwater_as_salt_flux(mini_cfg, mini_grid):
    ny, nx = mini_cfg.ny, mini_cfg.nx
    x2o = {"rain": jnp.full((ny, nx), 1.0e-4)}  # kg/m^2/s
    f = coupled.ocn_import(mini_cfg, mini_grid, x2o)
    ocean = np.asarray(mini_grid.RCALCT) > 0
    np.testing.assert_allclose(np.asarray(f.stf[1])[ocean],
                               1.0e-4 * const.SALINITY_FACTOR, rtol=1e-12)
    assert const.SALINITY_FACTOR < 0  # fresh water dilutes


def test_export_units(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    o2x = coupled.ocn_export(mini_cfg, m.grid, st)
    ocean = np.asarray(m.grid.RCALCT) > 0
    sst_k = np.asarray(o2x["So_t"])[ocean]
    assert (sst_k > 250).all() and (sst_k < 320).all()   # Kelvin
    sss = np.asarray(o2x["So_s"])[ocean]
    assert (sss > 30).all() and (sss < 40).all()          # psu
    assert np.abs(np.asarray(o2x["So_u"])).max() < 10.0   # m/s


def test_coupled_forcing_drives_model(mini_cfg, mini_grid):
    m = Model(mini_cfg)
    ny, nx = mini_cfg.ny, mini_cfg.nx
    x2o = {"taux": jnp.full((ny, nx), 0.1),
           "swnet": jnp.full((ny, nx), 100.0)}
    f = coupled.ocn_import(mini_cfg, m.grid, x2o)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st, forcing=f)
    assert np.isfinite(m.diagnostics(st)["KE"])
    assert m.diagnostics(st)["KE"] > 0


def test_restoring_forcing(mini_cfg, mini_grid):
    m = Model(mini_cfg)
    st = m.initial_state()
    sst_target = st.tracer_cur[0, 0] + 2.0  # restore 2 degrees warmer
    f = restoring_forcing(mini_cfg, m.grid, m.forcing,
                          sst_data=sst_target, state_sst=st.tracer_cur[0, 0])
    ocean = np.asarray(m.grid.RCALCT) > 0
    assert (np.asarray(f.stf[0])[ocean] > 0).all()  # warming flux
