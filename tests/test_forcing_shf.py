"""Bulk-NCEP / Barnier surface heat flux tests."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import forcing_shf as shf
from pop2_tpu.config import get_config
from pop2_tpu.model import Model


def test_cdn_magnitude():
    # neutral drag ~1e-3 at moderate winds (Large & Pond)
    for u, lo, hi in ((5.0, 1.0e-3, 1.4e-3), (10.0, 1.1e-3, 1.6e-3)):
        c = float(shf.cdn(jnp.asarray(u)))
        assert lo < c < hi


def test_sen_lat_flux_signs():
    """Cold dry air over warm water -> ocean loses heat (negative fluxes);
    warm moist air over cold water -> sensible flux into the ocean."""
    us = jnp.full((4, 4), 8.0)
    sst = jnp.full((4, 4), 20.0)
    tair_cold = jnp.full((4, 4), 273.0)
    qair_dry = jnp.full((4, 4), 0.002)
    hs, hl = shf.sen_lat_flux(us, sst, tair_cold, qair_dry)
    assert float(hs.mean()) < 0.0      # sensible loss
    assert float(hl.mean()) < 0.0      # evaporative loss
    assert -1500.0 < float(hl.mean()) < 0.0   # sane magnitude

    tair_warm = jnp.full((4, 4), 303.0)
    qair_wet = jnp.full((4, 4), 0.025)
    hs2, hl2 = shf.sen_lat_flux(us, jnp.full((4, 4), 5.0), tair_warm,
                                qair_wet)
    assert float(hs2.mean()) > 0.0


def test_bulk_ncep_drives_model(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    ny, nx = mini_cfg.ny, mini_cfg.nx
    data = {
        "windspd": jnp.full((ny, nx), 7.0),
        "tair": jnp.full((ny, nx), 283.0),
        "qair": jnp.full((ny, nx), 0.006),
        "qsw": jnp.full((ny, nx), 180.0),
        "cldfrac": jnp.full((ny, nx), 0.5),
        "sst": st.tracer_cur[0, 0] + 0.5,
    }
    stf_t, qsw = shf.bulk_ncep(mini_cfg, m.grid, st.tracer_cur[0, 0], data)
    assert np.isfinite(np.asarray(stf_t)).all()
    assert float(jnp.max(qsw)) > 0.0
    f = m.forcing.replace(stf=m.forcing.stf.at[0].set(stf_t), shf_qsw=qsw)
    for _ in range(3):
        st, _ = m.advance(st, forcing=f)
    assert np.isfinite(m.diagnostics(st)["KE"])


def test_barnier_restoring_direction(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    sst = st.tracer_cur[0, 0]
    tau = jnp.full(sst.shape, 30.0 * 86400.0)
    stf_t, _ = shf.barnier_restoring(mini_cfg, m.grid, sst, sst + 2.0, tau)
    ocean = np.asarray(m.grid.RCALCT) > 0
    assert (np.asarray(stf_t)[ocean] > 0).all()
    # tau <= 0 disables
    stf0, _ = shf.barnier_restoring(mini_cfg, m.grid, sst, sst + 2.0,
                                    jnp.zeros_like(tau))
    assert float(jnp.abs(stf0).max()) == 0.0
