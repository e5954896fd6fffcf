"""Abiotic DIC/DIC14 + carbonate chemistry tests."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu.co2calc import co2calc_surface
from pop2_tpu.config import get_config
from pop2_tpu.model import Model


def test_co2calc_known_values():
    """CO2SYS-style check: T=20C, S=35, DIC=2050, TA=2300 umol/kg."""
    r = co2calc_surface(jnp.asarray(20.0), jnp.asarray(35.0),
                        jnp.asarray(2050e-6), jnp.asarray(2300e-6))
    assert 7.95 < float(r.ph) < 8.10
    assert 350.0 < float(r.pco2) < 480.0
    # alkalinity closure: recompute TA from the solved H
    from pop2_tpu import co2calc as cc
    c = cc.surface_coeffs(jnp.asarray(20.0), jnp.asarray(35.0))
    ta_back = cc._ta_of_h(r.h, jnp.asarray(2050e-6), c, 0.0, 0.0)
    np.testing.assert_allclose(float(ta_back), 2300e-6, rtol=1e-8)


def test_co2calc_monotonicity():
    t, s, ta = jnp.asarray(15.0), jnp.asarray(34.0), jnp.asarray(2250e-6)
    p1 = float(co2calc_surface(t, s, jnp.asarray(1950e-6), ta).pco2)
    p2 = float(co2calc_surface(t, s, jnp.asarray(2050e-6), ta).pco2)
    assert p2 > p1                       # more DIC -> more pCO2
    warm = float(co2calc_surface(jnp.asarray(25.0), s,
                                 jnp.asarray(1950e-6), ta).pco2)
    assert warm > p1                     # warmer -> more pCO2


def test_abio_dic_uptake_and_decay():
    cfg = get_config("mini").with_(nt=4, passive_tracers=("abio_dic",))
    m = Model(cfg)
    st = m.initial_state()
    ny, nx = cfg.ny, cfg.nx
    f = m.forcing.replace(u10_sqr=jnp.full((ny, nx), (7.0e2) ** 2),
                          ifrac=jnp.zeros((ny, nx)))
    dic0 = float(jnp.sum(jnp.where(m.grid.kmask_t, st.tracer_cur[2], 0.0)))
    for _ in range(6):
        st, _ = m.advance(st, forcing=f)
    assert np.isfinite(np.asarray(st.tracer_cur[2:])).all()
    dic1 = float(jnp.sum(jnp.where(m.grid.kmask_t, st.tracer_cur[2], 0.0)))
    # initial DIC=2.0 mol/m^3 is undersaturated vs 284.7 uatm at these
    # temperatures in some regions; total change must be active
    assert dic1 != dic0
    # DIC14 decays relative to DIC in the deep (no flux there)
    r = np.asarray(st.tracer_cur[3, -1]) / np.maximum(
        np.asarray(st.tracer_cur[2, -1]), 1e-12)
    ocean_deep = np.asarray(m.grid.kmask_t[-1])
    assert (r[ocean_deep] <= 1.0 + 1e-12).all()
