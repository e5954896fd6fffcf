"""CFC/SF6 gas tracer tests (reference: cfc_mod.F90, sf6_mod.F90)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import gas_tracers as gt
from pop2_tpu.config import get_config
from pop2_tpu.model import Model


def test_schmidt_numbers_at_20C():
    """Wanninkhof 2014 tabulated values at 20 degC."""
    np.testing.assert_allclose(float(gt.schmidt_number("CFC11", 20.0)),
                               1179.0, rtol=2e-3)
    np.testing.assert_allclose(float(gt.schmidt_number("CFC12", 20.0)),
                               1188.0, rtol=2e-3)
    np.testing.assert_allclose(float(gt.schmidt_number("SF6", 20.0)),
                               1028.0, rtol=2e-3)


def test_solubility_monotone_decreasing_in_T():
    """Gas solubility decreases with temperature (Warner & Weiss 1985)."""
    t = jnp.linspace(-2.0, 35.0, 20)
    for name in ("CFC11", "CFC12", "SF6"):
        sol = np.asarray(gt.solubility_0(name, t, 35.0))
        assert (np.diff(sol) < 0).all(), name
        assert (sol > 0).all()
    # CFC11 ~ 0.0149 mol/l/atm at 10C, 35 psu (Warner & Weiss 1985)
    np.testing.assert_allclose(float(gt.solubility_0("CFC11", 10.0, 35.0)),
                               0.0149, rtol=0.05)


def test_hemisphere_blend():
    v = gt.blend_hemispheres(jnp.asarray([-30.0, -10.0, 0.0, 10.0, 30.0]),
                             nh=100.0, sh=50.0)
    np.testing.assert_allclose(np.asarray(v), [50.0, 50.0, 75.0, 100.0,
                                               100.0])


def test_cfc_uptake_in_model():
    """Starting from zero CFC, air-sea flux charges the surface ocean
    toward saturation; tracer stays non-negative and bounded by Csat."""
    cfg = get_config("mini").with_(nt=4, passive_tracers=("cfc",))
    m = Model(cfg)
    st = m.initial_state()
    ny, nx = cfg.ny, cfg.nx
    f = m.forcing.replace(u10_sqr=jnp.full((ny, nx), (8.0e2) ** 2),
                          ifrac=jnp.zeros((ny, nx)))
    assert float(jnp.abs(st.tracer_cur[2]).max()) == 0.0
    for _ in range(10):
        st, _ = m.advance(st, forcing=f)
    cfc11 = np.asarray(st.tracer_cur[2])
    ocean = np.asarray(m.grid.kmask_t)
    assert cfc11[ocean].max() > 0.0            # uptake happened
    # centered advection allows tiny undershoots; no systematic negatives
    assert cfc11[ocean].min() > -1e-4 * cfc11[ocean].max()
    assert (np.abs(cfc11[~ocean]) < 1e-300).all()
    # surface leads the interior
    surf = cfc11[0][np.asarray(m.grid.RCALCT) > 0]
    assert surf.mean() > cfc11[-1][np.asarray(m.grid.KMT) == cfg.km].mean()


def test_ice_cover_suppresses_flux():
    cfg = get_config("mini").with_(nt=4, passive_tracers=("cfc",))
    m = Model(cfg)
    st = m.initial_state()
    ny, nx = cfg.ny, cfg.nx
    base = dict(u10_sqr=jnp.full((ny, nx), (8.0e2) ** 2))
    f_open = m.forcing.replace(ifrac=jnp.zeros((ny, nx)), **base)
    f_ice = m.forcing.replace(ifrac=jnp.ones((ny, nx)), **base)
    flux_open = m.passive.set_sflux(cfg, m.grid, st.tracer_old,
                                    st.tracer_cur, f_open)
    flux_ice = m.passive.set_sflux(cfg, m.grid, st.tracer_old,
                                   st.tracer_cur, f_ice)
    assert float(jnp.abs(flux_ice).max()) == 0.0
    assert float(jnp.max(flux_open)) > 0.0
