"""Tidal mixing tests (reference: source/tidal_mixing.F90 + vmix_kpp)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import tidal_mixing
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.model import Model


def _cfg(**kw):
    base = dict(vmix="kpp", ltidal_mixing=True, tidal_energy_const=0.001)
    base.update(kw)
    return get_config("mini").with_(**base)


def test_vertical_func_normalized():
    """sum_k F(z_k) dzw_k over the interior column is 1, so the energy
    deposited integrates to Gamma*q*E (init_tidal_mixing2:1280-1299)."""
    cfg = _cfg()
    grid = build_grid(cfg)
    coef = tidal_mixing.build_tidal_coef(cfg, grid)
    dzw = np.asarray(grid.vgrid.dzw)[1:cfg.km + 1]
    kmt = np.asarray(grid.KMT)
    kidx = np.arange(1, cfg.km + 1)[:, None, None]
    interior = kidx < kmt[None]
    colsum = np.sum(np.where(interior, coef * dzw[:, None, None], 0.0),
                    axis=0)
    expected = (cfg.tidal_mixing_efficiency / const.RHO_FW
                * cfg.tidal_local_mixing_fraction * 1000.0
                * cfg.tidal_energy_const)
    ocean = (kmt > 1)
    np.testing.assert_allclose(colsum[ocean], expected, rtol=1e-10)
    assert (coef[:, ~(kmt > 0)] == 0.0).all()


def test_decay_concentrates_near_bottom():
    """With a small decay scale the coefficient is largest just above the
    bottom (St Laurent 2002 exponential)."""
    cfg = _cfg(tidal_vertical_decay_scale=100.0e2)
    grid = build_grid(cfg)
    coef = tidal_mixing.build_tidal_coef(cfg, grid)
    kmt = np.asarray(grid.KMT)
    j, i = np.argwhere(kmt == cfg.km)[0]
    col = coef[:, j, i]
    assert col[kmt[j, i] - 2] == col[:kmt[j, i] - 1].max()


def test_tidal_raises_interior_diffusivity():
    cfg_t = _cfg()
    cfg_0 = _cfg(ltidal_mixing=False)
    mt, m0 = Model(cfg_t), Model(cfg_0)
    st_t = mt.initial_state()
    st_0 = m0.initial_state()
    for _ in range(3):
        st_t, _ = mt.advance(st_t)
        st_0, _ = m0.advance(st_0)
    assert np.isfinite(mt.diagnostics(st_t)["KE"])
    # deep temperature evolves differently (stronger deep mixing)
    dT = np.abs(np.asarray(st_t.tracer_cur[0, -2])
                - np.asarray(st_0.tracer_cur[0, -2]))
    assert dT.max() > 0.0


def test_tidal_diff_capped():
    """Weak stratification -> kappa_tidal would blow up; must cap at
    tidal_mix_max (tidal_compute_diff:3137)."""
    cfg = _cfg(tidal_energy_const=10.0, tidal_mix_max=50.0,
               kpp_lrich=False)
    m = Model(cfg)
    st = m.initial_state()
    from pop2_tpu import kpp as kpp_mod
    dbloc, _ = kpp_mod.buoydiff(cfg, m.grid, m.kpp_statics, st.tracer_cur)
    visc, vdc_s = kpp_mod.ri_iwmix(cfg, m.grid, m.bc, m.kpp_statics,
                                   dbloc, st.u_cur, st.v_cur)
    assert np.isfinite(np.asarray(vdc_s)).all()
    assert float(jnp.max(vdc_s)) <= cfg.tidal_mix_max + 1e-9
    assert float(jnp.max(visc)) <= cfg.prandtl * cfg.tidal_mix_max + 1e-9
    # and the tidal contribution is actually present (above background)
    assert float(jnp.max(vdc_s)) > float(jnp.max(m.kpp_statics.bckgrnd_vdc))


def test_schmittner_coef_and_socn(mini_cfg, mini_grid):
    """Schmittner subgrid-scale coefficient: nonnegative, decays upward from
    the bottom sources, zero at/below the local bottom; the Southern-Ocean
    floor is active only deep and south."""
    from pop2_tpu import tidal_mixing as tm
    cfg = mini_cfg.with_(ltidal_mixing=True,
                         tidal_mixing_method="schmittner",
                         tidal_energy_const=0.05,
                         ltidal_schmittner_socn=True)
    grid = mini_grid
    coef = tm.build_tidal_coef_schmittner(cfg, grid)
    assert np.isfinite(coef).all() and coef.min() >= 0.0
    KMT = np.asarray(grid.KMT)
    kidx = np.arange(1, cfg.km + 1)[:, None, None]
    assert (coef[kidx >= KMT[None]] == 0.0).all()
    # upward decay toward the surface in deep columns
    j, i = 12, 5
    col = coef[:KMT[j, i] - 1, j, i]
    assert (np.diff(col) >= -1e-20).all()  # increases toward the bottom

    floor = tm.schmittner_socn_floor(cfg, grid)
    assert floor.min() >= 0.0 and floor.max() <= 1.0 + 1e-12
    # latitudinal gate: active in the deep Southern Ocean, off in the north
    assert floor[-1, 0, :].max() > 0.1      # deep, southernmost row
    assert floor[-1, -1, :].max() < 1e-6    # deep, northernmost row


def test_polzin_diff(mini_cfg, mini_grid):
    """Polzin/Melet diffusivity: nonnegative, finite, bottom-intensified in
    a uniformly stratified column."""
    import jax.numpy as jnp
    from pop2_tpu import tidal_mixing as tm
    cfg = mini_cfg.with_(ltidal_mixing=True, tidal_mixing_method="polzin",
                         tidal_energy_const=0.05)
    grid = mini_grid
    st = tm.polzin_statics(cfg, grid)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    n2 = jnp.full((km, ny, nx), 1.0e-6)
    diff = np.asarray(tm.polzin_diff(cfg, grid, st, n2))
    assert np.isfinite(diff).all() and diff.min() >= 0.0
    KMT = np.asarray(grid.KMT)
    j, i = 12, 5
    col = diff[:KMT[j, i] - 1, j, i]
    assert col[-1] > col[0]                 # bottom-intensified
    assert col.max() > 0.0


def test_tidal_methods_run_in_model():
    """KPP + each tidal method steps the coupled model."""
    from pop2_tpu.config import get_config
    from pop2_tpu.model import Model
    for method in ("schmittner", "polzin"):
        cfg = get_config("mini").with_(
            km=20, vert_grid="internal", vmix="kpp",
            ltidal_mixing=True, tidal_mixing_method=method,
            tidal_energy_const=0.05,
            ltidal_schmittner_socn=(method == "schmittner"))
        m = Model(cfg)
        st = m.initial_state()
        st = m.run(st, nsteps=3)
        assert np.isfinite(np.asarray(st.tracer_cur)).all()


def test_lunar_nodal_modulation_cycle():
    """18.6-yr LNC factor: unit mean over a full cycle, correct period and
    magnitude (Doodson amplitude factors, tidal_mixing.py LNC)."""
    import numpy as np
    from pop2_tpu.tidal_mixing import (lunar_nodal_modulation,
                                       LNC_PERIOD_YEARS, LNC_EPOCH_YEAR)
    yrs = LNC_EPOCH_YEAR + np.linspace(0.0, LNC_PERIOD_YEARS, 200,
                                       endpoint=False)
    f = np.array([lunar_nodal_modulation(y) for y in yrs])
    assert abs(f.mean() - 1.0) < 0.01
    assert 0.01 < f.max() - f.min() < 0.15  # percent-level net modulation
    # constituent-level modulation is larger but partially cancels: the
    # semidiurnal lunar factor falls as the diurnal factors rise
    # periodicity
    assert abs(lunar_nodal_modulation(LNC_EPOCH_YEAR)
               - lunar_nodal_modulation(LNC_EPOCH_YEAR
                                        + LNC_PERIOD_YEARS)) < 1e-9


def test_lnc_modulates_kpp_diffusivity(test_cfg, test_grid):
    """tidal_lnc scales the tidal diffusivity contribution in ri_iwmix."""
    import numpy as np
    import jax.numpy as jnp
    from pop2_tpu import kpp
    from pop2_tpu.grid import grid_bc
    from pop2_tpu.state import initial_state

    cfg = test_cfg.with_(vmix="kpp", ltidal_mixing=True,
                         ltidal_lunar_cycle=True,
                         tidal_energy_const=0.01)
    grid = test_grid
    st = kpp.build_statics(cfg, grid)
    bc = grid_bc(cfg)
    s = initial_state(cfg, grid)
    dbloc, _ = kpp.buoydiff(cfg, grid, st, s.tracer_cur)
    v1, d1 = kpp.ri_iwmix(cfg, grid, bc, st, dbloc, s.u_cur, s.v_cur,
                          tidal_lnc=jnp.asarray(1.0))
    v2, d2 = kpp.ri_iwmix(cfg, grid, bc, st, dbloc, s.u_cur, s.v_cur,
                          tidal_lnc=jnp.asarray(1.1))
    assert float(jnp.max(d2 - d1)) > 0.0          # more energy, more mixing
    assert float(jnp.min(d2 - d1)) >= -1e-12
