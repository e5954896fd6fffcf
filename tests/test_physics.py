"""Tests for shortwave absorption and frazil ice formation."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import ice, sw_absorption
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.model import Model


def test_jerlov_profile_monotone(mini_cfg, mini_grid):
    cfg = mini_cfg.with_(sw_absorption="jerlov")
    prof = np.asarray(sw_absorption.absorb_profile(cfg, mini_grid))
    assert prof[0] == 1.0
    assert prof[-1] == 0.0
    assert np.all(np.diff(prof) <= 0)


def test_sw_absorb_conserves_heat(mini_cfg, mini_grid):
    """Column integral of the source must equal the absorbed flux."""
    cfg = mini_cfg.with_(sw_absorption="jerlov")
    grid = mini_grid
    prof = sw_absorption.absorb_profile(cfg, grid)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    ft = jnp.zeros((cfg.nt, km, ny, nx))
    qsw = jnp.asarray(np.asarray(grid.RCALCT) * 0.01)
    ft2 = sw_absorption.add_sw_absorb(cfg, grid, ft, qsw, prof)
    src = np.asarray(ft2[0])
    dz = np.asarray(grid.vgrid.dz)[:, None, None]
    colsum = (src * dz).sum(axis=0)
    ocean = np.asarray(grid.RCALCT) > 0
    # full flux (transmission from surface = 1, bottom absorbs the rest)
    np.testing.assert_allclose(colsum[ocean], 0.01, rtol=1e-12)
    assert np.all(src[0][ocean] > 0)


def test_ice_formation_freezes_and_conserves_heat(mini_cfg, mini_grid):
    cfg = mini_cfg.with_(liceform=True)
    grid = mini_grid
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    kmask = np.asarray(grid.kmask_t)
    T = np.full((km, ny, nx), 1.0) * kmask
    T[0] = -5.0 * kmask[0]          # supercooled surface
    S = np.full((km, ny, nx), 0.0347) * kmask
    tnew = jnp.asarray(np.stack([T, S]))
    psurf = jnp.zeros((ny, nx))
    qice = jnp.zeros((ny, nx))
    aqice = jnp.zeros((ny, nx))
    t2, q2, a2 = ice.ice_formation(cfg, grid, tnew, psurf, qice, aqice, 1.0)
    t2 = np.asarray(t2)
    ocean = kmask[0]
    # surface warmed to the freezing point of its (brine-enriched) salinity
    tfrz_final = ice.DFREEZE * t2[1, 0] * 1000.0
    # (the reference updates S after the final T adjustment, so T matches
    # the freezing point of the pre-melt-pass salinity; allow that offset)
    np.testing.assert_allclose(t2[0, 0][ocean], tfrz_final[ocean],
                               atol=5e-3)
    assert np.all(t2[0, 0][ocean] > -5.0)  # warmed from supercooled
    # ice potential accumulated (negative = freezing)
    assert np.all(np.asarray(q2)[ocean] < 0)
    # warm water is untouched
    np.testing.assert_allclose(t2[0, 1][ocean], 1.0)


def test_ice_melt_offsets_accumulated_freezing(mini_cfg, mini_grid):
    cfg = mini_cfg.with_(liceform=True)
    grid = mini_grid
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    kmask = np.asarray(grid.kmask_t)
    T = np.full((km, ny, nx), 5.0) * kmask   # warm surface
    S = np.full((km, ny, nx), 0.0347) * kmask
    tnew = jnp.asarray(np.stack([T, S]))
    psurf = jnp.zeros((ny, nx))
    qice = jnp.zeros((ny, nx))
    aqice = jnp.asarray(-1.0e3 * kmask[0])   # previously formed ice
    t2, q2, a2 = ice.ice_formation(cfg, grid, tnew, psurf, qice, aqice, 1.0)
    ocean = kmask[0]
    # melt consumed some of the accumulated ice: AQICE moved toward zero
    assert np.all(np.asarray(a2)[ocean] > np.asarray(aqice)[ocean])
    # and the surface cooled
    assert np.all(np.asarray(t2)[0, 0][ocean] < 5.0)


def test_model_with_ice_and_sw_runs():
    cfg = get_config("mini").with_(liceform=True, sw_absorption="jerlov")
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(10):
        st, _ = m.advance(st)
    dd = m.diagnostics(st)
    assert np.isfinite(dd["KE"])


def test_chl_sw_absorption(mini_cfg, mini_grid):
    """Chlorophyll (Ohlmann) shortwave absorption: transmission decreases
    monotonically with depth, higher chl traps more heat near the surface,
    and the column-integrated heating equals the incident flux."""
    import jax.numpy as jnp
    from pop2_tpu import sw_absorption as sw
    from pop2_tpu import constants as const

    cfg = mini_cfg.with_(sw_absorption="chlorophyll")
    grid = mini_grid
    ny, nx, km = cfg.ny, cfg.nx, cfg.km
    for chl_val in (0.05, 0.5, 5.0):
        chl = jnp.full((ny, nx), chl_val)
        tr = np.asarray(sw.chl_transmission(cfg, grid, chl))
        assert tr.shape == (km + 1, ny, nx)
        assert np.all(np.diff(tr[:, 5, 5]) <= 0)       # monotone decay
        assert tr[0, 5, 5] == 1.0 and tr[-1, 5, 5] == 0.0

    tr_lo = np.asarray(sw.chl_transmission(cfg, grid,
                                           jnp.full((ny, nx), 0.05)))
    tr_hi = np.asarray(sw.chl_transmission(cfg, grid,
                                           jnp.full((ny, nx), 5.0)))
    # greener water absorbs faster: less light reaches interface 1
    assert tr_hi[1, 5, 5] < tr_lo[1, 5, 5]

    # conservation: sum over column of absorbed fractions = 1 at full depth
    ft = jnp.zeros((cfg.nt, km, ny, nx))
    qsw = jnp.full((ny, nx), 100.0 * const.HFLUX_FACTOR)
    ft2 = sw.add_sw_absorb(cfg, grid, ft,
                           qsw, sw.chl_transmission(
                               cfg, grid, jnp.full((ny, nx), 0.3)))
    dz = np.asarray(grid.vgrid.dz)[:, None, None]
    kmask = np.asarray(grid.kmask_t)
    heat = (np.asarray(ft2[0]) * dz * kmask)
    np.testing.assert_allclose(
        heat.sum(axis=0)[kmask[0]],
        100.0 * const.HFLUX_FACTOR, rtol=1e-12)


def test_chl_model_option_runs():
    """sw_absorption='chlorophyll' with chl_option='model' pulls Chl from
    the ecosystem tracers and the coupled model steps."""
    from pop2_tpu import ecosys
    from pop2_tpu.config import get_config
    from pop2_tpu.model import Model
    names = ecosys.TRACER_NAMES
    cfg = get_config("mini").with_(
        nt=2 + len(names), km=20, vert_grid="internal",
        passive_tracers=("ecosys",),
        sw_absorption="chlorophyll", chl_option="model")
    m = Model(cfg)
    st = m.initial_state()
    st = m.run(st, nsteps=3)
    assert np.isfinite(np.asarray(st.tracer_cur)).all()
