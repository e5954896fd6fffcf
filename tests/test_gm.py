"""Gent-McWilliams / Redi mixing tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import gm
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from pop2_tpu.model import Model


@pytest.fixture(scope="module")
def gcfg():
    return get_config("mini").with_(hmix_tracer="gm", km=20,
                                    vert_grid="internal")


@pytest.fixture(scope="module")
def ggrid(gcfg):
    return build_grid(gcfg)


def _stratified_tracers(gcfg, ggrid, tilt=1e-8):
    km, ny, nx = gcfg.km, gcfg.ny, gcfg.nx
    kmask = np.asarray(ggrid.kmask_t)
    zt = np.asarray(ggrid.vgrid.zt)
    # stable stratification with a small horizontal density tilt
    lat = np.asarray(ggrid.TLAT)
    T = (18.0 - 12.0 * (zt / zt[-1])[:, None, None]
         + 2.0 * np.cos(2 * lat)[None])
    S = np.full((km, ny, nx), 0.0347)
    return jnp.asarray(np.stack([T * kmask, S * kmask]))


def test_gm_slopes_finite_and_bounded(gcfg, ggrid):
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    tx, ty, tz, slx, sly = gm._slopes(gcfg, ggrid, bc, None, tr)
    for a in (tx, ty, tz, slx, sly):
        assert np.isfinite(np.asarray(a)).all()
    # stable stratification: T decreases downward -> tz[0] > 0 in interior
    interior = np.asarray(ggrid.kmask_t)
    assert (np.asarray(tz)[0, 1:][interior[1:]] > 0).mean() > 0.99


def test_gm_conserves_tracer(gcfg, ggrid):
    """Flux-form GM/Redi must conserve the volume integral of tracers."""
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    out = gm.hdifft_gm(gcfg, ggrid, bc, None, tr)
    gtk = np.asarray(out.gtk)
    assert np.isfinite(gtk).all()
    dz = np.asarray(ggrid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(ggrid.TAREA)[None, None] * np.asarray(
        ggrid.kmask_t)[None]
    total = (gtk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(gtk) * w).sum(axis=(1, 2, 3)) + 1e-30
    assert np.all(np.abs(total) < 1e-9 * scale)
    # vdc_gm nonnegative
    assert np.asarray(out.vdc_gm).min() >= 0.0


def test_gm_flattens_isopycnals(gcfg, ggrid):
    """GM extracts available potential energy: the horizontally-tilted
    temperature field should relax toward flat (tendency anti-correlates
    with the horizontal anomaly)."""
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    out = gm.hdifft_gm(gcfg, ggrid, bc, None, tr)
    gtk = np.asarray(out.gtk[0])
    kmask = np.asarray(ggrid.kmask_t)
    T = np.asarray(tr[0])
    # horizontal anomaly per level
    anom = T - (T * kmask).sum(axis=(1, 2), keepdims=True) / np.maximum(
        kmask.sum(axis=(1, 2), keepdims=True), 1)
    corr = (gtk * anom * kmask)[3:12].sum()
    assert corr < 0


def test_gm_model_runs(gcfg):
    m = Model(gcfg)
    st = m.initial_state()
    for _ in range(10):
        st, _ = m.advance(st)
    dd = m.diagnostics(st)
    assert np.isfinite(dd["KE"]) and dd["KE"] < 100.0


def test_gm_with_kpp_model_runs():
    cfg = get_config("mini").with_(hmix_tracer="gm", vmix="kpp", km=20,
                                   vert_grid="internal")
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])


def _mix_velocities(gcfg, ggrid, amp=5.0, seed=7):
    rng = np.random.RandomState(seed)
    km, ny, nx = gcfg.km, gcfg.ny, gcfg.nx
    kmask_u = np.asarray(ggrid.kmask_u)
    u = rng.randn(km, ny, nx) * amp * kmask_u
    v = rng.randn(km, ny, nx) * amp * kmask_u
    return jnp.asarray(u), jnp.asarray(v)


def test_kappa_vmhs_bounded(gcfg, ggrid):
    """Visbeck et al. diffusivity stays in the reference's [3e6, 4e7]
    band (source/hmix_gm.F90:2446-2453) and equals the floor over
    shallow columns."""
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    u, v = _mix_velocities(gcfg, ggrid)
    kap = np.asarray(gm.kappa_vmhs(gcfg, ggrid, bc, None, tr, u, v))
    assert np.isfinite(kap).all()
    assert kap.min() >= 3.0e6 - 1e-6
    assert kap.max() <= 4.0e7 + 1e-6


def test_kappa_eg_bounded(gcfg, ggrid):
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    u, v = _mix_velocities(gcfg, ggrid)
    kap = np.asarray(gm.kappa_eg(gcfg, ggrid, bc, None, tr, u, v))
    assert kap.shape == (gcfg.km, gcfg.ny, gcfg.nx)
    assert np.isfinite(kap).all()
    assert kap.min() >= gcfg.gm_kappa_min_eg - 1e-6
    assert kap.max() <= gcfg.gm_kappa_max_eg + 1e-6


@pytest.mark.parametrize("ktype", ["depth", "vmhs", "eg"])
def test_gm_flow_dependent_kappa_conserves(gcfg, ggrid, ktype):
    """Every kappa variant keeps the flux-form conservation property."""
    cfg = gcfg.with_(gm_kappa_isop_type=ktype, gm_kappa_thic_type=ktype,
                     gm_kappa_depth_2=0.8)
    bc = grid_bc(cfg)
    tr = _stratified_tracers(cfg, ggrid)
    u, v = _mix_velocities(cfg, ggrid)
    out = gm.hdifft_gm(cfg, ggrid, bc, None, tr, umix=u, vmix_m=v)
    gtk = np.asarray(out.gtk)
    assert np.isfinite(gtk).all()
    dz = np.asarray(ggrid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(ggrid.TAREA)[None, None] * np.asarray(
        ggrid.kmask_t)[None]
    total = (gtk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(gtk) * w).sum(axis=(1, 2, 3)) + 1e-30
    assert np.all(np.abs(total) < 1e-9 * scale)
    assert np.asarray(out.vdc_gm).min() >= 0.0


def test_kappa_vertical_bfre_profile(gcfg, ggrid):
    """The bfre N^2 profile (source/hmix_gm.F90:3011-3176) is bounded to
    [0.1, 1], is exactly 1 above/at the reference level, and decays with
    depth for a surface-intensified stratification."""
    tr = _stratified_tracers(gcfg, ggrid)
    zw = np.asarray(ggrid.vgrid.zw)
    sdl = jnp.full_like(ggrid.FCORT, float(zw[0]))
    kv = np.asarray(gm.kappa_vertical_bfre(gcfg, ggrid, None, tr, sdl))
    assert kv.shape == (gcfg.km, gcfg.ny, gcfg.nx)
    assert kv.min() >= 0.1 - 1e-12 and kv.max() <= 1.0 + 1e-12
    assert np.allclose(kv[0], 1.0)
    # the linear-in-z T profile gives N^2 ~ const/dzw; with uniform dz the
    # normalized profile cannot exceed its surface reference
    ocean = np.asarray(ggrid.kmask_t[-1]) > 0
    deep = kv[-1][ocean]
    assert deep.mean() <= 1.0 + 1e-12


def test_transition_layer_geometry(gcfg, ggrid):
    """TLT invariants (source/hmix_gm.F90:3183-3434): over ocean columns
    INTERIOR_DEPTH = DIABATIC_DEPTH + THICKNESS, thickness >= 0, and the
    interior starts at a real zt/zw coordinate of level K_LEVEL."""
    from pop2_tpu.grid import grid_bc
    bc = grid_bc(gcfg)
    tr = _stratified_tracers(gcfg, ggrid)
    tx, ty, tz, slx, sly = gm._slopes(gcfg, ggrid, bc, None, tr)
    sla = gm._sla(gcfg, ggrid, slx, sly)
    # diabatic depth: a synthetic boundary layer ~ varying with latitude
    zt = np.asarray(ggrid.vgrid.zt)
    lat = np.asarray(ggrid.TLAT)
    dd = jnp.asarray((zt[2] + (zt[6] - zt[2])
                      * (0.5 + 0.5 * np.cos(lat))) * (np.asarray(
                          ggrid.KMT) > 0))
    tlt = gm.transition_layer(gcfg, ggrid, dd, sla,
                              gm._rossby_radius(ggrid))
    kmt = np.asarray(ggrid.KMT)
    ocean = kmt > 0
    thick = np.asarray(tlt.thickness)
    idp = np.asarray(tlt.interior_depth)
    ddn = np.asarray(dd)
    assert (thick[ocean] >= 0.0).all()
    # the reference aborts if INTERIOR_DEPTH == 0 over ocean (:3415-3427)
    assert (idp[ocean] > 0.0).all()
    assert np.allclose(idp[ocean], ddn[ocean] + thick[ocean], rtol=1e-12)
    assert (idp[~ocean] == 0.0).all()
    # interior depth is an actual grid coordinate of K_LEVEL
    zwv = np.asarray(ggrid.vgrid.zw)
    kl = np.asarray(tlt.k_level)
    ztw = np.asarray(tlt.ztw)
    sel = ocean & (kl > 0)
    coord = np.where(ztw == 1, zt[np.clip(kl - 1, 0, gcfg.km - 1)],
                     zwv[np.clip(kl - 1, 0, gcfg.km - 1)])
    assert np.allclose(idp[sel], coord[sel])


def test_gm_bfre_transition_conserves(gcfg, ggrid):
    """bfre kappa + transition layer keep flux-form conservation."""
    cfg = gcfg.with_(gm_kappa_isop_type="bfre", gm_kappa_thic_type="bfre",
                     gm_kappa_isop_deep=0.2, gm_transition_layer=True)
    bc = grid_bc(cfg)
    tr = _stratified_tracers(cfg, ggrid)
    zt = np.asarray(ggrid.vgrid.zt)
    hblt = jnp.asarray(np.full(ggrid.FCORT.shape, zt[3]))
    out = gm.hdifft_gm(cfg, ggrid, bc, None, tr, hblt=hblt)
    gtk = np.asarray(out.gtk)
    assert np.isfinite(gtk).all()
    dz = np.asarray(ggrid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(ggrid.TAREA)[None, None] * np.asarray(
        ggrid.kmask_t)[None]
    total = (gtk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(gtk) * w).sum(axis=(1, 2, 3)) + 1e-30
    assert np.all(np.abs(total) < 1e-9 * scale)
    assert np.asarray(out.vdc_gm).min() >= 0.0
    # TLT diagnostics present and sane
    assert out.dia_depth is not None
    ocean = np.asarray(ggrid.KMT) > 0
    assert (np.asarray(out.int_depth)[ocean] > 0).all()


def test_gm_bfre_transition_model_runs():
    cfg = get_config("mini").with_(
        hmix_tracer="gm", vmix="kpp", km=20, vert_grid="internal",
        gm_kappa_isop_type="bfre", gm_kappa_thic_type="bfre",
        gm_kappa_isop_deep=0.2, gm_transition_layer=True)
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])


def test_gm_aniso_grid_suppresses_cross_direction(test_cfg, test_grid):
    """gm_aniso='grid' with a small ratio: y-direction GM/Redi transport is
    suppressed relative to x (hmix_gm_aniso.F90 intent). A tracer varying
    only in y feels ~ratio x the tendency of the same variation in x."""
    import numpy as np
    import jax.numpy as jnp
    from pop2_tpu import gm as gm_mod
    from pop2_tpu.grid import grid_bc, thickness_t
    from pop2_tpu.state import initial_state
    from pop2_tpu import eos

    cfg = test_cfg.with_(hmix_tracer="gm", gm_aniso="grid",
                         gm_aniso_ratio=0.1)
    cfg_iso = test_cfg.with_(hmix_tracer="gm")
    grid = test_grid
    bc = grid_bc(cfg)
    ts_range = (eos.build_ts_range(np.asarray(grid.vgrid.zt),
                                   cfg.jnp_dtype)
                if cfg.state_range_opt == "enforce" else None)
    s = initial_state(cfg, grid)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    mask = np.asarray(grid.kmask_t)

    def pert(axis):
        T = np.array(s.tracer_cur[0])
        if axis == "x":
            T += 0.5 * np.sin(np.arange(nx) * 2 * np.pi / nx)[None, None, :] * mask
        else:
            T += 0.5 * np.sin(np.arange(ny) * 2 * np.pi / ny)[None, :, None] * mask
        return jnp.asarray(np.stack([T, np.asarray(s.tracer_cur[1])]))

    out_x = gm_mod.hdifft_gm(cfg, grid, bc, ts_range, pert("x"))
    out_y = gm_mod.hdifft_gm(cfg, grid, bc, ts_range, pert("y"))
    out_y_iso = gm_mod.hdifft_gm(cfg_iso, grid, bc, ts_range, pert("y"))

    ny_norm = float(jnp.abs(out_y.gtk[0]).mean())
    ny_iso = float(jnp.abs(out_y_iso.gtk[0]).mean())
    # y tendencies shrink toward the ratio vs the isotropic run
    assert ny_norm < 0.5 * ny_iso
    # conservation still holds under anisotropy
    dzt = np.asarray(thickness_t(cfg, grid))
    vol = dzt * np.asarray(grid.TAREA)[None] * mask
    tot = float((np.asarray(out_y.gtk[0]) * vol).sum())
    scale = float((np.abs(np.asarray(out_y.gtk[0])) * vol).sum()) + 1e-30
    assert abs(tot) < 1e-6 * scale
    assert np.isfinite(np.asarray(out_x.gtk)).all()


def test_gm_aniso_flow_aligns_with_velocity(test_cfg, test_grid):
    """gm_aniso='flow': zonal flow gives kappa_x > kappa_y."""
    import numpy as np
    import jax.numpy as jnp
    from pop2_tpu import gm as gm_mod
    from pop2_tpu.grid import grid_bc

    cfg = test_cfg.with_(hmix_tracer="gm", gm_aniso="flow",
                         gm_aniso_ratio=0.2)
    grid = test_grid
    bc = grid_bc(cfg)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    u = jnp.asarray(10.0 * np.asarray(grid.kmask_u))
    v = jnp.zeros_like(u)
    ax, ay = gm_mod._aniso_factors(cfg, grid, bc, u, v)
    ocean = np.asarray(grid.kmask_t) > 0
    assert np.asarray(ax)[ocean].min() > 0.9        # major along x
    assert np.asarray(ay)[ocean].max() < 0.35       # minor across
