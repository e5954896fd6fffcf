"""NIW mixing and topographic stress tests."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.model import Model


def test_niw_raises_subsurface_diffusivity():
    cfg0 = get_config("mini").with_(vmix="kpp")
    cfgn = cfg0.with_(lniw_mixing=True, niw_energy_const=0.01)
    m0, mn = Model(cfg0), Model(cfgn)
    st = m0.initial_state()
    from pop2_tpu import vmix as vmix_mod
    c0 = vmix_mod.vmix_coeffs(cfg0, m0.grid, m0.bc, st.tracer_cur,
                              st.u_cur, st.v_cur, st.rho_cur,
                              forcing=m0.forcing, kpp_statics=m0.kpp_statics)
    cn = vmix_mod.vmix_coeffs(cfgn, mn.grid, mn.bc, st.tracer_cur,
                              st.u_cur, st.v_cur, st.rho_cur,
                              forcing=mn.forcing, kpp_statics=mn.kpp_statics)
    v0 = np.asarray(c0.vdc[0])
    vn = np.asarray(cn.vdc[0])
    assert np.isfinite(vn).all()
    assert vn.max() <= cfgn.niw_mix_max + cfgn.convect_diff + 1.0
    assert not np.allclose(v0, vn)   # NIW changed the interior profile


def test_niw_model_stable():
    cfg = get_config("mini").with_(vmix="kpp", lniw_mixing=True,
                                  niw_energy_const=0.005)
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])


def test_topostress_fields():
    cfg = get_config("mini").with_(ltopostress=True, nsmooth_topo=2)
    g = build_grid(cfg)
    tsu = np.asarray(g.TSU)
    tsv = np.asarray(g.TSV)
    assert np.isfinite(tsu).all() and np.isfinite(tsv).all()
    assert np.abs(tsu).max() > 0.0
    # zero on land U points
    land = np.asarray(g.KMU) == 0
    assert np.abs(tsu[land]).max() == 0.0
    # reasonable magnitude for an equilibrium velocity (cm/s)
    assert np.abs(tsu).max() < 200.0


def test_topostress_drives_flow_from_rest():
    """With Neptune stress on, friction accelerates a resting ocean toward
    the equilibrium velocity, so KE grows faster than without."""
    cfg_t = get_config("mini").with_(ltopostress=True)
    cfg_0 = get_config("mini")
    mt, m0 = Model(cfg_t), Model(cfg_0)
    zf = jnp.zeros_like(mt.forcing.smf)
    ft = mt.forcing.replace(smf=zf, smft=zf)
    f0 = m0.forcing.replace(smf=zf, smft=zf)
    st_t = mt.initial_state()
    st_0 = m0.initial_state()
    for _ in range(5):
        st_t, _ = mt.advance(st_t, forcing=ft)
        st_0, _ = m0.advance(st_0, forcing=f0)
    ke_t = mt.diagnostics(st_t)["KE"]
    ke_0 = m0.diagnostics(st_0)["KE"]
    assert np.isfinite(ke_t)
    assert ke_t > ke_0


def test_niw_blke_energy():
    """'blke' NIW energy: extracts from the boundary-layer KE change,
    vanishes at the equator, and the coupled model runs."""
    import jax.numpy as jnp
    from pop2_tpu import kpp as kpp_mod
    from pop2_tpu.config import get_config
    from pop2_tpu.grid import build_grid
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(km=20, vert_grid="internal", vmix="kpp",
                                   lniw_mixing=True,
                                   niw_energy_type="blke")
    grid = build_grid(cfg)
    st = kpp_mod.build_statics(cfg, grid)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    rng = np.random.RandomState(4)
    kmask_u = np.asarray(grid.kmask_u)
    umix = jnp.asarray(rng.randn(km, ny, nx) * 5.0 * kmask_u)
    vmix_ = jnp.asarray(rng.randn(km, ny, nx) * 5.0 * kmask_u)
    ucur = umix * 1.1
    vcur = vmix_ * 1.1
    kbl = jnp.full((ny, nx), 3, jnp.int32)
    en = np.asarray(kpp_mod.niw_energy(cfg, grid, st, kbl, umix, vmix_,
                                       ucur, vcur))
    assert np.isfinite(en).all() and (en >= 0.0).all()
    tlat = np.asarray(grid.TLAT) * 180.0 / np.pi
    eq = np.abs(tlat) < 5.0
    if eq.any():
        assert np.abs(en[eq]).max() == 0.0
    assert en[np.abs(tlat) > 15.0].max() > 0.0

    m = Model(cfg)
    s0 = m.initial_state()
    s0 = m.run(s0, nsteps=3)
    assert np.isfinite(np.asarray(s0.tracer_cur)).all()
