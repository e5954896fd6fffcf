"""Equivalence of the fused Pallas tracer-tendency kernel against the jnp
chain it replaces (hdifft_del2 - advt_centered + vdifft), following the
kernel-vs-oracle pattern of test_tridiag.py::test_pallas_thomas_matches_scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pop2_tpu import advect, hmix, vmix
from pop2_tpu import tracer_pallas
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from pop2_tpu.state import initial_state


def _jnp_chain(cfg, grid, bc, u, v, trcr, tmix, told, vdc, stf, dh, c2dtt):
    ft = hmix.hdifft(cfg, grid, bc, tmix)
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    ft = ft - advect.advt(cfg, grid, bc, fv, trcr, tmix=tmix, c2dtt=c2dtt)
    ft = ft + vmix.vdifft(cfg, grid, vdc, told, stf)
    return ft


def _random_inputs(cfg, grid, seed=0, nt=None):
    rng = np.random.RandomState(seed)
    nt = nt or cfg.nt
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    f32 = np.float32
    mask_u = np.asarray(grid.kmask_u)
    mask_t = np.asarray(grid.kmask_t)
    u = (rng.randn(km, ny, nx) * 10.0 * mask_u).astype(f32)
    v = (rng.randn(km, ny, nx) * 10.0 * mask_u).astype(f32)
    trcr = (rng.randn(nt, km, ny, nx) * mask_t).astype(f32)
    tmix = (rng.randn(nt, km, ny, nx) * mask_t).astype(f32)
    told = (rng.randn(nt, km, ny, nx) * mask_t).astype(f32)
    vdc = (rng.uniform(0.0, 10.0, (2, km, ny, nx)) * mask_t).astype(f32)
    stf = (rng.randn(nt, ny, nx) * mask_t[0]).astype(f32)
    dh = (rng.randn(ny, nx) * 1e-4 * mask_t[0]).astype(f32)
    return u, v, trcr, tmix, told, vdc, stf, dh


@pytest.mark.parametrize("preset,varthick", [("test", True),
                                             ("test", False),
                                             ("mini", True)])
def test_fused_tracer_tendency_matches_jnp(preset, varthick):
    cfg = get_config(preset).with_(
        dtype="float32",
        sfc_layer="varthick" if varthick else "rigid")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    u, v, trcr, tmix, told, vdc, stf, dh = _random_inputs(cfg, grid)
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    want = _jnp_chain(cfg, grid, bc, u, v, trcr, tmix, told, vdc, stf, dh,
                      c2dtt)

    dz = np.asarray(grid.vgrid.dz, np.float32)
    dzr = (1.0 / dz).astype(np.float32)
    dz2r = (0.5 / dz).astype(np.float32)
    dz_kp1 = np.concatenate([dz[1:], dz[-1:]])
    dzwr2 = (1.0 / (0.5 * (dz + dz_kp1))).astype(np.float32)

    got = tracer_pallas.tracer_tendency_tiles(
        u, v, trcr, tmix, told, vdc, stf, dh, grid.KMT,
        grid.DYU.astype(jnp.float32), grid.DXU.astype(jnp.float32),
        grid.TAREA_R.astype(jnp.float32),
        grid.DTN.astype(jnp.float32), grid.DTS.astype(jnp.float32),
        grid.DTE.astype(jnp.float32), grid.DTW.astype(jnp.float32),
        jnp.asarray(dz), jnp.asarray(dzr), jnp.asarray(dz2r),
        jnp.asarray(dzwr2),
        float(cfg.auto_ah),
        ew=cfg.ew_boundary, varthick=varthick, interpret=True)

    want = np.asarray(want)
    got = np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_dispatch_wired_into_baroclinic():
    """available() gates correctly and the driver path stays consistent:
    forcing the kernel on (interpret mode) must not change Model.advance
    results beyond fp32 tolerance."""
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(dtype="float32")
    m = Model(cfg)
    s0 = m.initial_state()

    old_use, old_interp = tracer_pallas.USE_PALLAS, \
        tracer_pallas.force_interpret
    try:
        tracer_pallas.USE_PALLAS = False
        s_ref = m.initial_state()
        for _ in range(3):
            s_ref, _ = m.advance(s_ref)

        tracer_pallas.USE_PALLAS = True
        tracer_pallas.force_interpret = True
        m2 = Model(cfg)
        s_k = m2.initial_state()
        for _ in range(3):
            s_k, _ = m2.advance(s_k)
    finally:
        tracer_pallas.USE_PALLAS = old_use
        tracer_pallas.force_interpret = old_interp

    t_ref = np.asarray(s_ref.tracer_cur)
    t_k = np.asarray(s_k.tracer_cur)
    scale = np.abs(t_ref).max() or 1.0
    np.testing.assert_allclose(t_k, t_ref, rtol=0, atol=1e-4 * scale)


def _call_tiles(cfg, grid, inputs, **kw):
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    dz = np.asarray(grid.vgrid.dz, np.float32)
    dz_kp1 = np.concatenate([dz[1:], dz[-1:]])
    return tracer_pallas.tracer_tendency_tiles(
        u, v, trcr, tmix, told, vdc, stf, dh, grid.KMT,
        grid.DYU.astype(jnp.float32), grid.DXU.astype(jnp.float32),
        grid.TAREA_R.astype(jnp.float32),
        grid.DTN.astype(jnp.float32), grid.DTS.astype(jnp.float32),
        grid.DTE.astype(jnp.float32), grid.DTW.astype(jnp.float32),
        jnp.asarray(dz), jnp.asarray((1.0 / dz).astype(np.float32)),
        jnp.asarray((0.5 / dz).astype(np.float32)),
        jnp.asarray((1.0 / (0.5 * (dz + dz_kp1))).astype(np.float32)),
        kw.pop("ah", float(cfg.auto_ah)),
        ew=cfg.ew_boundary, interpret=True, **kw)


def test_advdiff_only_matches_jnp():
    """with_del2=False computes exactly -advt + vdifft (the fusion used
    under GM/del4/aniso horizontal mixing — the production path)."""
    cfg = get_config("test").with_(dtype="float32")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    want = -advect.advt(cfg, grid, bc, fv, trcr, tmix=tmix, c2dtt=c2dtt)
    want = want + vmix.vdifft(cfg, grid, vdc, told, stf)

    got = _call_tiles(cfg, grid, inputs, with_del2=False, ah=0.0,
                      varthick=True)
    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_tripole_fold_matches_jnp():
    """Tripole north boundary: the kernel's folded north-edge blocks
    reproduce the jnp chain's tripole shifts."""
    cfg = get_config("mini").with_(dtype="float32", ns_boundary="tripole")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid, seed=3)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    want = _jnp_chain(cfg, grid, bc, jnp.asarray(u), jnp.asarray(v),
                      jnp.asarray(trcr), jnp.asarray(tmix),
                      jnp.asarray(told), jnp.asarray(vdc),
                      jnp.asarray(stf), jnp.asarray(dh), c2dtt)

    edges = tracer_pallas._tripole_edges(cfg, jnp.asarray(trcr),
                                         jnp.asarray(tmix), grid.KMT,
                                         True)
    got = _call_tiles(cfg, grid, inputs, varthick=True, n_edge="data",
                      edges=edges)
    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_sharded_front_end_matches_single_device():
    """The shard_map/ppermute halo front-end on an (8, 1) virtual mesh
    reproduces the single-device kernel result (VERDICT r3 item 3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg = get_config("mini").with_(dtype="float32", mesh_shape=(8, 1),
                                   nx=64, ny=64)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid, seed=5)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    want = _jnp_chain(cfg, grid, bc, jnp.asarray(u), jnp.asarray(v),
                      jnp.asarray(trcr), jnp.asarray(tmix),
                      jnp.asarray(told), jnp.asarray(vdc),
                      jnp.asarray(stf), jnp.asarray(dh), c2dtt)

    mesh = pmesh.make_mesh((8, 1))
    old_use, old_interp = tracer_pallas.USE_PALLAS, \
        tracer_pallas.force_interpret
    try:
        tracer_pallas.USE_PALLAS = True
        tracer_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert tracer_pallas.available(cfg, grid)
            got = tracer_pallas.tracer_tendency(
                cfg, grid, jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(trcr), jnp.asarray(tmix), jnp.asarray(told),
                jnp.asarray(vdc), jnp.asarray(stf), jnp.asarray(dh))
    finally:
        tracer_pallas.USE_PALLAS = old_use
        tracer_pallas.force_interpret = old_interp

    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_sharded_tripole_production_menu():
    """Sharded + tripole + GM (advdiff-only fusion): kernel+front-end
    matches the jnp chain on the production-shaped boundary."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg = get_config("mini").with_(dtype="float32", mesh_shape=(8, 1),
                                   nx=64, ny=64,
                                   ns_boundary="tripole",
                                   hmix_tracer="gm")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid, seed=7)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    fv = advect.comp_flux_vel(cfg, grid, bc, jnp.asarray(u),
                              jnp.asarray(v), jnp.asarray(dh))
    want = -advect.advt(cfg, grid, bc, fv, jnp.asarray(trcr),
                        tmix=jnp.asarray(tmix), c2dtt=c2dtt)
    want = want + vmix.vdifft(cfg, grid, jnp.asarray(vdc),
                              jnp.asarray(told), jnp.asarray(stf))

    mesh = pmesh.make_mesh((8, 1))
    old_use, old_interp = tracer_pallas.USE_PALLAS, \
        tracer_pallas.force_interpret
    try:
        tracer_pallas.USE_PALLAS = True
        tracer_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert tracer_pallas.available_advdiff(cfg, grid)
            got = tracer_pallas.tracer_tendency(
                cfg, grid, jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(trcr), jnp.asarray(tmix), jnp.asarray(told),
                jnp.asarray(vdc), jnp.asarray(stf), jnp.asarray(dh))
    finally:
        tracer_pallas.USE_PALLAS = old_use
        tracer_pallas.force_interpret = old_interp

    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


@pytest.mark.parametrize("nsb", ["closed", "tripole"])
def test_upwind3_matches_jnp(nsb):
    """The upwind3 (QUICKEST) advection branch — the gx production
    default (namelist_defaults_pop.xml:534) — matches the jnp chain on
    closed and tripole boundaries."""
    cfg = get_config("mini").with_(dtype="float32", nx=64, ny=64, km=10,
                                   tadvect="upwind3", ns_boundary=nsb)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid, seed=9)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    want = _jnp_chain(cfg, grid, bc, jnp.asarray(u), jnp.asarray(v),
                      jnp.asarray(trcr), jnp.asarray(tmix),
                      jnp.asarray(told), jnp.asarray(vdc),
                      jnp.asarray(stf), jnp.asarray(dh), c2dtt)

    kw = dict(varthick=True, tadvect="upwind3",
              upw=tracer_pallas._upw_fields(cfg, grid),
              upwz=tracer_pallas._upwz_fields(cfg, grid))
    if nsb == "tripole":
        kw["n_edge"] = "data"
        kw["edges"] = tracer_pallas._tripole_edges(
            cfg, jnp.asarray(trcr, jnp.float32),
            jnp.asarray(tmix, jnp.float32), grid.KMT, True,
            two_rows=True)
    got = _call_tiles(cfg, grid, inputs, **kw)
    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_sharded_upwind3_matches_jnp():
    """Sharded front-end with upwind3 + tripole (the full production
    tracer-advection path under a mesh)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg = get_config("mini").with_(dtype="float32", mesh_shape=(8, 1),
                                   nx=64, ny=64, km=10,
                                   tadvect="upwind3",
                                   ns_boundary="tripole")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    inputs = _random_inputs(cfg, grid, seed=13)
    u, v, trcr, tmix, told, vdc, stf, dh = inputs
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt, jnp.float32)

    want = _jnp_chain(cfg, grid, bc, jnp.asarray(u), jnp.asarray(v),
                      jnp.asarray(trcr), jnp.asarray(tmix),
                      jnp.asarray(told), jnp.asarray(vdc),
                      jnp.asarray(stf), jnp.asarray(dh), c2dtt)

    mesh = pmesh.make_mesh((8, 1))
    old_use, old_interp = tracer_pallas.USE_PALLAS, \
        tracer_pallas.force_interpret
    try:
        tracer_pallas.USE_PALLAS = True
        tracer_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert tracer_pallas.available(cfg, grid)
            got = tracer_pallas.tracer_tendency(
                cfg, grid, jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(trcr), jnp.asarray(tmix), jnp.asarray(told),
                jnp.asarray(vdc), jnp.asarray(stf), jnp.asarray(dh))
    finally:
        tracer_pallas.USE_PALLAS = old_use
        tracer_pallas.force_interpret = old_interp
    want, got = np.asarray(want), np.asarray(got)
    scale = np.abs(want).max() or 1.0
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5 * scale)


def test_dispatch_upwind3_model_consistent():
    """Forcing the kernel on (interpret) must not change Model.advance
    results under the upwind3 production advection."""
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(dtype="float32", nx=64, ny=64, km=10,
                                   tadvect="upwind3",
                                   ns_boundary="tripole")
    old_use, old_interp = tracer_pallas.USE_PALLAS, \
        tracer_pallas.force_interpret
    try:
        tracer_pallas.USE_PALLAS = False
        m = Model(cfg)
        s_ref = m.initial_state()
        for _ in range(3):
            s_ref, _ = m.advance(s_ref)

        tracer_pallas.USE_PALLAS = True
        tracer_pallas.force_interpret = True
        m2 = Model(cfg)
        s_k = m2.initial_state()
        for _ in range(3):
            s_k, _ = m2.advance(s_k)
    finally:
        tracer_pallas.USE_PALLAS = old_use
        tracer_pallas.force_interpret = old_interp

    t_ref = np.asarray(s_ref.tracer_cur)
    t_k = np.asarray(s_k.tracer_cur)
    scale = np.abs(t_ref).max() or 1.0
    np.testing.assert_allclose(t_k, t_ref, rtol=0, atol=1e-4 * scale)
