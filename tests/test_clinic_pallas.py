"""Equivalence of the fused Pallas momentum (clinic) kernel against the jnp
chain it replaces (advu + coriolis + gradp + hdiffu_del2 + vdiffu + ZX/ZY),
following the kernel-vs-oracle pattern of test_tracer_pallas.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import advect, hmix, pgrad, vmix
from pop2_tpu import clinic_pallas
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc, thickness_u
from pop2_tpu import constants as const


def _jnp_chain(cfg, grid, bc, ucur, vcur, uold, vold, umix, vmixm,
               rho_old, rho_cur, rho_new, vvc, smf, dhu, leapfrog):
    gamma = cfg.time.gamma
    luk, lvk = advect.advu(cfg, grid, bc, ucur, vcur, dhu)
    fx, fy = -luk, -lvk
    if cfg.time.impcor and leapfrog:
        fx = fx + grid.FCOR * (gamma * vcur + (1.0 - gamma) * vold)
        fy = fy - grid.FCOR * (gamma * ucur + (1.0 - gamma) * uold)
    elif leapfrog:
        fx = fx + grid.FCOR * vcur
        fy = fy - grid.FCOR * ucur
    else:
        fx = fx + grid.FCOR * vold
        fy = fy - grid.FCOR * uold
    bouss = pgrad.bouss_factor(cfg, grid.vgrid.pressz)
    pkx, pky = pgrad.gradp(cfg, grid, bc, bouss, rho_old, rho_cur,
                           rho_new, leapfrog)
    fx, fy = fx - pkx, fy - pky
    hduk, hdvk = hmix.hdiffu(cfg, grid, bc, umix, vmixm)
    fx, fy = fx + hduk, fy + hdvk
    du, dv = vmix.vdiffu(cfg, grid, vvc, uold, vold, smf)
    fx, fy = fx + du, fy + dv
    fx = jnp.where(grid.kmask_u, fx, 0.0)
    fy = jnp.where(grid.kmask_u, fy, 0.0)
    dzc = thickness_u(cfg, grid)
    zx = grid.HUR * jnp.sum(fx * dzc, axis=0)
    zy = grid.HUR * jnp.sum(fy * dzc, axis=0)
    return fx, fy, zx, zy


def _random_inputs(cfg, grid, seed=0):
    rng = np.random.RandomState(seed)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    f32 = np.float32
    mask_u = np.asarray(grid.kmask_u)
    mask_t = np.asarray(grid.kmask_t)

    def vel():
        return (rng.randn(km, ny, nx) * 10.0 * mask_u).astype(f32)

    ucur, vcur, uold, vold = vel(), vel(), vel(), vel()
    rho = [(rng.randn(km, ny, nx) * 1e-3 * mask_t).astype(f32)
           for _ in range(3)]
    vvc = (rng.uniform(0.0, 10.0, (km, ny, nx)) * mask_u).astype(f32)
    smf = (rng.randn(2, ny, nx) * mask_u[0]).astype(f32)
    dhu = (rng.randn(ny, nx) * 1e-4 * mask_u[0]).astype(f32)
    return ucur, vcur, uold, vold, rho, vvc, smf, dhu


@pytest.mark.parametrize("preset,leapfrog,impcor",
                         [("test", True, True),
                          ("test", False, True),
                          ("mini", True, False)])
def test_fused_clinic_matches_jnp(preset, leapfrog, impcor):
    import dataclasses
    cfg = get_config(preset).with_(dtype="float32")
    cfg = dataclasses.replace(
        cfg, time=dataclasses.replace(cfg.time, impcor=impcor))
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    ucur, vcur, uold, vold, rho, vvc, smf, dhu = _random_inputs(cfg, grid)
    rho_old, rho_cur, rho_new = rho
    # leapfrog umix/vmix = old-time velocities (baroclinic.driver)
    umix, vmixm = (uold, vold) if leapfrog else (ucur, vcur)

    want = _jnp_chain(cfg, grid, bc, ucur, vcur, uold, vold, umix, vmixm,
                      rho_old, rho_cur, rho_new, vvc, smf, dhu, leapfrog)

    km = cfg.km
    f32 = jnp.float32
    if cfg.lpressure_avg and leapfrog:
        rhoavg = 0.25 * (rho_new + 2.0 * rho_cur + rho_old)
    else:
        rhoavg = jnp.asarray(rho_cur)
    bouss = pgrad.bouss_factor(cfg, grid.vgrid.pressz)
    rhoavg = rhoavg * jnp.reshape(bouss, (km, 1, 1))
    if cfg.time.impcor and leapfrog:
        wc, wo = cfg.time.gamma, 1.0 - cfg.time.gamma
    elif leapfrog:
        wc, wo = 1.0, 0.0
    else:
        wc, wo = 0.0, 1.0
    dz = grid.vgrid.dz.astype(f32)
    dz_kp1 = jnp.concatenate([dz[1:], dz[-1:]])
    facs = (grid.vgrid.dzw[0:km] * (const.GRAV * 0.5)).astype(f32)
    params = jnp.array([cfg.auto_am, cfg.bottom_drag, wc, wo], f32)

    got = clinic_pallas.clinic_rhs_tiles(
        ucur, vcur, uold, vold, umix, vmixm, rhoavg, vvc,
        clinic_pallas.pack_g2d(cfg, grid), grid.KMU, dhu, smf,
        dz, (1.0 / dz).astype(f32), (0.5 / dz).astype(f32),
        (1.0 / (0.5 * (dz + dz_kp1))).astype(f32), facs, params,
        ew=cfg.ew_boundary, interpret=True)

    for g, w, name in zip(got, want, ("fx", "fy", "zx", "zy")):
        g, w = np.asarray(g), np.asarray(w)
        scale = np.abs(w).max() or 1.0
        np.testing.assert_allclose(g, w, rtol=0, atol=4e-5 * scale,
                                   err_msg=name)


def test_dispatch_wired_into_baroclinic():
    """Forcing the kernel on (interpret mode) must not change Model.advance
    results beyond fp32 tolerance."""
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(dtype="float32")

    old_use = clinic_pallas.USE_PALLAS
    old_interp = clinic_pallas.force_interpret
    try:
        clinic_pallas.USE_PALLAS = False
        m = Model(cfg)
        s_ref = m.initial_state()
        for _ in range(3):
            s_ref, _ = m.advance(s_ref)

        clinic_pallas.USE_PALLAS = True
        clinic_pallas.force_interpret = True
        m2 = Model(cfg)
        s_k = m2.initial_state()
        for _ in range(3):
            s_k, _ = m2.advance(s_k)
    finally:
        clinic_pallas.USE_PALLAS = old_use
        clinic_pallas.force_interpret = old_interp

    for field in ("u_cur", "v_cur", "tracer_cur", "psurf_cur"):
        ref = np.asarray(getattr(s_ref, field))
        got = np.asarray(getattr(s_k, field))
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4 * scale,
                                   err_msg=field)


def _wrapper_case(ns_boundary, hmix_momentum, seed=11):
    """Drive the full clinic_rhs wrapper (kernel + aniso add-in + tripole
    top-row patch) against the jnp chain."""
    from types import SimpleNamespace
    cfg = get_config("mini").with_(dtype="float32", nx=64, ny=64,
                                   ns_boundary=ns_boundary,
                                   hmix_momentum=hmix_momentum)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    ucur, vcur, uold, vold, rho, vvc, smf, dhu = _random_inputs(cfg, grid,
                                                               seed=seed)
    rho_old, rho_cur, rho_new = rho
    umix, vmixm = uold, vold
    want = _jnp_chain(cfg, grid, bc, ucur, vcur, uold, vold, umix, vmixm,
                      rho_old, rho_cur, rho_new, vvc, smf, dhu, True)

    state = SimpleNamespace(u_cur=jnp.asarray(ucur), v_cur=jnp.asarray(vcur),
                            u_old=jnp.asarray(uold), v_old=jnp.asarray(vold),
                            rho_old=jnp.asarray(rho_old),
                            rho_cur=jnp.asarray(rho_cur))
    old = clinic_pallas.force_interpret
    old_use = clinic_pallas.USE_PALLAS
    try:
        clinic_pallas.force_interpret = True
        clinic_pallas.USE_PALLAS = True
        assert clinic_pallas.available(cfg, grid)
        got = clinic_pallas.clinic_rhs(cfg, grid, state, jnp.asarray(umix),
                                       jnp.asarray(vmixm),
                                       jnp.asarray(rho_new),
                                       jnp.asarray(vvc), jnp.asarray(smf),
                                       jnp.asarray(dhu), True)
    finally:
        clinic_pallas.force_interpret = old
        clinic_pallas.USE_PALLAS = old_use
    for g, w, name in zip(got, want, ("fx", "fy", "zx", "zy")):
        g, w = np.asarray(g), np.asarray(w)
        scale = np.abs(w).max() or 1.0
        np.testing.assert_allclose(g, w, rtol=0, atol=4e-5 * scale,
                                   err_msg=name)


def test_clinic_wrapper_tripole():
    """Tripole NS: the kernel + top-row slab patch matches the jnp chain
    (the production gx1v7 boundary)."""
    _wrapper_case("tripole", "del2")


def test_clinic_wrapper_aniso():
    """Anisotropic viscosity via with_hdiffu=False + jnp add-in."""
    _wrapper_case("closed", "aniso")


def test_clinic_wrapper_tripole_aniso():
    """The full production momentum menu: tripole + anisotropic."""
    _wrapper_case("tripole", "aniso")


@pytest.mark.parametrize("nsb", ["closed", "tripole"])
def test_clinic_sharded_front_end_matches_jnp(nsb):
    """The clinic kernel's shard_map/ppermute halo front-end on an (8, 1)
    virtual mesh reproduces the jnp chain (round-4 verdict item 4)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import types
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg = get_config("mini").with_(dtype="float32", mesh_shape=(8, 1),
                                   nx=64, ny=64, ns_boundary=nsb)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    ucur, vcur, uold, vold, rho, vvc, smf, dhu = _random_inputs(cfg, grid,
                                                                seed=11)
    rho_old, rho_cur, rho_new = rho
    umix, vmixm = uold, vold
    leapfrog = True

    want = _jnp_chain(cfg, grid, bc, ucur, vcur, uold, vold, umix, vmixm,
                      rho_old, rho_cur, rho_new, vvc, smf, dhu, leapfrog)

    state = types.SimpleNamespace(
        u_cur=jnp.asarray(ucur), v_cur=jnp.asarray(vcur),
        u_old=jnp.asarray(uold), v_old=jnp.asarray(vold),
        rho_old=jnp.asarray(rho_old), rho_cur=jnp.asarray(rho_cur))

    mesh = pmesh.make_mesh((8, 1))
    old_use = clinic_pallas.USE_PALLAS
    old_interp = clinic_pallas.force_interpret
    try:
        clinic_pallas.USE_PALLAS = True
        clinic_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert clinic_pallas.available(cfg, grid)
            got = clinic_pallas.clinic_rhs(
                cfg, grid, state, jnp.asarray(umix), jnp.asarray(vmixm),
                jnp.asarray(rho_new), jnp.asarray(vvc), jnp.asarray(smf),
                jnp.asarray(dhu), leapfrog)
    finally:
        clinic_pallas.USE_PALLAS = old_use
        clinic_pallas.force_interpret = old_interp

    for g, w, name in zip(got, want, ("fx", "fy", "zx", "zy")):
        g, w = np.asarray(g), np.asarray(w)
        scale = np.abs(w).max() or 1.0
        np.testing.assert_allclose(g, w, rtol=0, atol=4e-5 * scale,
                                   err_msg=name)
