"""Operator-level tests: advection, pressure gradient, horizontal mixing,
vertical mixing — conservation and analytic oracles."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import advect, hmix, pgrad, vmix
from pop2_tpu.grid import grid_bc


def _rand_state(cfg, grid, seed=0):
    rng = np.random.RandomState(seed)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    kmask_u = np.asarray(grid.kmask_u)
    u = rng.randn(km, ny, nx) * 10.0 * kmask_u
    v = rng.randn(km, ny, nx) * 10.0 * kmask_u
    return jnp.asarray(u), jnp.asarray(v)


def test_flux_vel_continuity(test_cfg, test_grid):
    """WTKB must satisfy the discrete continuity equation level by level:
    WTKB_k - WTK_k = FC_k for k < KMT, where the face fluxes carry the
    layer thickness (source/advection.F90:2101-2114, PBC-general form).
    """
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid)
    dh = jnp.zeros((cfg.ny, cfg.nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    fc = (fv.vtn - fv.vts + fv.ute - fv.utw) * grid.TAREA_R
    below = np.concatenate([np.asarray(grid.kmask_t)[1:],
                            np.zeros_like(np.asarray(grid.kmask_t)[:1])])
    lhs = np.asarray(fv.wtkb - fv.wtk)[below]
    rhs = np.asarray(fc)[below]
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_advt_centered_constant_tracer(test_cfg, test_grid):
    """L(const) = 0 in the interior (flux form telescopes; with DH=0 the
    vertical and horizontal divergences cancel)."""
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid)
    dh = jnp.zeros((cfg.ny, cfg.nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    trcr = jnp.ones((cfg.nt, cfg.km, cfg.ny, cfg.nx)) * 3.7
    ltk = np.asarray(advect.advt_centered(cfg, grid, bc, fv, trcr))
    # interior: above the bottom level and ocean
    below = np.concatenate([np.asarray(grid.kmask_t)[1:],
                            np.zeros_like(np.asarray(grid.kmask_t)[:1])])
    scale = np.abs(ltk).max() + 1e-30
    interior = below & np.asarray(grid.kmask_t)
    assert np.abs(ltk[0][interior]).max() < 1e-17 * max(scale, 1e-6) + 1e-12


def test_advt_conserves_volume_integral(test_cfg, test_grid):
    """sum over ocean of L(T)*dz*TAREA == surface contribution only (zero
    with DH=0 and flat bottom): flux-form advection conserves tracer."""
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid, seed=4)
    dh = jnp.zeros((cfg.ny, cfg.nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    rng = np.random.RandomState(5)
    trcr = jnp.asarray(
        rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx)
        * np.asarray(grid.kmask_t)[None])
    ltk = np.asarray(advect.advt_centered(cfg, grid, bc, fv, trcr))
    dz = np.asarray(grid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(grid.TAREA)[None, None] * np.asarray(
        grid.kmask_t)[None]
    total = (ltk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(ltk) * w).sum(axis=(1, 2, 3))
    assert np.all(np.abs(total) < 1e-9 * scale)


def test_hdifft_conserves(test_cfg, test_grid):
    """Zero-flux land BC: area integral of ah*Del2(T) vanishes per level."""
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    rng = np.random.RandomState(6)
    trcr = jnp.asarray(rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx))
    hdtk = np.asarray(hmix.hdifft(cfg, grid, bc, trcr))
    w = np.asarray(grid.TAREA)[None, None] * np.asarray(grid.kmask_t)[None]
    total = (hdtk * w).sum(axis=(2, 3))
    scale = (np.abs(hdtk) * w).sum(axis=(2, 3)) + 1e-30
    assert np.all(np.abs(total) < 1e-9 * scale)


def test_hdifft_smooths_extrema(test_cfg, test_grid):
    """A positive bump must receive a negative tendency at its center."""
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    t = np.zeros((cfg.nt, cfg.km, cfg.ny, cfg.nx))
    j0, i0 = 64, 96
    t[:, :, j0, i0] = 1.0
    hdtk = np.asarray(hmix.hdifft(cfg, grid, bc, jnp.asarray(t)))
    assert hdtk[0, 0, j0, i0] < 0
    assert hdtk[0, 0, j0, i0 + 1] > 0


def test_gradp_uniform_density_is_zero(test_cfg, test_grid):
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    rho = jnp.ones((cfg.km, cfg.ny, cfg.nx)) * 1.027
    bouss = pgrad.bouss_factor(cfg, grid.vgrid.pressz)
    pkx, pky = pgrad.gradp(cfg, grid, bc, bouss, rho, rho, rho,
                           leapfrog=True)
    assert np.abs(np.asarray(pkx)).max() < 1e-10
    assert np.abs(np.asarray(pky)).max() < 1e-10


def test_gradp_depth_accumulates(test_cfg, test_grid):
    """With rho increasing linearly in x, |pkx| must grow with depth
    (hydrostatic accumulation)."""
    cfg, grid = test_cfg, test_grid
    bc = grid_bc(cfg)
    x = np.linspace(0, 1e-3, cfg.nx)[None, None, :]
    rho = jnp.asarray(np.broadcast_to(1.025 + x, (cfg.km, cfg.ny, cfg.nx)))
    cfg2 = cfg.with_(lbouss_correct=False)
    bouss = pgrad.bouss_factor(cfg2, grid.vgrid.pressz)
    pkx, _ = pgrad.gradp(cfg2, grid, bc, bouss, rho, rho, rho, leapfrog=True)
    pkx = np.asarray(pkx)
    kmask_u = np.asarray(test_grid.kmask_u)
    col = pkx[:, 60, 50]
    assert np.all(np.diff(col[kmask_u[:, 60, 50]]) > 0)


def test_vdiffu_damps_shear(test_cfg, test_grid):
    cfg, grid = test_cfg, test_grid
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    # strong surface current over quiescent deep water
    u = np.zeros((km, ny, nx))
    u[0] = 30.0 * np.asarray(grid.kmask_u[0])
    v = np.zeros_like(u)
    vvc = jnp.where(grid.kmask_u, 0.25, 0.0)
    smf = jnp.zeros((2, ny, nx))
    du, dv = vmix.vdiffu(cfg, grid, vvc, jnp.asarray(u), jnp.asarray(v), smf)
    du = np.asarray(du)
    ocean = np.asarray(grid.kmask_u[1]) & np.asarray(grid.kmask_u[0])
    assert np.all(du[0][ocean] < 0)   # surface decelerates
    assert np.all(du[1][ocean] > 0)   # layer below accelerates


def test_vdifft_conserves_without_forcing(test_cfg, test_grid):
    cfg, grid = test_cfg, test_grid
    rng = np.random.RandomState(7)
    told = jnp.asarray(rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx)
                       * np.asarray(grid.kmask_t)[None])
    vdc = jnp.stack([jnp.where(grid.kmask_t, 0.25, 0.0)] * 2)
    stf = jnp.zeros((cfg.nt, cfg.ny, cfg.nx))
    vdtk = np.asarray(vmix.vdifft(cfg, grid, vdc, told, stf))
    dz = np.asarray(grid.vgrid.dz)[None, :, None, None]
    colsum = (vdtk * dz).sum(axis=1)
    assert np.abs(colsum).max() < 1e-10 * max(np.abs(vdtk).max(), 1.0)


def test_rich_coeffs_finite_and_capped(test_cfg, test_grid):
    cfg = test_cfg.with_(vmix="rich")
    grid = test_grid
    bc = grid_bc(cfg)
    rng = np.random.RandomState(8)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    kmask_t = np.asarray(grid.kmask_t)
    T = 15.0 - 10.0 * np.linspace(0, 1, km)[:, None, None] + \
        0.1 * rng.randn(km, ny, nx)
    S = 0.0347 + 1e-4 * rng.randn(km, ny, nx)
    tmix = jnp.asarray(np.stack([T * kmask_t, S * kmask_t]))
    u, v = _rand_state(cfg, grid, seed=9)
    from pop2_tpu import eos
    rho = eos.state(cfg, grid.vgrid.pressz, tmix[0], tmix[1])
    coeffs = vmix.vmix_coeffs(cfg, grid, bc, tmix, u, v, rho)
    vdc = np.asarray(coeffs.vdc)
    vvc = np.asarray(coeffs.vvc)
    assert np.isfinite(vdc).all() and np.isfinite(vvc).all()
    assert vdc.max() <= cfg.convect_diff + 1e-12
    assert vvc.max() <= cfg.convect_visc + 1e-12
    assert vdc.min() >= 0 and vvc.min() >= 0


def test_advt_upwind3_conserves_and_runs(test_cfg, test_grid):
    """upwind3: conservation of the volume integral (flux form) and constant
    preservation in the interior."""
    cfg = test_cfg.with_(tadvect="upwind3")
    grid = test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid, seed=10)
    dh = jnp.zeros((cfg.ny, cfg.nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    rng = np.random.RandomState(11)
    kmask = np.asarray(grid.kmask_t)
    trcr = jnp.asarray(rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx)
                       * kmask[None])
    ltk = np.asarray(advect.advt(cfg, grid, bc, fv, trcr))
    assert np.isfinite(ltk).all()
    dz = np.asarray(grid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(grid.TAREA)[None, None] * kmask[None]
    total = (ltk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(ltk) * w).sum(axis=(1, 2, 3))
    assert np.all(np.abs(total) < 1e-9 * scale)

    # constant tracer -> zero tendency in the interior (above bottom)
    tconst = jnp.asarray(np.full((cfg.nt, cfg.km, cfg.ny, cfg.nx), 2.5))
    lt0 = np.asarray(advect.advt(cfg, grid, bc, fv, tconst))
    below = np.concatenate([kmask[1:], np.zeros_like(kmask[:1])])
    interior = below & kmask
    assert np.abs(lt0[0][interior]).max() < 1e-10


def test_hdifft_del4_conserves_and_damps(test_cfg, test_grid):
    cfg = test_cfg.with_(hmix_tracer="del4")
    grid = test_grid
    bc = grid_bc(cfg)
    rng = np.random.RandomState(12)
    trcr = jnp.asarray(rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx)
                       * np.asarray(grid.kmask_t)[None])
    hdtk = np.asarray(hmix.hdifft(cfg, grid, bc, trcr))
    assert np.isfinite(hdtk).all()
    # conservation per level (two zero-flux Laplacians telescope)
    w = np.asarray(grid.TAREA)[None, None] * np.asarray(grid.kmask_t)[None]
    total = (hdtk * w).sum(axis=(2, 3))
    scale = (np.abs(hdtk) * w).sum(axis=(2, 3)) + 1e-30
    assert np.all(np.abs(total) < 1e-9 * scale)
    # biharmonic with negative coefficient damps grid noise: variance of
    # tendency opposes the checkerboard component
    t_noise = np.zeros((cfg.nt, cfg.km, cfg.ny, cfg.nx))
    jj, ii = np.meshgrid(np.arange(cfg.ny), np.arange(cfg.nx), indexing="ij")
    t_noise[:, :] = ((-1.0) ** (jj + ii)) * np.asarray(grid.kmask_t)
    hd = np.asarray(hmix.hdifft(cfg, grid, bc, jnp.asarray(t_noise)))
    interior = np.asarray(grid.kmask_t)
    corr = (hd[0] * t_noise[0])[interior].sum()
    assert corr < 0  # tendency anti-correlates with the noise


def test_hdiffu_del4_runs(test_cfg, test_grid):
    cfg = test_cfg.with_(hmix_momentum="del4")
    grid = test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid, seed=13)
    hdu, hdv = hmix.hdiffu(cfg, grid, bc, u, v)
    hdu = np.asarray(hdu)
    assert np.isfinite(hdu).all()
    assert (np.asarray(hdu)[~np.asarray(grid.kmask_u)] == 0).all()


def test_advt_lw_lim_conserves_and_preserves_constants(test_cfg, test_grid):
    """lw_lim: pure flux form -> the volume integral of L(T) vanishes; a
    constant tracer gets zero tendency above the bottom level."""
    cfg = test_cfg.with_(tadvect="lw_lim")
    grid = test_grid
    bc = grid_bc(cfg)
    u, v = _rand_state(cfg, grid, seed=20)
    dh = jnp.zeros((cfg.ny, cfg.nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    rng = np.random.RandomState(21)
    kmask = np.asarray(grid.kmask_t)
    trcr = jnp.asarray(rng.randn(cfg.nt, cfg.km, cfg.ny, cfg.nx)
                       * kmask[None])
    c2dtt = jnp.full((cfg.km,), 2.0 * cfg.time.dtt)
    ltk = np.asarray(advect.advt(cfg, grid, bc, fv, trcr, tmix=trcr,
                                 c2dtt=c2dtt))
    assert np.isfinite(ltk).all()
    dz = np.asarray(grid.vgrid.dz)[None, :, None, None]
    w = dz * np.asarray(grid.TAREA)[None, None] * kmask[None]
    total = (ltk * w).sum(axis=(1, 2, 3))
    scale = (np.abs(ltk) * w).sum(axis=(1, 2, 3))
    assert np.all(np.abs(total) < 1e-9 * scale)

    tconst = jnp.asarray(np.full((cfg.nt, cfg.km, cfg.ny, cfg.nx), 2.5))
    lt0 = np.asarray(advect.advt(cfg, grid, bc, fv, tconst, tmix=tconst,
                                 c2dtt=c2dtt))
    below = np.concatenate([kmask[1:], np.zeros_like(kmask[:1])])
    interior = below & kmask
    assert np.abs(lt0[0][interior]).max() < 1e-10


def test_advt_lw_lim_monotone_step(mini_cfg, mini_grid):
    """1-D advection of a step with uniform u: a forward step with the
    flux-limited scheme must create no new extrema (the scheme's raison
    d'etre vs centered, which oscillates)."""
    cfg = mini_cfg.with_(tadvect="lw_lim")
    grid = mini_grid
    bc = grid_bc(cfg)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    kmask_u = np.asarray(grid.kmask_u)
    # a uniform-in-x zonal flow on full-ocean rows is exactly divergence-free
    # on the B-grid (ute==utw, v=0 => w=0); rows containing land are zeroed so
    # the prescribed flow never converges into a masked bottom
    full_rows = kmask_u.all(axis=(0, 2))[None, :, None]
    u = jnp.asarray(1000.0 * kmask_u * full_rows)  # cm/s, CFL << 1
    v = jnp.zeros((km, ny, nx))
    dh = jnp.zeros((ny, nx))
    fv = advect.comp_flux_vel(cfg, grid, bc, u, v, dh)
    t0 = np.zeros((cfg.nt, km, ny, nx))
    t0[:, :, :, nx // 4:nx // 2] = 1.0          # step in x
    t0 *= np.asarray(grid.kmask_t)[None]
    dt = cfg.time.dtt
    c2dtt = jnp.full((km,), dt)
    ltk = np.asarray(advect.advt(cfg, grid, bc, fv, jnp.asarray(t0),
                                 tmix=jnp.asarray(t0), c2dtt=c2dtt))
    t1 = t0 - dt * ltk
    ocean = np.asarray(grid.kmask_t)
    assert t1[0][ocean].max() <= 1.0 + 1e-12
    assert t1[0][ocean].min() >= -1e-12
    # and the step actually moved: tendency is nonzero at the edges
    assert np.abs(ltk).max() > 0
