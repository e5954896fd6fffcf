"""Anisotropic viscosity tests (reference: source/hmix_aniso.F90).

Oracles: positive-definite energy dissipation (the design property of the
functional quarter-cell discretization, hdiffu_aniso header :567-570),
vanishing friction for uniform flow on a uniform grid, the
western-boundary-distance recursion, and stable model integration.
"""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import hmix_aniso
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from pop2_tpu.model import Model


def _aniso_cfg(**kw):
    base = dict(hmix_momentum="aniso", lvariable_hmix_aniso=True)
    base.update(kw)
    return get_config("mini").with_(**base)


def _rand_uv(grid, seed=0):
    rng = np.random.default_rng(seed)
    shp = grid.kmask_u.shape
    u = jnp.where(grid.kmask_u, jnp.asarray(rng.normal(size=shp)), 0.0)
    v = jnp.where(grid.kmask_u, jnp.asarray(rng.normal(size=shp)), 0.0)
    return u, v


def _dissipation(grid, u, v, hdu, hdv):
    w = grid.UAREA * grid.vgrid.dz[:, None, None]
    return float(jnp.sum((u * hdu + v * hdv) * w))


def test_energy_dissipation_all_alignments():
    """u.F dA <= 0 for visc_para >= visc_perp (hdiffu_aniso :567-570)."""
    for align in ("grid", "east", "flow"):
        cfg = _aniso_cfg(aniso_alignment=align, lvariable_hmix_aniso=False,
                         visc_para=1.0e7, visc_perp=2.0e6)
        grid = build_grid(cfg)
        bc = grid_bc(cfg)
        for seed in (0, 1):
            u, v = _rand_uv(grid, seed)
            hdu, hdv = hmix_aniso.hdiffu_aniso(cfg, grid, bc, grid.aniso,
                                               u, v)
            diss = _dissipation(grid, u, v, hdu, hdv)
            norm = float(jnp.sum(grid.UAREA * jnp.sum(u * u + v * v, 0)))
            assert diss < 0.0, (align, seed)
            assert diss < -1e-10 * norm  # strictly dissipative


def test_variable_viscosity_dissipates():
    cfg = _aniso_cfg(aniso_alignment="east")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    u, v = _rand_uv(grid, 2)
    hdu, hdv = hmix_aniso.hdiffu_aniso(cfg, grid, bc, grid.aniso, u, v)
    assert _dissipation(grid, u, v, hdu, hdv) < 0.0
    assert np.isfinite(np.asarray(hdu)).all()
    # masked on land
    assert np.abs(np.asarray(hdu)[~np.asarray(grid.kmask_u)]).max() == 0.0


def test_operator_self_adjoint():
    """The functional discretization is the gradient of a quadratic energy
    functional, so the linear map (u,v) -> (HDU,HDV) must be self-adjoint in
    the UAREA-weighted inner product (hdiffu_aniso :567-570). Exact oracle,
    valid for the velocity-independent alignments."""
    for align in ("grid", "east"):
        cfg = _aniso_cfg(aniso_alignment=align, lvariable_hmix_aniso=False,
                         visc_para=1.0e7, visc_perp=2.0e6)
        grid = build_grid(cfg)
        bc = grid_bc(cfg)
        u1, v1 = _rand_uv(grid, 3)
        u2, v2 = _rand_uv(grid, 4)
        f1 = hmix_aniso.hdiffu_aniso(cfg, grid, bc, grid.aniso, u1, v1)
        f2 = hmix_aniso.hdiffu_aniso(cfg, grid, bc, grid.aniso, u2, v2)
        w = grid.UAREA
        ip12 = float(jnp.sum((u1 * f2[0] + v1 * f2[1]) * w))
        ip21 = float(jnp.sum((u2 * f1[0] + v2 * f1[1]) * w))
        scale = abs(ip12) + abs(ip21) + 1e-30
        assert abs(ip12 - ip21) < 1e-12 * scale, align


def test_west_boundary_distance():
    htn = np.full((1, 10), 2.0)
    kmu = np.ones((1, 10), dtype=np.int32)
    kmu[0, 3] = 0  # single land point at i=3
    d = hmix_aniso._west_boundary_distance(kmu, htn, 1, nwb_buffer=2)
    # buffer: i=3,4,5 -> 0; then cumulative 2 cm per cell going east,
    # wrapping through i=9 into i=0..2 (reference ig==1 wrap case :1225-1236)
    np.testing.assert_allclose(
        d[0], [10.0, 12.0, 14.0, 0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 8.0])
    # no boundary -> DIST_MAX
    kmu[:] = 1
    d = hmix_aniso._west_boundary_distance(kmu, htn, 1, nwb_buffer=2)
    assert (d == hmix_aniso.DIST_MAX).all()


def test_ccsm_variable_viscosity_bounds():
    cfg = _aniso_cfg()
    grid = build_grid(cfg)
    st = grid.aniso
    fp = np.asarray(st.f_para)
    fq = np.asarray(st.f_perp)
    amax = np.asarray(st.amax_cfl)
    assert fp.shape == (cfg.km, cfg.ny, cfg.nx)
    assert (fp <= amax + 1e-6).all() and (fq <= amax + 1e-6).all()
    assert (fp >= min(cfg.vconst_6, amax.min()) - 1e-6).all()
    assert (fp > 0).all() and (fq > 0).all()


def test_model_runs_with_aniso():
    cfg = _aniso_cfg(aniso_alignment="east")
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(10):
        st, _ = m.advance(st)
    d = m.diagnostics(st)
    assert np.isfinite(d["KE"]) and d["KE"] > 0
