"""Submesoscale MLE tests (reference: source/mix_submeso.F90)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import eos, submeso
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from pop2_tpu.eos import build_ts_range
from pop2_tpu.model import Model


def _setup(**kw):
    cfg = get_config("mini").with_(**kw)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    ts_range = build_ts_range(np.asarray(grid.vgrid.zt), cfg.jnp_dtype)
    return cfg, grid, bc, ts_range


def _tracers_with_front(cfg, grid, dT=2.0):
    """Stratified T with a zonal front in the upper layers."""
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    zt = np.asarray(grid.vgrid.zt)
    T = 20.0 - 8.0 * zt[:, None, None] / zt[-1] * np.ones((km, ny, nx))
    front = dT * np.sin(2 * np.pi * np.arange(nx) / nx)[None, None, :]
    decay = np.exp(-zt / 150.0e2)[:, None, None]
    T = T + front * decay
    S = np.full((km, ny, nx), 0.0347)
    trcr = jnp.stack([jnp.asarray(T), jnp.asarray(S)])
    return jnp.where(grid.kmask_t[None], trcr, 0.0)


def test_no_gradient_no_tendency():
    cfg, grid, bc, ts_range = _setup()
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    zt = np.asarray(grid.vgrid.zt)
    T = (20.0 - 8.0 * zt / zt[-1])[:, None, None] * np.ones((km, ny, nx))
    trcr = jnp.stack([jnp.asarray(T), jnp.full((km, ny, nx), 0.0347)])
    trcr = jnp.where(grid.kmask_t[None], trcr, 0.0)
    ml = jnp.full((ny, nx), 200.0e2)
    g, _ = submeso.submeso_tendency(cfg, grid, bc, ts_range, trcr, hmxl=ml)
    # gradients only at land edges (masked diffs there are zero by KMTE/N);
    # interior tendency must vanish
    assert float(jnp.abs(g).max()) < 1e-12


def test_conservation():
    """Skew-flux form conserves each tracer globally."""
    cfg, grid, bc, ts_range = _setup()
    trcr = _tracers_with_front(cfg, grid)
    ml = jnp.full((cfg.ny, cfg.nx), 250.0e2)
    g, _ = submeso.submeso_tendency(cfg, grid, bc, ts_range, trcr, hmxl=ml)
    w = grid.TAREA * grid.vgrid.dz[:, None, None]
    tot = float(jnp.sum(g[0] * w))
    scale = float(jnp.sum(jnp.abs(g[0]) * w)) + 1e-30
    assert abs(tot) < 1e-10 * scale
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0  # actually active


def test_releases_potential_energy():
    """The MLE overturning extracts available PE: d/dt sum(rho*g*z) < 0."""
    cfg, grid, bc, ts_range = _setup()
    trcr = _tracers_with_front(cfg, grid, dT=3.0)
    ml = jnp.full((cfg.ny, cfg.nx), 250.0e2)
    g, hls = submeso.submeso_tendency(cfg, grid, bc, ts_range, trcr,
                                      hmxl=ml)
    _, drdt, drds = eos.state(cfg, grid.vgrid.pressz, trcr[0], trcr[1],
                              ts_range, want_drhodt=True, want_drhods=True)
    drho_dt = drdt * g[0] + drds * g[1]
    w = grid.TAREA * grid.vgrid.dz[:, None, None]
    z = grid.vgrid.zt[:, None, None]  # depth positive down
    # PE = -g * sum(rho * depth): overturning moves light up, dense down
    dpe = -const.GRAV * float(jnp.sum(drho_dt * z * w))
    assert dpe < 0.0
    assert float(jnp.min(hls)) >= 0.0


def test_model_runs_with_submeso():
    cfg = get_config("mini").with_(lsubmeso=True, vmix="kpp")
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])
