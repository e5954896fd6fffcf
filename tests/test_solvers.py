"""Barotropic solver tests: manufactured solutions on the test grid."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import solvers
from pop2_tpu.grid import grid_bc


def _make_problem(cfg, grid):
    """Operator with a varthick-like diagonal correction and a manufactured
    RHS b = A @ x_true with x_true smooth and zero on land."""
    dtp = cfg.time.dtp
    beta = cfg.time.alpha
    c2dtp = 2.0 * dtp
    diag_corr = jnp.where(grid.RCALCT > 0,
                          grid.TAREA / (beta * c2dtp * dtp * const.GRAV), 0.0)
    op = solvers.make_operator(grid, diag_corr)
    bc = grid_bc(cfg)
    x_true = (jnp.sin(3 * grid.TLON) * jnp.cos(2 * grid.TLAT)
              * grid.RCALCT * 1e3)
    b = solvers.apply_op(op, x_true, bc)
    return op, bc, x_true, b


def _check(cfg, grid, x, x_true, rr, iters):
    ocean = np.asarray(grid.RCALCT) > 0
    err = np.abs(np.asarray(x) - np.asarray(x_true))[ocean]
    scale = np.abs(np.asarray(x_true))[ocean].max()
    assert err.max() / scale < 1e-6, (err.max(), scale, int(iters))
    assert int(iters) < cfg.solver.max_iterations


def test_chrongear(test_cfg, test_grid):
    cfg = test_cfg.with_()
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    x0 = jnp.zeros_like(x_true)
    x, iters, rr = solvers.chron_gear(cfg, op, bc, x0, b)
    _check(cfg, test_grid, x, x_true, rr, iters)


def test_pcg(test_cfg, test_grid):
    cfg = test_cfg
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    x0 = jnp.zeros_like(x_true)
    x, iters, rr = solvers.pcg(cfg, op, bc, x0, b)
    _check(cfg, test_grid, x, x_true, rr, iters)


def test_pcsi_with_lanczos(test_cfg, test_grid):
    cfg = test_cfg
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    eig_min, eig_max = solvers.lanczos_eigs(cfg, op, bc, n_iter=60)
    assert 0 < eig_min < eig_max
    x0 = jnp.zeros_like(x_true)
    x, iters, rr = solvers.pcsi(cfg, op, bc, x0, b, eig_min, eig_max)
    _check(cfg, test_grid, x, x_true, rr, iters)


def test_solvers_agree(test_cfg, test_grid):
    cfg = test_cfg
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    x0 = jnp.zeros_like(x_true)
    xa, _, _ = solvers.chron_gear(cfg, op, bc, x0, b)
    xb, _, _ = solvers.pcg(cfg, op, bc, x0, b)
    ocean = np.asarray(test_grid.RCALCT) > 0
    np.testing.assert_allclose(np.asarray(xa)[ocean], np.asarray(xb)[ocean],
                               rtol=1e-5, atol=1e-3)


def test_operator_symmetry(test_cfg, test_grid):
    """<y, Ax> == <x, Ay> over the masked domain — required by CG."""
    cfg = test_cfg
    op, bc, _, _ = _make_problem(cfg, test_grid)
    rng = np.random.RandomState(3)
    mask = np.asarray(test_grid.RCALCT)
    x = jnp.asarray(rng.randn(*mask.shape) * mask)
    y = jnp.asarray(rng.randn(*mask.shape) * mask)
    ax = solvers.apply_op(op, x, bc)
    ay = solvers.apply_op(op, y, bc)
    lhs = float(jnp.sum(y * ax * op.mask))
    rhs = float(jnp.sum(x * ay * op.mask))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
