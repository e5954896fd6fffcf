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


def test_solve_refined_reaches_f64_criterion(test_cfg, test_grid):
    """Mixed-precision iterative refinement (fp32 inner + compensated
    residual) meets the production 1e-13 rms criterion on an fp32 system,
    verified by an independent float64 true-residual evaluation."""
    import jax

    from pop2_tpu.config import SolverConfig

    cfg = test_cfg.with_(solver=SolverConfig(
        choice="PCSI", convergence_criterion=1e-13, max_iterations=1000,
        convergence_check_freq=10, convergence_check_start=60,
        solve_dtype="float64"))
    grid = test_grid
    op, bc, x_true, b = _make_problem(cfg, grid)
    op = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), op)
    b = b.astype(jnp.float32)
    eigs = solvers.lanczos_eigs(cfg, op, bc, n_iter=60)
    x0 = jnp.zeros_like(b)
    x, iters, rr = jax.jit(lambda x0, b: solvers.solve_refined(
        cfg, op, bc, x0, b, eigs=eigs))(x0, b)
    rn = float(np.asarray(grid.residual_norm))
    rms = float(np.sqrt(max(float(rr), 0.0) * rn))
    assert rms < 1e-13, (rms, int(iters))

    # genuine float64 residual of the returned solution: the (hi, lo)
    # pair collapses to one f32 on return, so the true residual sits at
    # the f32 storage floor — which must still be under the criterion —
    # while the compensated rr (the pair's residual) is below it
    f64 = lambda t: jax.tree_util.tree_map(                 # noqa: E731
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), t)
    r64 = f64(b) - solvers.apply_op(f64(op), f64(x), bc)
    rms64 = float(np.sqrt(float(jnp.sum((r64 * f64(op.mask)) ** 2)) * rn))
    assert rms64 < 1e-13, rms64
    assert rms <= rms64 * 1.2, (rms, rms64)


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


def test_file_preconditioner(test_cfg, test_grid):
    """9-pt 'file' preconditioner path: with the stencil reduced to the
    diagonal it reproduces the diagonal-preconditioned solve; with a
    one-step Neumann (SPAI-like) stencil it still converges to the same
    solution, in no more iterations."""
    import tempfile, os
    from pop2_tpu import solvers
    from pop2_tpu.barotropic import diagonal_correction
    from pop2_tpu.config import SolverConfig
    from pop2_tpu.grid import grid_bc

    cfg = test_cfg.with_(solver=SolverConfig(
        choice="ChronGear", convergence_criterion=1e-12,
        max_iterations=1000, convergence_check_freq=5))
    grid, bc = test_grid, grid_bc(cfg)
    op = solvers.make_operator(grid, diagonal_correction(cfg, grid, True))
    rng = np.random.RandomState(3)
    b = jnp.asarray(rng.randn(cfg.ny, cfg.nx)) * op.mask
    x0 = jnp.zeros_like(b)

    x_diag, it_diag, _ = solvers.chron_gear(cfg, op, bc, x0, b)

    # diagonal-as-file: identical behavior
    dinv = solvers._diag_precond(op)
    zero = jnp.zeros_like(dinv)
    pre_d = solvers.Precond9(center=dinv, north=zero, south=zero, east=zero,
                             west=zero, ne=zero, nw=zero, se=zero, sw=zero)
    cfg_f = cfg.with_(solver=cfg.solver.__class__(
        choice="ChronGear", convergence_criterion=1e-12,
        max_iterations=1000, convergence_check_freq=5,
        preconditioner="file"))
    x_f, it_f, _ = solvers.chron_gear(cfg_f, op, bc, x0, b, precond=pre_d)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_diag),
                               rtol=0, atol=1e-7)
    assert int(it_f) == int(it_diag)

    # one-step Neumann approximate inverse M^-1 = D^-1(2I - A D^-1) as the
    # 'file' stencil: must converge to the same solution, not slower
    pre_n = solvers.Precond9(
        center=dinv * (2.0 - op.center * dinv),
        north=-dinv * op.north * bc.n(dinv),
        south=-dinv * bc.s(op.north) * bc.s(dinv),
        east=-dinv * op.east * bc.e(dinv),
        west=-dinv * bc.w(op.east) * bc.w(dinv),
        ne=-dinv * op.ne * bc.ne(dinv),
        se=-dinv * bc.s(op.ne) * bc.se(dinv),
        nw=-dinv * bc.w(op.ne) * bc.nw(dinv),
        sw=-dinv * bc.sw(op.ne) * bc.sw(dinv))
    x_n, it_n, _ = solvers.chron_gear(cfg_f, op, bc, x0, b, precond=pre_n)
    # the operator has a (checkerboard) null space, so solutions from
    # different preconditioners may differ by a null component — the
    # convergence criterion is the residual
    res_n = np.asarray((b - solvers.apply_op(op, x_n, bc)) * op.mask)
    res_d = np.asarray((b - solvers.apply_op(op, x_diag, bc)) * op.mask)
    assert np.abs(res_n).max() < 10 * max(np.abs(res_d).max(), 1e-10)
    assert int(it_n) < cfg.solver.max_iterations  # converged
    assert int(it_n) <= int(it_diag)              # not slower than diagonal

    # round-trip through the file loader
    d = tempfile.mkdtemp()
    path = os.path.join(d, "precond.npz")
    np.savez(path, **{k: np.asarray(getattr(pre_n, k))
                      for k in solvers.Precond9._fields})
    loaded = solvers.load_precond(path, cfg.jnp_dtype)
    x_l, it_l, _ = solvers.chron_gear(cfg_f, op, bc, x0, b, precond=loaded)
    np.testing.assert_array_equal(np.asarray(x_l), np.asarray(x_n))


def test_pcsi_eigs_match_step_operator(test_cfg, test_grid):
    """Staleness guard for the init-time PCSI prep (the reference re-preps
    each solve, POP_SolversMod.F90:181-270): the eigenvalue bounds computed
    at Model init must bracket the Rayleigh quotients of the operator that
    barotropic.driver actually builds at step time, for both leapfrog
    flags. Fails if diagonal_correction ever gains a state/time dependence
    without a matching re-prep."""
    from pop2_tpu.barotropic import diagonal_correction
    from pop2_tpu.config import SolverConfig
    import dataclasses

    cfg = dataclasses.replace(test_cfg, solver=SolverConfig(choice="PCSI"))
    bc = grid_bc(cfg)
    mask = np.asarray(test_grid.RCALCT) > 0
    rng = np.random.RandomState(7)
    for leapfrog in (False, True):
        diag_corr = diagonal_correction(cfg, test_grid, leapfrog)
        op = solvers.make_operator(test_grid, diag_corr)
        emin, emax = solvers.lanczos_eigs(cfg, op, bc)
        # Rayleigh quotients of the symmetrized preconditioned operator
        d = np.abs(np.asarray(op.center))
        dmh = np.where(d > 0, 1.0 / np.sqrt(np.where(d > 0, d, 1.0)), 0.0)
        for _ in range(4):
            v = rng.randn(*mask.shape) * mask
            v /= np.sqrt((v * v).sum())
            av = -dmh * np.asarray(
                solvers.apply_op(op, jnp.asarray(dmh * v), bc)) * mask
            rq = float((v * av).sum())
            assert emin <= rq <= emax, (leapfrog, emin, rq, emax)


def test_spai_preconditioner_cuts_iterations(test_cfg, test_grid):
    """The generated 9-pt SPAI (solvers.build_spai9) must beat the
    diagonal preconditioner on both condition number (via Ritz bounds)
    and CG iteration count for a fixed relative reduction."""
    from pop2_tpu.config import SolverConfig

    cfg = test_cfg
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    sp = solvers.build_spai9(cfg, op)

    # symmetry of the symmetrized stencil: <Mx, y> == <x, My>
    rng = np.random.RandomState(5)
    mask = np.asarray(op.mask)
    xr = jnp.asarray(rng.randn(*mask.shape) * mask, b.dtype)
    yr = jnp.asarray(rng.randn(*mask.shape) * mask, b.dtype)
    cfg_sp = cfg.with_(solver=SolverConfig(preconditioner="spai"))
    minv = solvers.make_precond_apply(cfg_sp, op, bc, sp)
    lhs = float(jnp.sum(minv(xr) * yr * op.mask))
    rhs_ = float(jnp.sum(xr * minv(yr) * op.mask))
    assert abs(lhs - rhs_) < 1e-8 * (abs(lhs) + abs(rhs_) + 1e-30)

    rr0 = float(jnp.sum(b * b * op.mask))
    x0 = jnp.zeros_like(b)
    iters = {}
    for name, pc, pre in (("diag", "diagonal", None), ("spai", "spai", sp)):
        c2 = cfg.with_(solver=SolverConfig(
            choice="ChronGear", max_iterations=4000,
            convergence_check_freq=1, preconditioner=pc))
        x, it, rr = solvers.chron_gear(c2, op, bc, x0, b, precond=pre,
                                       tol=rr0 * 1e-16)
        iters[name] = int(it)
    assert iters["spai"] < 0.8 * iters["diag"], iters

    eigs_d = solvers.lanczos_eigs(cfg, op, bc)
    eigs_s = solvers.pcg_lanczos_eigs(cfg, op, bc, sp)
    assert eigs_s[1] / eigs_s[0] < 0.6 * eigs_d[1] / eigs_d[0]
    assert eigs_s[0] > 0.0


def test_solve_refined_spai_chrongear_inner(test_cfg, test_grid):
    """The production-mode refined solve (CG inner + SPAI) reaches the
    1e-13 criterion on an fp32 system in fewer total iterations than the
    diagonal path."""
    import jax
    from pop2_tpu.config import SolverConfig

    grid = test_grid
    base = dict(convergence_criterion=1e-13, max_iterations=1000,
                convergence_check_freq=10, convergence_check_start=60,
                solve_dtype="float64")
    rn = float(np.asarray(grid.residual_norm))
    tot = {}
    for name, pc in (("diag", "diagonal"), ("spai", "spai")):
        cfg = test_cfg.with_(solver=SolverConfig(
            choice="PCSI", preconditioner=pc, **base))
        op, bc, x_true, b = _make_problem(cfg, grid)
        op32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), op)
        b32 = b.astype(jnp.float32)
        pre = solvers.build_spai9(cfg, op32) if pc == "spai" else None
        eigs = (solvers.pcg_lanczos_eigs(cfg, op32, bc, pre) if pre
                else solvers.lanczos_eigs(cfg, op32, bc, n_iter=60))
        x0 = jnp.zeros_like(b32)
        x, iters, rr = jax.jit(lambda x0, b: solvers.solve_refined(
            cfg, op32, bc, x0, b, eigs=eigs, precond=pre))(x0, b32)
        rms = float(np.sqrt(max(float(rr), 0.0) * rn))
        assert rms < 1e-13, (name, rms, int(iters))
        tot[name] = int(iters)
    assert tot["spai"] < tot["diag"], tot


def test_fspai_preconditioner_spd_and_fast(test_cfg, test_grid):
    """The triangular factored SPAI (solvers.build_fspai9) must be SPD by
    construction, symmetric, correctly scaled, and cut the
    preconditioned condition number well below the diagonal's. (The
    unconstrained symmetrized SPAI was measured INDEFINITE on gx1v7 —
    breaking CG silently — which is why production uses the factored
    form.)"""
    import jax
    from pop2_tpu.solvers import (build_fspai9, fspai_apply, scale_fspai)

    cfg = test_cfg
    op, bc, x_true, b = _make_problem(cfg, test_grid)
    fp = build_fspai9(cfg, op)
    ap = fspai_apply(fp, bc)
    rng = np.random.RandomState(4)
    mask = np.asarray(op.mask)
    x = jnp.asarray(rng.randn(*mask.shape) * mask, b.dtype)
    y = jnp.asarray(rng.randn(*mask.shape) * mask, b.dtype)
    # symmetry
    lhs = float(jnp.sum(ap(x) * y * op.mask))
    rhs_ = float(jnp.sum(x * ap(y) * op.mask))
    assert abs(lhs - rhs_) < 1e-10 * (abs(lhs) + abs(rhs_))
    # -M positive definite on random vectors (A negative definite)
    for sd in range(4):
        r = jnp.asarray(np.random.RandomState(sd).randn(*mask.shape)
                        * mask, b.dtype)
        assert float(jnp.sum(-ap(r) * r * op.mask)) > 0.0
    # scaling identity: M~ r == si * M(si * r)
    d = jnp.abs(op.center)
    land = d == 0.0
    si = jnp.where(land, 0.0, jnp.sqrt(d))
    ap_s = fspai_apply(scale_fspai(fp, si, bc), bc)
    a1, a2 = ap_s(x), si * ap(si * x)
    scale = float(jnp.max(jnp.abs(a2))) + 1e-300
    assert float(jnp.max(jnp.abs(a1 - a2))) < 1e-12 * scale
    # conditioning beats diagonal
    eigs_f = solvers.pcg_lanczos_eigs(cfg, op, bc, fp)
    eigs_d = solvers.lanczos_eigs(cfg, op, bc)
    assert eigs_f[1] / eigs_f[0] < 0.5 * eigs_d[1] / eigs_d[0]


def test_solve_refined_fspai_production_mode(test_cfg, test_grid):
    """The production fp64-grade solve (scaled CG inner + triangular
    FSPAI + stall exit) reaches 1e-13 rms on an fp32 system."""
    import jax
    from pop2_tpu.config import SolverConfig

    grid = test_grid
    cfg = test_cfg.with_(solver=SolverConfig(
        choice="PCSI", convergence_criterion=1e-13, max_iterations=1000,
        convergence_check_freq=10, convergence_check_start=60,
        preconditioner="fspai", solve_dtype="float64"))
    op, bc, x_true, b = _make_problem(cfg, grid)
    op32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), op)
    b32 = b.astype(jnp.float32)
    fp = solvers.build_fspai9(cfg, op32)
    eigs = solvers.pcg_lanczos_eigs(cfg, op32, bc, fp)
    x0 = jnp.zeros_like(b32)
    x, iters, rr = jax.jit(lambda x0, b: solvers.solve_refined(
        cfg, op32, bc, x0, b, eigs=eigs, precond=fp))(x0, b32)
    rn = float(np.asarray(grid.residual_norm))
    rms = float(np.sqrt(max(float(rr), 0.0) * rn))
    assert rms < 1e-13, (rms, int(iters))
    assert int(iters) < 600, int(iters)
