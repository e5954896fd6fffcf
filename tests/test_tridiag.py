"""Tridiagonal solver tests vs a dense direct solve (oracle)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import tridiag


def _dense_solve(hfac, H1, A, kmax, rhs):
    """Build and solve the dense system for one column (oracle).

    Row k (0-based, k < kmax):
      (hfac_k + A_k*(k<kmax-1) + A_{k-1}*(k>0)) F_k
         - A_k F_{k+1} - A_{k-1} F_{k-1} = hfac_k*rhs_k
    with the k=0 mass term replaced by H1.
    """
    n = kmax
    if n == 0:
        return np.zeros_like(rhs)
    M = np.zeros((n, n))
    b = np.zeros(n)
    for k in range(n):
        mass = H1 if k == 0 else hfac[k]
        diag = mass
        if k < n - 1:
            diag += A[k]
            M[k, k + 1] = -A[k]
        if k > 0:
            diag += A[k - 1]
            M[k, k - 1] = -A[k - 1]
        M[k, k] = diag
        b[k] = hfac[k] * rhs[k]
    F = np.zeros_like(rhs)
    F[:n] = np.linalg.solve(M, b)
    return F


def test_impvmixt_matches_dense():
    rng = np.random.RandomState(0)
    km, ny, nx = 10, 4, 5
    dz = rng.uniform(0.5, 2.0, km)
    dzw = np.zeros(km + 1)
    dzw[0] = 0.5 * dz[0]
    dzw[1:km] = 0.5 * (dz[:-1] + dz[1:])
    dzw[km] = 0.5 * dz[-1]
    dzwr = 1.0 / dzw
    c2dtt = np.full(km, 100.0)
    kmt = rng.randint(0, km + 1, (ny, nx))
    # physical coefficient fields are zero at/below the column bottom
    # (schemes mask to k < KMT)
    vdc = rng.uniform(0.0, 0.3, (km, ny, nx)) * (
        np.arange(1, km + 1)[:, None, None] < kmt[None])
    rhs = rng.randn(km, ny, nx) * (np.arange(1, km + 1)[:, None, None]
                                   <= kmt[None])
    psurf = rng.randn(ny, nx) * 100.0

    aidif = 1.0
    dT = np.asarray(tridiag.impvmixt(
        jnp.asarray(rhs), jnp.asarray(vdc), jnp.asarray(psurf),
        jnp.asarray(kmt), jnp.asarray(dz), jnp.asarray(dzwr),
        jnp.asarray(c2dtt), aidif, varthick=True))

    from pop2_tpu import constants as const
    hfac = dz / c2dtt
    for j in range(ny):
        for i in range(nx):
            n = kmt[j, i]
            A = aidif * dzwr[1:km + 1] * vdc[:, j, i]
            if n > 0:
                A = A.copy()
                A[n - 1:] = 0.0  # no flux through the column bottom
            H1 = hfac[0] + psurf[j, i] / (const.GRAV * c2dtt[0])
            expect = _dense_solve(hfac, H1, A, n, rhs[:, j, i])
            np.testing.assert_allclose(dT[:, j, i], expect, atol=1e-12,
                                       err_msg=f"column {j},{i} kmt={n}")


def test_impvmixu_matches_dense():
    rng = np.random.RandomState(1)
    km, ny, nx = 8, 3, 4
    dz = rng.uniform(0.5, 2.0, km)
    dzw = np.zeros(km + 1)
    dzw[0] = 0.5 * dz[0]
    dzw[1:km] = 0.5 * (dz[:-1] + dz[1:])
    dzw[km] = 0.5 * dz[-1]
    dzwr = 1.0 / dzw
    c2dtu = 50.0
    kmu = rng.randint(0, km + 1, (ny, nx))
    vvc = rng.uniform(0.0, 0.3, (km, ny, nx)) * (
        np.arange(1, km + 1)[:, None, None] < kmu[None])
    mask = np.arange(1, km + 1)[:, None, None] <= kmu[None]
    rhs_u = rng.randn(km, ny, nx) * mask
    rhs_v = rng.randn(km, ny, nx) * mask

    Fu, Fv = tridiag.impvmixu(
        jnp.asarray(rhs_u), jnp.asarray(rhs_v), jnp.asarray(vvc),
        jnp.asarray(kmu), jnp.asarray(dz), jnp.asarray(dzwr), c2dtu, 1.0)
    Fu, Fv = np.asarray(Fu), np.asarray(Fv)

    hfac = dz / c2dtu
    for j in range(ny):
        for i in range(nx):
            n = kmu[j, i]
            A = dzwr[1:km + 1] * vvc[:, j, i]
            if n > 0:
                A = A.copy()
                A[n - 1:] = 0.0
            eu = _dense_solve(hfac, hfac[0], A, n, rhs_u[:, j, i])
            ev = _dense_solve(hfac, hfac[0], A, n, rhs_v[:, j, i])
            np.testing.assert_allclose(Fu[:, j, i], eu, atol=1e-12)
            np.testing.assert_allclose(Fv[:, j, i], ev, atol=1e-12)


def test_impvmixt_correct_is_surface_propagation():
    rng = np.random.RandomState(2)
    km, ny, nx = 6, 2, 2
    dz = np.ones(km)
    dzw = np.concatenate([[0.5], np.ones(km - 1), [0.5]])
    dzwr = 1.0 / dzw
    c2dtt = np.full(km, 10.0)
    vdc = rng.uniform(0.1, 0.5, (km, ny, nx))
    kmt = np.full((ny, nx), km)
    rhs1 = rng.randn(ny, nx)
    psurf = np.zeros((ny, nx))

    dT = tridiag.impvmixt_correct(
        jnp.asarray(rhs1), jnp.asarray(vdc), jnp.asarray(psurf),
        jnp.asarray(kmt), jnp.asarray(dz), jnp.asarray(dzwr),
        jnp.asarray(c2dtt), 1.0, varthick=True)
    rhs = np.zeros((km, ny, nx))
    rhs[0] = rhs1
    dT2 = tridiag.impvmixt(
        jnp.asarray(rhs), jnp.asarray(vdc), jnp.asarray(psurf),
        jnp.asarray(kmt), jnp.asarray(dz), jnp.asarray(dzwr),
        jnp.asarray(c2dtt), 1.0, varthick=True)
    np.testing.assert_allclose(np.asarray(dT), np.asarray(dT2), atol=1e-14)


def test_pallas_thomas_matches_scan(mini_cfg, mini_grid):
    """The Pallas Thomas kernel (interpret mode on CPU) must match the
    lax.scan path exactly in f32."""
    import jax.numpy as jnp
    from pop2_tpu import tridiag, tridiag_pallas

    cfg, grid = mini_cfg, mini_grid
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    rng = np.random.RandomState(7)
    f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    rhs = f32(2, km, ny, nx)
    vdc = jnp.abs(f32(km, ny, nx)) * 0.1
    psurf = f32(ny, nx) * 0.01
    dz32 = jnp.asarray(np.asarray(grid.vgrid.dz), jnp.float32)
    dzwr32 = jnp.asarray(np.asarray(grid.vgrid.dzwr), jnp.float32)
    c2dtt = jnp.full((km,), 2.0 * cfg.time.dtt, jnp.float32)

    try:
        tridiag_pallas.USE_PALLAS = False
        ref = jnp.stack([
            tridiag.impvmixt(rhs[n], vdc, psurf, grid.KMT, dz32, dzwr32,
                             c2dtt, 1.0, True) for n in range(2)])
        tridiag_pallas.USE_PALLAS = True
        tridiag_pallas.force_interpret = True
        out = tridiag.impvmixt_batch(rhs, vdc, psurf, grid.KMT, dz32,
                                     dzwr32, c2dtt, 1.0, True)
        u_ref = tridiag.impvmixu(rhs[0], rhs[1], vdc, grid.KMU, dz32,
                                 dzwr32, 2.0 * cfg.time.dtu, 1.0)
    finally:
        tridiag_pallas.USE_PALLAS = None
        tridiag_pallas.force_interpret = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
    # impvmixu ran through the kernel too (USE_PALLAS was forced on)
    assert np.isfinite(np.asarray(u_ref[0])).all()
