"""Golden-value validation of the KPP boundary-layer pipeline against an
independent NumPy transliteration of the reference (tests/reference_oracle/
okpp.py <- source/vmix_kpp.F90:2002-2760, 3234-3342, 3699-3877).

The seam is the bldepth call boundary: both sides receive the same DBLOC/
DBSFC/velocity/forcing inputs; each computes its own surface buoyancy
forcing (independent MWJF expansion-coefficient implementations), bulk
Richardson numbers, crossing interpolation, Ekman/Monin-Obukhov limits,
and smoothing. This gives the branchiest physics in the model value-level
(not just property) validation, as the dynamics already have (PARITY.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import kpp
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from tests.reference_oracle import okpp


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test").with_(
        vmix="kpp", sw_absorption="jerlov", jerlov_water_type=3,
        kpp_lshort_wave=True, kpp_lcheckekmo=True)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    st = kpp.build_statics(cfg, grid)
    return cfg, grid, bc, st


def _inputs(cfg, grid, seed=7):
    rng = np.random.RandomState(seed)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    mask_t = np.asarray(grid.kmask_t)
    mask_u = np.asarray(grid.kmask_u)
    zt = np.asarray(grid.vgrid.zt)

    # stably stratified T/S with smooth perturbations; a few convective
    # columns from the noise exercise the unstable branches
    tprof = 2.0 + 16.0 * np.exp(-zt / 8.0e4)
    sprof = 0.0347 - 0.0005 * np.exp(-zt / 5.0e4)
    T = (tprof[:, None, None]
         + 0.5 * rng.randn(km, ny, nx)) * mask_t
    S = (sprof[:, None, None]
         + 2.0e-4 * rng.randn(km, ny, nx)) * mask_t
    trcr = np.stack([T, S])
    u = (5.0 * rng.randn(km, ny, nx) * mask_u)
    v = (5.0 * rng.randn(km, ny, nx) * mask_u)
    stf = (2.0e-5 * rng.randn(2, ny, nx) * mask_t[0])
    qsw = (np.abs(2.0e-5 * rng.randn(ny, nx)) * mask_t[0])
    smft = (0.5 * rng.randn(2, ny, nx) * mask_t[0])
    return trcr, u, v, stf, qsw, smft


def test_bldepth_matches_reference_transliteration(setup):
    cfg, grid, bc, st = setup
    trcr, u, v, stf, qsw, smft = _inputs(cfg, grid)

    dbloc, dbsfc = kpp.buoydiff(cfg, grid, st, jnp.asarray(trcr))
    hblt_f, ustar_f, bfsfc_f, stable_f, kbl_f = kpp.bldepth(
        cfg, grid, bc, st, dbloc, dbsfc, jnp.asarray(trcr),
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(stf),
        jnp.asarray(qsw), jnp.asarray(smft))

    zt = np.asarray(grid.vgrid.zt)
    zw = np.asarray(grid.vgrid.zw)
    dz = np.asarray(grid.vgrid.dz)
    hblt_o, ustar_o, bfsfc_o, stable_o, kbl_o = okpp.bldepth(
        zt, zw, dz, np.asarray(grid.KMT), np.asarray(grid.FCORT),
        trcr, u, v, stf, qsw, smft,
        float(grid.vgrid.pressz[0]),
        lshort_wave=True, lcheckekmo=True,
        water_type=cfg.jerlov_water_type,
        DBLOC=np.asarray(dbloc), DBSFC=np.asarray(dbsfc))

    ocean = np.asarray(grid.KMT) > 0
    np.testing.assert_allclose(np.asarray(ustar_f)[ocean], ustar_o[ocean],
                               rtol=1e-12)
    # the two MWJF implementations are independent; expansion-coefficient
    # agreement transfers to the buoyancy forcing
    np.testing.assert_allclose(np.asarray(bfsfc_f)[ocean], bfsfc_o[ocean],
                               rtol=0, atol=1e-13)
    assert (np.asarray(stable_f)[ocean] == stable_o[ocean]).all()

    kbl_f = np.asarray(kbl_f)
    flips = int((kbl_f[ocean] != kbl_o[ocean]).sum())
    assert flips == 0, f"{flips} KBL decisions differ"
    scale = np.abs(hblt_o[ocean]).max()
    np.testing.assert_allclose(np.asarray(hblt_f)[ocean], hblt_o[ocean],
                               rtol=0, atol=1e-9 * scale)


def test_wscale_matches_reference_formulas(setup):
    """All six similarity-law branches (vmix_kpp.F90:3234-3342) at random
    stability parameters spanning stable, weakly and strongly convective."""
    rng = np.random.RandomState(3)
    n = 4096
    sigma = rng.uniform(0.0, 1.0, n)
    hbl = rng.uniform(1.0e2, 5.0e5, n)     # 1 m .. 5 km
    ustar = rng.uniform(0.0, 3.0, n)
    bfsfc = rng.standard_normal(n) * 2.0e-5

    wm_f, ws_f = kpp.wscale(jnp.asarray(sigma), jnp.asarray(hbl),
                            jnp.asarray(ustar), jnp.asarray(bfsfc))
    wm_o, ws_o = okpp.wscale(sigma, hbl, ustar, bfsfc, 3)
    np.testing.assert_allclose(np.asarray(wm_f), wm_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ws_f), ws_o, rtol=1e-12)


def test_eos_expansion_coefficients(setup):
    """TALPHA/SBETA (drho/dT, drho/dS) of the two independent MWJF
    implementations agree (state_mod.F90:475-499)."""
    from pop2_tpu import eos
    rng = np.random.RandomState(11)
    T = rng.uniform(-2.0, 30.0, 2048)
    S = rng.uniform(0.030, 0.040, 2048)
    rho_f, dt_f, ds_f = eos.mwjf_rho(jnp.asarray(T), jnp.asarray(S), 0.0,
                                     want_drhodt=True, want_drhods=True)
    rho_o, dt_o, ds_o = okpp.state_mwjf_derivs(T, S, 0.0)
    np.testing.assert_allclose(np.asarray(rho_f), rho_o, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(dt_f), dt_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds_f), ds_o, rtol=1e-12)
