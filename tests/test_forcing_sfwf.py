"""Standalone surface-freshwater forcing (source/forcing_sfwf.F90):
restoring and bulk-NCEP formulations + the annual precip balancing."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import constants as const
from pop2_tpu import forcing_sfwf
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    grid = build_grid(cfg)
    return cfg, grid


def _fields(grid, seed=0):
    rng = np.random.RandomState(seed)
    ny, nx = grid.TAREA.shape
    ocean = np.asarray(grid.KMT) > 0
    sss = (0.0347 + 1e-4 * rng.randn(ny, nx)) * ocean
    salt = (0.0347 + 1e-4 * rng.randn(ny, nx)) * ocean
    sst = (10.0 + rng.randn(ny, nx)) * ocean
    qlat = (-50.0 + 10.0 * rng.randn(ny, nx)) * ocean     # W/m^2
    precip = np.abs(3e-5 * rng.randn(ny, nx)) * ocean     # kg/m^2/s
    ice = np.clip(rng.rand(ny, nx) - 0.7, 0.0, 1.0) / 0.3
    ocn_wgt = (1.0 - ice) * np.asarray(grid.RCALCT)
    return sss, salt, sst, qlat, precip, ocn_wgt


def test_restoring_formulation(setup):
    cfg, grid = setup
    cfg = cfg.with_(sfwf_formulation="restoring", sfwf_restore_tau=30.0)
    sss, salt, *_ = _fields(grid)
    out = forcing_sfwf.set_sfwf(cfg, grid, jnp.asarray(sss),
                                jnp.asarray(salt))
    dz1 = float(np.asarray(grid.vgrid.dz)[0])
    want = ((sss - salt) * dz1 / (30.0 * 86400.0)
            * np.asarray(grid.RCALCT))
    np.testing.assert_allclose(np.asarray(out.stf_salt), want, rtol=1e-6)


def test_bulk_ncep_weak_mean_removed(setup):
    """The weak restoring term's open-ocean area mean is subtracted, so
    its area integral over ocn_wgt*mask_sr vanishes (:1313-1332)."""
    cfg, grid = setup
    cfg = cfg.with_(sfwf_formulation="bulk-NCEP", sfc_layer="rigid")
    sss, salt, sst, qlat, precip, ocn_wgt = _fields(grid)
    args = [jnp.asarray(a) for a in (sss, salt, sst, qlat, precip,
                                     ocn_wgt)]
    out = forcing_sfwf.set_sfwf(cfg, grid, args[0], args[1],
                                sst_surf=args[2], qlat=args[3],
                                precip_data=args[4], ocn_wgt=args[5])
    # reconstruct: total - evap/precip part - strong part = weak part
    evap = qlat / const.LATENT_HEAT_VAPOR_MKS
    ep = ocn_wgt * (evap + precip)
    ocean = np.asarray(grid.KMT) > 0
    srest = np.where(ocean,
                     -cfg.sfwf_strong_restore * (1.0 - ocn_wgt)
                     * (sss - salt), 0.0)
    wrest = (np.asarray(out.stf_salt) / const.SALINITY_FACTOR
             - ep - srest)
    area = np.asarray(grid.TAREA)
    integral = (wrest * area).sum()
    scale = (np.abs(wrest) * area).sum() + 1e-30
    assert abs(integral) / scale < 1e-5
    # varthick + real fw: restoring-only salt flux, P-E as volume flux
    cfgv = cfg.with_(sfc_layer="varthick", lfw_as_salt_flx=False)
    outv = forcing_sfwf.set_sfwf(cfgv, grid, args[0], args[1],
                                 sst_surf=args[2], qlat=args[3],
                                 precip_data=args[4], ocn_wgt=args[5])
    np.testing.assert_allclose(
        np.asarray(outv.fw),
        ep * const.FWMASS_TO_FWFLUX, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outv.tfw_temp),
                               np.asarray(outv.fw) * sst, rtol=1e-6)


def test_precip_adjustment_restores_balance(setup):
    """A freshening trend (salinity dropping year over year) must lower
    precip_fact; a salinification trend must raise it
    (precip_adjustment, :1818-1928)."""
    cfg, grid = setup
    cfg = cfg.with_(ladjust_precip=True)
    bal = forcing_sfwf.PrecipBalance(cfg, grid)
    assert forcing_sfwf.make_precip_fact(cfg) == 1.0

    km = cfg.km
    year = 365.0 * 86400.0
    # steady precip accumulation over a fake year
    nsteps = 10
    for _ in range(nsteps):
        bal.accumulate(precip_total=1.0e-5 * bal.area_t * 1.0e4,
                       dt=year / nsteps)
    sal0 = np.full((km,), 0.0347)
    f0 = bal.end_of_year(sal0, ssh_final=0.0)   # first year just records
    assert f0 == 1.0

    for _ in range(nsteps):
        bal.accumulate(precip_total=1.0e-5 * bal.area_t * 1.0e4,
                       dt=year / nsteps)
    sal_fresher = sal0 - 1e-5                   # ocean freshening
    f1 = bal.end_of_year(sal_fresher, ssh_final=0.0)
    assert f1 < 1.0, f1

    bal2 = forcing_sfwf.PrecipBalance(cfg, grid)
    for _ in range(2):
        for _ in range(nsteps):
            bal2.accumulate(precip_total=1.0e-5 * bal2.area_t * 1.0e4,
                            dt=year / nsteps)
        if bal2.sal_initial is None:
            bal2.end_of_year(sal0, ssh_final=0.0)
    f2 = bal2.end_of_year(sal0 + 1e-5, ssh_final=0.0)
    assert f2 > 1.0, f2


def test_salinity_means(setup):
    cfg, grid = setup
    bal = forcing_sfwf.PrecipBalance(cfg, grid)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    salt = np.full((km, ny, nx), 0.04)
    means = bal.salinity_means(grid, salt)
    ocean_lvl = bal.volume_t_k > 0
    np.testing.assert_allclose(means[ocean_lvl], 0.04, rtol=1e-12)
