"""Equivalence of the fused Pallas GM flux-assembly kernel against the
jnp chain it replaces (gm.flux_assembly_jnp), following the
kernel-vs-oracle pattern of test_tracer_pallas.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import eos, gm, gm_pallas
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc


def _setup(**over):
    cfg = get_config("test").with_(dtype="float32", hmix_tracer="gm",
                                   nt=3, passive_tracers=("iage",),
                                   **over)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    return cfg, grid, bc


def _fields(cfg, grid, bc, seed=3):
    """Realistic slopes/weights: run the actual _slopes + taper chain on
    a stratified random state, so the kernel sees production-shaped
    inputs."""
    rng = np.random.RandomState(seed)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    mask = np.asarray(grid.kmask_t)
    zt = np.asarray(grid.vgrid.zt)
    tprof = 2.0 + 16.0 * np.exp(-zt / 8.0e4)
    lat = np.asarray(grid.TLAT)
    T = (tprof[:, None, None] + 1.5 * np.cos(2 * lat)[None]
         + 0.1 * rng.randn(km, ny, nx)) * mask
    S = (0.0347 + 5.0e-5 * np.sin(3 * lat)[None]
         + 2.0e-5 * rng.randn(km, ny, nx)) * mask
    A = (1.0 + 0.2 * rng.randn(km, ny, nx)) * mask
    trcr = jnp.asarray(np.stack([T, S, A]), jnp.float32)

    ts_range = eos.build_ts_range(zt, cfg.jnp_dtype)
    tx, ty, tz, slx, sly = gm._slopes(cfg, grid, bc, ts_range, trcr)
    sla = gm._sla(cfg, grid, slx, sly)
    hblt = jnp.asarray((zt[2] + (zt[5] - zt[2])
                        * (0.5 + 0.5 * np.cos(2 * lat)))
                       * (np.asarray(grid.KMT) > 0), jnp.float32)
    tap_isop, tap_thic, _, _ = gm._tapers(cfg, grid, sla, hblt[None, None])
    kisop = (tap_isop * cfg.gm_ah_bolus).astype(jnp.float32)
    kthic = (tap_thic * 0.8 * cfg.gm_ah_bolus).astype(jnp.float32)
    hor_diff = jnp.where(
        jnp.reshape(jnp.asarray(zt), (1, km, 1, 1)) <= hblt[None, None],
        cfg.gm_ah_bkg_srfbl * (1.0 - tap_isop), 0.0).astype(jnp.float32)
    dz = jnp.reshape(grid.vgrid.dz, (km, 1, 1)).astype(jnp.float32)
    kidx = jnp.arange(1, km + 1)[:, None, None]
    in_mask = kidx <= grid.KMT[None]
    sf_slx = jnp.where(in_mask[None, None], kthic[None] * slx * dz, 0.0)
    sf_sly = jnp.where(in_mask[None, None], kthic[None] * sly * dz, 0.0)
    return (tx.astype(jnp.float32), ty.astype(jnp.float32),
            tz.astype(jnp.float32), slx.astype(jnp.float32),
            sly.astype(jnp.float32), sf_slx.astype(jnp.float32),
            sf_sly.astype(jnp.float32), kisop, hor_diff)


@pytest.mark.parametrize("ns,cancellation", [("closed", False),
                                             ("tripole", False),
                                             ("closed", True)])
def test_gm_flux_kernel_matches_jnp(ns, cancellation):
    cfg, grid, bc = _setup(ns_boundary=ns)
    (tx, ty, tz, slx, sly, sf_slx, sf_sly, kisop,
     hor_diff) = _fields(cfg, grid, bc)
    if cancellation:
        sf_slx = jnp.zeros_like(sf_slx)
        sf_sly = jnp.zeros_like(sf_sly)

    want_gtk, want_vdc = gm.flux_assembly_jnp(
        cfg, grid, bc, tx, ty, tz, slx, sly, sf_slx, sf_sly,
        kisop, kisop, hor_diff, cancellation)

    old_use, old_int = gm_pallas.USE_PALLAS, gm_pallas.force_interpret
    try:
        gm_pallas.USE_PALLAS = True
        gm_pallas.force_interpret = True
        got_gtk, got_vdc = gm_pallas.flux_assembly_tiles_wrapper(
            cfg, grid, bc, tx, ty, tz, slx, sly, sf_slx, sf_sly,
            kisop, hor_diff, cancellation)
    finally:
        gm_pallas.USE_PALLAS = old_use
        gm_pallas.force_interpret = old_int

    want_gtk, got_gtk = np.asarray(want_gtk), np.asarray(got_gtk)
    scale = np.abs(want_gtk).max() or 1.0
    np.testing.assert_allclose(got_gtk, want_gtk, rtol=0,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_vdc), np.asarray(want_vdc),
                               rtol=1e-6, atol=0)


def test_gm_model_consistency():
    """hdifft_gm with the kernel forced on (interpret) matches the jnp
    path through the full GM driver (production options: bfre kappa +
    transition layer + upwind-ready tripole grid)."""
    cfg, grid, bc = _setup(ns_boundary="tripole",
                           gm_kappa_isop_type="bfre",
                           gm_kappa_thic_type="bfre",
                           gm_transition_layer=True)
    rng = np.random.RandomState(7)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    mask = np.asarray(grid.kmask_t)
    zt = np.asarray(grid.vgrid.zt)
    tprof = 2.0 + 16.0 * np.exp(-zt / 8.0e4)
    lat = np.asarray(grid.TLAT)
    T = (tprof[:, None, None] + 1.5 * np.cos(2 * lat)[None]
         + 0.1 * rng.randn(km, ny, nx)) * mask
    S = (0.0347 + 2.0e-5 * rng.randn(km, ny, nx)) * mask
    A = (1.0 + 0.2 * rng.randn(km, ny, nx)) * mask
    trcr = jnp.asarray(np.stack([T, S, A]), jnp.float32)
    hblt = jnp.asarray((zt[2] + (zt[5] - zt[2])
                        * (0.5 + 0.5 * np.cos(2 * lat)))
                       * (np.asarray(grid.KMT) > 0), jnp.float32)
    ts_range = eos.build_ts_range(zt, cfg.jnp_dtype)

    out_ref = gm.hdifft_gm(cfg, grid, bc, ts_range, trcr, hblt=hblt)

    old_use, old_int = gm_pallas.USE_PALLAS, gm_pallas.force_interpret
    try:
        gm_pallas.USE_PALLAS = True
        gm_pallas.force_interpret = True
        out_k = gm.hdifft_gm(cfg, grid, bc, ts_range, trcr, hblt=hblt)
    finally:
        gm_pallas.USE_PALLAS = old_use
        gm_pallas.force_interpret = old_int

    a, b = np.asarray(out_k.gtk), np.asarray(out_ref.gtk)
    scale = np.abs(b).max() or 1.0
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_k.vdc_gm),
                               np.asarray(out_ref.vdc_gm),
                               rtol=1e-6, atol=0)


@pytest.mark.parametrize("ns", ["closed", "tripole"])
def test_gm_sharded_front_end_matches_jnp(ns):
    """The GM kernel's shard_map/ppermute halo front-end on an (8, 1)
    virtual mesh reproduces the jnp chain (round-4 verdict item 4)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg, grid, bc = _setup(ns_boundary=ns)
    (tx, ty, tz, slx, sly, sf_slx, sf_sly, kisop,
     hor_diff) = _fields(cfg, grid, bc, seed=9)

    want_gtk, want_vdc = gm.flux_assembly_jnp(
        cfg, grid, bc, tx, ty, tz, slx, sly, sf_slx, sf_sly,
        kisop, kisop, hor_diff, False)

    mesh = pmesh.make_mesh((8, 1))
    old_use, old_int = gm_pallas.USE_PALLAS, gm_pallas.force_interpret
    try:
        gm_pallas.USE_PALLAS = True
        gm_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert gm_pallas.available(cfg, grid)
            got_gtk, got_vdc = gm_pallas.flux_assembly_tiles_wrapper(
                cfg, grid, bc, tx, ty, tz, slx, sly, sf_slx, sf_sly,
                kisop, hor_diff, False)
    finally:
        gm_pallas.USE_PALLAS = old_use
        gm_pallas.force_interpret = old_int

    want_gtk, got_gtk = np.asarray(want_gtk), np.asarray(got_gtk)
    scale = np.abs(want_gtk).max() or 1.0
    np.testing.assert_allclose(got_gtk, want_gtk, rtol=0,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_vdc), np.asarray(want_vdc),
                               rtol=1e-6, atol=0)
