"""Equivalence of the fused Pallas GM slope-chain kernels against the
jnp chain they replace (gm._slopes/_sla + the displaced-parcel N^2),
following the kernel-vs-oracle pattern of test_gm_pallas.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from pop2_tpu import eos, gm, gm_slope_pallas
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc


def _setup(**over):
    cfg = get_config("test").with_(dtype="float32", hmix_tracer="gm",
                                   nt=3, passive_tracers=("iage",),
                                   **over)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    return cfg, grid, bc


def _state(cfg, grid, seed=3):
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
    return trcr, ts_range


def _jnp_chain(cfg, grid, bc, ts_range, trcr):
    tx, ty, tz, slx, sly = gm._slopes(cfg, grid, bc, ts_range, trcr)
    sla = gm._sla(cfg, grid, slx, sly)
    km = cfg.km
    kidx = np.arange(1, km + 1)[:, None, None]
    work3 = gm._displaced_density_diff(cfg, grid, ts_range, trcr[:2],
                                       clamp=False)
    from pop2_tpu import constants as const
    dzwr = jnp.reshape(grid.vgrid.dzwr[1:km + 1], (km, 1, 1))
    below = jnp.asarray(kidx) < grid.KMT[None]
    n2 = jnp.where(below,
                   jnp.maximum(0.0, -const.GRAV * work3 * dzwr), 0.0)
    return slx, sly, sla, n2


def _compare(got, want, name, rtol=3e-4):
    got, want = np.asarray(got), np.asarray(want)
    aw = np.abs(want)
    scale = aw.max() or 1.0
    err = np.abs(got - want)
    # clamped-rz slopes (|S| ~ 1e13 where rz_raw >= 0 hits the -eps2
    # floor) sit on a catastrophic cancellation in rx/ry: two f32
    # evaluation orders legitimately differ at the percent level there,
    # and the taper chain zeroes those quarter-cells anyway
    ok = (err <= rtol * aw + 1e-6 * scale) | ((aw > 1e8)
                                              & (err <= 5e-2 * aw))
    assert ok.all(), (
        f"{name}: {np.count_nonzero(~ok)} mismatches, "
        f"max rel {np.nanmax(err / (aw + 1e-30)):.2e}")


@pytest.mark.parametrize("ns,ew", [("closed", "cyclic"),
                                   ("tripole", "cyclic"),
                                   ("closed", "closed")])
def test_slope_kernel_matches_jnp(ns, ew):
    cfg, grid, bc = _setup(ns_boundary=ns, ew_boundary=ew)
    trcr, ts_range = _state(cfg, grid)
    want = _jnp_chain(cfg, grid, bc, ts_range, trcr)

    old_use = gm_slope_pallas.USE_PALLAS
    old_int = gm_slope_pallas.force_interpret
    try:
        gm_slope_pallas.USE_PALLAS = True
        gm_slope_pallas.force_interpret = True
        assert gm_slope_pallas.available(cfg, grid)
        got = gm_slope_pallas.slopes_wrapper(cfg, grid, bc, ts_range, trcr)
    finally:
        gm_slope_pallas.USE_PALLAS = old_use
        gm_slope_pallas.force_interpret = old_int

    for g, w, name in zip(got, want, ("slx", "sly", "sla", "n2")):
        _compare(g, w, name)


def test_slope_kernel_sharded_front_end():
    """The slope kernel's shard_map/ppermute halo front-end on an (8, 1)
    virtual mesh reproduces the jnp chain."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg, grid, bc = _setup(ns_boundary="tripole")
    trcr, ts_range = _state(cfg, grid, seed=9)
    want = _jnp_chain(cfg, grid, bc, ts_range, trcr)

    mesh = pmesh.make_mesh((8, 1))
    old_use = gm_slope_pallas.USE_PALLAS
    old_int = gm_slope_pallas.force_interpret
    try:
        gm_slope_pallas.USE_PALLAS = True
        gm_slope_pallas.force_interpret = True
        with dispatch_mesh(mesh):
            assert gm_slope_pallas.available(cfg, grid)
            got = gm_slope_pallas.slopes_wrapper(cfg, grid, bc, ts_range,
                                                 trcr)
    finally:
        gm_slope_pallas.USE_PALLAS = old_use
        gm_slope_pallas.force_interpret = old_int

    for g, w, name in zip(got, want, ("slx", "sly", "sla", "n2")):
        _compare(g, w, name)


# ---------------------------------------------------------------------------
# full chain kernel (gm_chain_pallas)
# ---------------------------------------------------------------------------

def _chain_setup(**over):
    base = dict(
        dtype="float32", hmix_tracer="gm", nt=3,
        passive_tracers=("iage",),
        gm_kappa_isop_type="bfre", gm_kappa_thic_type="bfre",
        gm_kappa_isop_deep=0.2, gm_kappa_thic_deep=0.1,
        gm_transition_layer=True, lsubmeso=True)
    base.update(over)
    cfg = get_config("test").with_(**base)
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    return cfg, grid, bc


def _bl_fields(cfg, grid, seed=5):
    rng = np.random.RandomState(seed)
    zt = np.asarray(grid.vgrid.zt)
    lat = np.asarray(grid.TLAT)
    ocean = np.asarray(grid.KMT) > 0
    hblt = ((zt[2] + (zt[5] - zt[2]) * (0.5 + 0.5 * np.cos(2 * lat)))
            * ocean).astype(np.float32)
    hmxl = (hblt * (1.0 + 0.2 * rng.rand(*hblt.shape))).astype(np.float32)
    return jnp.asarray(hblt), jnp.asarray(hmxl)


def _flux_compare(got, want, name):
    """atol at 5e-5 of the field scale, except points riding the
    clamped-rz cancellation (see _compare) which carry a few-percent
    local spread between f32 evaluation orders."""
    got, want = np.asarray(got), np.asarray(want)
    aw = np.abs(want)
    scale = aw.max() or 1.0
    err = np.abs(got - want)
    ok = (err <= 5e-5 * scale) | (err <= 5e-2 * aw)
    assert ok.all(), (
        f"{name}: {np.count_nonzero(~ok)} mismatches, "
        f"max {np.max(err[~ok]):.2e} vs scale {scale:.2e}")


def _want_chain(cfg, grid, bc, ts_range, trcr, hblt, hmxl, with_sm):
    from pop2_tpu import submeso as submeso_mod
    out = gm.hdifft_gm(cfg, grid, bc, ts_range, trcr, hblt=hblt,
                       use_kernels=False)
    gtk = out.gtk
    if with_sm:
        gtk_sm, _ = submeso_mod.submeso_tendency(cfg, grid, bc, ts_range,
                                                 trcr, hmxl=hmxl)
        gtk = gtk + gtk_sm
    return gtk, out


@pytest.mark.parametrize("ns,with_sm", [("closed", False),
                                        ("tripole", False),
                                        ("tripole", True)])
def test_chain_kernel_matches_jnp(ns, with_sm):
    from pop2_tpu import gm_chain_pallas, gm_slope_pallas
    cfg, grid, bc = _chain_setup(ns_boundary=ns, lsubmeso=with_sm)
    trcr, ts_range = _state(cfg, grid)
    hblt, hmxl = _bl_fields(cfg, grid)
    want_gtk, want_out = _want_chain(cfg, grid, bc, ts_range, trcr,
                                     hblt, hmxl, with_sm)

    mods = (gm_chain_pallas, gm_slope_pallas)
    olds = [(m.USE_PALLAS, m.force_interpret) for m in mods]
    try:
        for m in mods:
            m.USE_PALLAS = True
            m.force_interpret = True
        assert gm_chain_pallas.available(cfg, grid)
        got_out, sm_included = gm_chain_pallas.hdifft_chain(
            cfg, grid, bc, ts_range, trcr, hblt=hblt, hmxl=hmxl)
    finally:
        for m, (u, i) in zip(mods, olds):
            m.USE_PALLAS, m.force_interpret = u, i
    assert sm_included == with_sm

    _flux_compare(got_out.gtk, want_gtk, "gtk")
    _flux_compare(got_out.vdc_gm, want_out.vdc_gm, "vdc_gm")
    for name in ("kappa_isop", "kappa_thic", "hor_diff"):
        # the notanh taper inherits the slope chain's clamped-point f32
        # spread: allow a small local relative band on top of the scale
        # tolerance (see _flux_compare)
        w = np.asarray(getattr(want_out, name))
        g = np.asarray(getattr(got_out, name))
        err = np.abs(g - w)
        ok = (err <= 3e-5 * (np.abs(w).max() or 1.0)) \
            | (err <= 1e-2 * np.abs(w))
        assert ok.all(), (name, np.count_nonzero(~ok), err.max())


def test_chain_kernel_sharded():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pop2_tpu import gm_chain_pallas, gm_slope_pallas
    from pop2_tpu.parallel import mesh as pmesh
    from pop2_tpu.tridiag_pallas import dispatch_mesh

    cfg, grid, bc = _chain_setup(ns_boundary="tripole", lsubmeso=True)
    trcr, ts_range = _state(cfg, grid, seed=11)
    hblt, hmxl = _bl_fields(cfg, grid, seed=12)
    want_gtk, want_out = _want_chain(cfg, grid, bc, ts_range, trcr,
                                     hblt, hmxl, True)

    mesh = pmesh.make_mesh((8, 1))
    mods = (gm_chain_pallas, gm_slope_pallas)
    olds = [(m.USE_PALLAS, m.force_interpret) for m in mods]
    try:
        for m in mods:
            m.USE_PALLAS = True
            m.force_interpret = True
        with dispatch_mesh(mesh):
            assert gm_chain_pallas.available(cfg, grid)
            got_out, _ = gm_chain_pallas.hdifft_chain(
                cfg, grid, bc, ts_range, trcr, hblt=hblt, hmxl=hmxl)
    finally:
        for m, (u, i) in zip(mods, olds):
            m.USE_PALLAS, m.force_interpret = u, i

    _flux_compare(got_out.gtk, want_gtk, "gtk")
