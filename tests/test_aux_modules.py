"""Estuary VSF, marginal-sea balancing, MCOG, running means, named fields,
IRF tracer, and meridional transports."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import constants as const
from pop2_tpu import diagnostics as diag
from pop2_tpu import estuary, mcog, ms_balance
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.model import Model
from pop2_tpu.named_fields import NamedFieldRegistry
from pop2_tpu.running_mean import RunningMeans


def test_estuary_river_vsf_conserves_global_salt(mini_cfg, mini_grid):
    ny, nx = mini_cfg.ny, mini_cfg.nx
    rng = np.random.default_rng(0)
    roff = jnp.asarray(np.abs(rng.normal(size=(ny, nx))) * 1e-5)
    roff = roff * mini_grid.RCALCT
    s = jnp.asarray(0.034 + 0.002 * rng.random((ny, nx)))
    stf_local = estuary.river_vsf(mini_cfg, mini_grid, roff, s)
    stf_ref = roff * const.SALINITY_FACTOR * mini_grid.RCALCT
    # same global integral as the reference-salinity form...
    a = float(jnp.sum(stf_local * mini_grid.TAREA))
    b = float(jnp.sum(stf_ref * mini_grid.TAREA))
    np.testing.assert_allclose(a, b, rtol=1e-10)
    # ...but locally different (uses local salinity)
    assert float(jnp.abs(stf_local - stf_ref).max()) > 0.0


def test_ms_balancing_moves_flux(mini_cfg, mini_grid):
    ny, nx = mini_cfg.ny, mini_cfg.nx
    ocean = np.asarray(mini_grid.RCALCT) > 0
    ms = np.zeros((ny, nx))
    jj, ii = np.argwhere(ocean)[5]
    ms[jj - 1:jj + 2, ii - 1:ii + 2] = 1.0
    dist_pt = tuple(np.argwhere(ocean)[50])
    reg = ms_balance.build_region(mini_grid, ms, [tuple(dist_pt)])
    flux = jnp.where(mini_grid.RCALCT > 0, 2.0e-5, 0.0)
    out = ms_balance.ms_balancing(mini_cfg, mini_grid, flux, [reg])
    # global integral preserved
    np.testing.assert_allclose(float(jnp.sum(out * mini_grid.TAREA)),
                               float(jnp.sum(flux * mini_grid.TAREA)),
                               rtol=1e-12)
    # marginal sea now integrates to zero net
    net_ms = float(jnp.sum(out * mini_grid.TAREA * reg.ms_mask))
    assert abs(net_ms) < 1e-10 * abs(
        float(jnp.sum(flux * mini_grid.TAREA * reg.ms_mask)))
    # distribution point received it
    assert float(out[dist_pt[0], dist_pt[1]]) > float(
        flux[dist_pt[0], dist_pt[1]])


def test_mcog_aggregate():
    frac = jnp.asarray([[[0.5]], [[0.25]], [[0.25]]])
    qsw = jnp.asarray([[[100.0]], [[50.0]], [[10.0]]])
    agg = mcog.aggregate(frac, qsw)
    np.testing.assert_allclose(float(agg[0, 0]), 65.0)
    # unnormalized fractions renormalize
    agg2 = mcog.aggregate(2.0 * frac, qsw)
    np.testing.assert_allclose(float(agg2[0, 0]), 65.0)
    anom = mcog.per_category_anomaly(frac, qsw)
    np.testing.assert_allclose(float(anom[0, 0, 0]), 35.0)


def test_running_means():
    rm = RunningMeans(dt_seconds=100.0)
    rm.define("x", timescale_seconds=1000.0, init_value=0.0)
    for _ in range(200):
        rm.update("x", 1.0)
    assert 0.99 < float(rm.get("x")) <= 1.0
    ckpt = rm.save()
    rm2 = RunningMeans(100.0)
    rm2.define("x", 1000.0, 0.0)
    rm2.restore(ckpt)
    np.testing.assert_allclose(float(rm2.get("x")), float(rm.get("x")))


def test_named_fields():
    import pytest
    reg = NamedFieldRegistry()
    reg.register("SW_PEN", (4, 5))
    assert reg.registered("SW_PEN")
    reg.set("SW_PEN", jnp.ones((4, 5)))
    assert float(reg.get("SW_PEN").sum()) == 20.0
    with pytest.raises(ValueError):
        reg.set("SW_PEN", jnp.ones((3, 3)))
    with pytest.raises(KeyError):
        reg.get_index("MISSING")


def test_irf_tracer_advects_conserved():
    cfg = get_config("mini").with_(nt=3, passive_tracers=("irf",))
    m = Model(cfg)
    st = m.initial_state()
    from pop2_tpu import budget
    tot0 = float(budget.tracer_totals(cfg, m.grid, st)[2])
    assert tot0 > 0.0
    for _ in range(6):
        st, _ = m.advance(st)
    tot1 = float(budget.tracer_totals(cfg, m.grid, st)[2])
    np.testing.assert_allclose(tot1, tot0, rtol=1e-9)
    # the impulse spreads: max decreases
    assert np.asarray(st.tracer_cur[2]).max() <= 1.0 + 1e-9


def test_meridional_transport(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    edges, heat, salt = diag.meridional_transport(mini_cfg, m.grid, st)
    assert heat.shape == (36,)
    assert np.isfinite(np.asarray(heat)).all()
    assert np.isfinite(np.asarray(salt)).all()


def test_estuary_box_model():
    """EBM solver: the cubic has a unique negative real root; the exchange
    satisfies volume (Q_u = Q_r - Q_l) and salt (S_u = -Q_l S_l / Q_u)
    closure; no estuary -> passthrough."""
    import jax.numpy as jnp
    from pop2_tpu import estuary

    q_r = jnp.asarray([[500.0, 2000.0, 0.0]])
    tide = jnp.full_like(q_r, 1.0)
    s_l = jnp.asarray([[32.0, 30.0, 33.0]])
    w_h = jnp.full_like(q_r, 2000.0)
    h = jnp.full_like(q_r, 10.0)
    q_u, q_l, s_u = estuary.ebm_solve(q_r, tide, s_l, w_h, h,
                                      0.876, 0.0, 0.5)
    q_u, q_l, s_u = map(np.asarray, (q_u, q_l, s_u))
    assert np.isfinite(q_u).all() and np.isfinite(q_l).all()
    active = np.asarray(q_r) > 0
    assert (q_l[active] <= 0.0).all()          # inflow at depth
    assert (q_u[active] > 0.0).all()           # outflow above
    # salt closure S_u = -Q_l S_l / Q_u where the exchange is active
    exch = q_l < 0
    np.testing.assert_allclose(
        s_u[exch], (-q_l * np.asarray(s_l) / q_u)[exch], rtol=1e-10)
    assert (s_u[exch] < np.asarray(s_l)[exch]).all()  # diluted outflow
    assert q_l[0, 2] == 0.0                    # no river -> no exchange


def test_estuary_exchange_conserves(mini_cfg, mini_grid):
    """The exchange-circulation tendency redistributes tracer vertically:
    each column integral vanishes."""
    import jax.numpy as jnp
    from pop2_tpu import estuary

    cfg = mini_cfg.with_(lestuary_exch=True)
    grid = mini_grid
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    rng = np.random.RandomState(5)
    kmask = np.asarray(grid.kmask_t)
    tr = np.zeros((cfg.nt, km, ny, nx))
    tr[0] = 10.0 + rng.randn(km, ny, nx)
    tr[1] = 0.034 + 0.001 * rng.rand(km, ny, nx)
    tr *= kmask[None]
    roff = np.zeros((ny, nx))
    roff[10, 8] = 5.0e-2   # kg/m^2/s river point
    w_up, w_lo = estuary.exchange_layer_weights(
        cfg, grid, cfg.est_h_upper, cfg.est_h_lower)
    src = np.asarray(estuary.exchange_circulation(
        cfg, grid, jnp.asarray(tr), jnp.asarray(roff), w_up, w_lo))
    assert np.isfinite(src).all()
    dz = np.asarray(grid.vgrid.dz)[:, None, None]
    col = (src * dz * kmask[None]).sum(axis=1)
    scale = (np.abs(src) * dz * kmask[None]).sum(axis=1) + 1e-30
    assert (np.abs(col) <= 1e-9 * scale + 1e-25).all()


def test_mcog_import_bins_and_normalization():
    """Full import_mcog pipeline (source/mcog.F90:578-717): column->bin
    segment sums, fraction normalization preserving the fraction-weighted
    flux, and the aggregation consistency check."""
    import jax.numpy as jnp
    rng = np.random.RandomState(7)
    ncols, ny, nx = 5, 6, 8
    kmt = np.ones((ny, nx), np.int32) * 5
    kmt[0, :] = 0                                  # a land row
    frac = rng.rand(ncols, ny, nx) * 0.4
    frac *= (1.02 / frac.sum(0))                   # sums to 1.02 (anomaly)
    fracr = frac * rng.uniform(0.9, 1.1, (ncols, ny, nx))
    qsw = rng.rand(ncols, ny, nx) * 300.0
    qsw_fracr = qsw * fracr
    swnet = qsw_fracr.sum(0)

    col_to_bin = (0, 0, 1, 1, 2)
    bins = mcog.import_mcog(
        jnp.asarray(frac), jnp.asarray(fracr), jnp.asarray(qsw_fracr),
        jnp.asarray(swnet), jnp.asarray(kmt), col_to_bin=col_to_bin,
        nbins=3, debug=True)

    # consistency with the coupler aggregate: no mismatch by construction
    mcog.check_aggregation(bins)
    ocean = kmt > 0

    # the fraction-weighted bin flux reproduces the coupler aggregate
    # (normalization preserves the products, :683-698)
    recon = np.asarray(
        (bins.fracr_bin * bins.qsw_raw_bin).sum(0))
    np.testing.assert_allclose(recon[ocean], swnet[ocean], rtol=1e-12)

    # fractions sum to 1 after the (uncapped) adjustment
    np.testing.assert_allclose(
        np.asarray(bins.frac_bin.sum(0))[ocean], 1.0, rtol=1e-12)
    # land is zero-filled
    assert np.asarray(bins.frac_bin)[:, ~ocean].max() == 0.0
    assert np.asarray(bins.qsw_raw_bin)[:, ~ocean].max() == 0.0

    # bin 0 holds columns 0+1
    np.testing.assert_allclose(
        np.asarray(bins.fracr_bin[0])[ocean],
        (fracr[0] + fracr[1])[ocean] / fracr.sum(0)[ocean], rtol=1e-12)

    # a corrupted column flux trips the aggregation guard
    import pytest
    bad = mcog.import_mcog(
        jnp.asarray(frac), jnp.asarray(fracr),
        jnp.asarray(qsw_fracr * 1.01), jnp.asarray(swnet),
        jnp.asarray(kmt), col_to_bin=col_to_bin, nbins=3)
    with pytest.raises(FloatingPointError):
        mcog.check_aggregation(bad)


def test_mcog_single_column_and_weighting():
    import jax.numpy as jnp
    kmt = np.ones((4, 4), np.int32)
    kmt[0, 0] = 0
    swnet = np.full((4, 4), 200.0)
    bins = mcog.single_column_bins(jnp.asarray(swnet), jnp.asarray(kmt))
    assert bins.qsw_raw_bin.shape == (1, 4, 4)
    assert float(bins.qsw_raw_bin[0, 0, 0]) == 0.0
    assert float(bins.qsw_raw_bin[0, 1, 1]) == 200.0
    # coszen weighting applies per bin exactly as to the aggregate
    w = np.full((4, 4), 0.5)
    qb = mcog.qsw_bin_weighted(bins, jnp.asarray(w))
    assert float(qb[0, 1, 1]) == 100.0
    names = mcog.tavg_field_names(3)
    assert "QSW_BIN_02" in names and len(names) == 9
