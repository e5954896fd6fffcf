"""Partial bottom cell tests (reference: source/grid.F90:917-1010 +
partial_bottom_cells branches across advection/vertical_mix/baroclinic).

Oracle 1: degenerate PBC (bottom thickness == full dz) must reproduce the
standard run through the thickness-general code path.
Oracle 2: real PBC runs conserve tracers with DZT-weighted volumes.
"""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import budget
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.model import Model


def test_degenerate_pbc_matches_standard():
    cfg0 = get_config("mini")
    cfg1 = cfg0.with_(partial_bottom_cells=True)  # DZBC = dz(KMT)
    m0, m1 = Model(cfg0), Model(cfg1)
    np.testing.assert_allclose(np.asarray(m1.grid.HT),
                               np.asarray(m0.grid.HT), rtol=1e-14)
    s0 = m0.initial_state()
    s1 = m1.initial_state()
    for _ in range(5):
        s0, _ = m0.advance(s0)
        s1, _ = m1.advance(s1)
    for name in ("tracer_cur", "u_cur", "v_cur", "psurf_cur"):
        a = np.asarray(getattr(s0, name))
        b = np.asarray(getattr(s1, name))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-11 * scale,
                                   err_msg=name)


def _pbc_cfg(tmp_path, frac=0.55):
    cfg = get_config("mini")
    g = build_grid(cfg)
    dz = np.asarray(g.vgrid.dz)
    kmt = np.asarray(g.KMT)
    dzbc = np.where(kmt > 0, frac * dz[np.maximum(kmt, 1) - 1], dz[0])
    p = str(tmp_path / "dzbc.ieeer8")
    np.ascontiguousarray(dzbc, dtype=">f8").tofile(p)
    return cfg.with_(partial_bottom_cells=True, bottom_cell_file=p)


def test_pbc_grid_geometry(tmp_path):
    cfg = _pbc_cfg(tmp_path)
    g = build_grid(cfg)
    dzt = np.asarray(g.DZT)
    dzu = np.asarray(g.DZU)
    dz = np.asarray(g.vgrid.dz)
    kmt = np.asarray(g.KMT)
    kidx = np.arange(1, cfg.km + 1)[:, None, None]
    at_bot = (kidx == kmt[None]) & (kmt[None] > 0)
    expect_bot = np.broadcast_to((0.55 * dz[np.maximum(kmt, 1) - 1])[None],
                                 dzt.shape)
    np.testing.assert_allclose(dzt[at_bot], expect_bot[at_bot], rtol=1e-14)
    # interior cells unchanged
    interior = (kidx < kmt[None])
    np.testing.assert_allclose(
        dzt[interior], np.broadcast_to(dz[:, None, None],
                                       dzt.shape)[interior])
    ocean = kmt > 0
    ht = np.asarray(g.HT)
    zw = np.cumsum(dz)
    assert (ht[ocean] < zw[kmt[ocean] - 1] + 1e-9).all()
    # within the U column, DZU = min of the 4 surrounding DZT
    kmu = np.asarray(g.KMU)
    in_u = kidx <= kmu[None]
    m4 = np.minimum(np.minimum(dzt, np.roll(dzt, -1, 2)),
                    np.minimum(np.roll(dzt, -1, 1),
                               np.roll(np.roll(dzt, -1, 1), -1, 2)))
    np.testing.assert_allclose(dzu[in_u & (kidx < cfg.km)
                                   & (kmu[None] > 0)],
                               m4[in_u & (kidx < cfg.km)
                                  & (kmu[None] > 0)])


def test_pbc_model_conserves_and_stable(tmp_path):
    cfg = _pbc_cfg(tmp_path)
    m = Model(cfg)
    st0 = m.initial_state()
    st = st0
    zf = jnp.zeros_like(m.forcing.smf)
    for _ in range(8):
        st, _ = m.advance(st)
    d = m.diagnostics(st)
    assert np.isfinite(d["KE"]) and d["KE"] > 0
    res = budget.budget_residual(cfg, m.grid, st0, st, m.forcing, 8)
    assert abs(float(res[0])) < 1e-9     # heat closed (zero flux)
    assert abs(float(res[1])) < 1e-11    # salt closed


def test_pbc_differs_from_standard(tmp_path):
    """Reduced bottom cells must actually change the solution."""
    cfg = _pbc_cfg(tmp_path)
    m1, m0 = Model(cfg), Model(get_config("mini"))
    s1 = m1.initial_state()
    s0 = m0.initial_state()
    for _ in range(5):
        s1, _ = m1.advance(s1)
        s0, _ = m0.advance(s0)
    du = np.abs(np.asarray(s1.u_cur) - np.asarray(s0.u_cur)).max()
    assert du > 1e-8
