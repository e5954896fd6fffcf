"""Diagnostics and timers tests."""

import numpy as np

from pop2_tpu import diagnostics as diag
from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.timers import Timers


def test_global_diags_and_cfl(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    prev = st
    for _ in range(5):
        st, d = m.advance(st)
    g = diag.global_diagnostics(mini_cfg, m.grid, st, prev)
    assert np.isfinite(g["KE"]) and g["KE"] > 0
    assert abs(g["SALT_mean_psu"] - 34.73) < 0.1
    c = diag.cfl_numbers(mini_cfg, m.grid, st)
    assert 0 < c["cfl_advect_x"] < 1.0
    assert c["cfl_hdiff"] < 1.0
    txt = diag.diag_print(mini_cfg, m.grid, st, 5, prev,
                          solver_iters=int(d.solver_iters))
    assert "KE" in txt and "cfl_advect_x" in txt


def test_check_ke_raises_on_blowup(mini_cfg, mini_grid):
    import jax.numpy as jnp
    import pytest
    m = Model(mini_cfg)
    st = m.initial_state()
    bad = st.replace(u_cur=jnp.where(m.grid.kmask_u, 1.0e4, 0.0))
    with pytest.raises(FloatingPointError):
        diag.check_ke(mini_cfg, m.grid, bad)


def test_transport_and_bsf_consistency(mini_cfg):
    """Zonal transport through any meridional section must be finite, and
    the BSF must vanish on the southern land boundary."""
    m = Model(mini_cfg)
    st = m.initial_state()
    for _ in range(10):
        st, _ = m.advance(st)
    tr = diag.zonal_transport(mini_cfg, m.grid, st, i_index=5)
    assert np.isfinite(tr)
    psi = np.asarray(diag.barotropic_streamfunction(mini_cfg, m.grid, st))
    assert np.isfinite(psi).all()
    assert np.abs(psi[0]).max() < 1e-12  # starts from land row


def test_moc_shape_and_finiteness(mini_cfg):
    m = Model(mini_cfg)
    st = m.initial_state()
    for _ in range(5):
        st, _ = m.advance(st)
    edges, moc = diag.moc_streamfunction(mini_cfg, m.grid, st, nlat_bins=18)
    moc = np.asarray(moc)
    assert moc.shape == (mini_cfg.km, 18)
    assert np.isfinite(moc).all()
    # no transport poleward of the land cap
    assert np.abs(moc[:, 0]).max() < 1e-12
    assert np.abs(moc[:, -1]).max() < 1e-12


def test_timers():
    t = Timers()
    import jax.numpy as jnp
    with t.section("STEP", sync_on=None):
        x = jnp.ones((100, 100)).sum()
    with t.section("STEP", sync_on=x):
        pass
    table = t.print_all()
    assert "STEP" in table
    assert t.get("STEP").count == 2
