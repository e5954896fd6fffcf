"""Overflow parameterization tests (reference: source/overflows.F90)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import overflows as ovf
from pop2_tpu.config import get_config, OverflowSpec, RegionBox
from pop2_tpu.model import Model


def _spec():
    """A small overflow on the mini grid: dense source water on a shelf
    (k 2-3) spilling to a deep product region (k 5-6)."""
    return OverflowSpec(
        name="test_ovf", lat=60.0, width=1.0e7, source_thick=3.0e4,
        distnc_str_ssb=1.0e7, bottom_slope=0.01, bottom_drag=3.0e-3,
        inf=RegionBox(kmin=1, kmax=2, jmin=16, jmax=18, imin=2, imax=5),
        src=RegionBox(kmin=2, kmax=3, jmin=16, jmax=18, imin=6, imax=9),
        ent=RegionBox(kmin=3, kmax=4, jmin=14, jmax=16, imin=10, imax=13),
        prd=RegionBox(kmin=5, kmax=6, jmin=12, jmax=14, imin=10, imax=13))


def _cfg():
    return get_config("mini").with_(overflows=(_spec(),))


def test_transport_law_activates_with_dense_source():
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    # make the source region water dense (cold + salty)
    masks = np.asarray(m.ovf_statics.masks)
    src = masks[0, ovf.REG_SRC] > 0
    T = np.array(st.tracer_cur[0])
    S = np.array(st.tracer_cur[1])
    T[src] -= 4.0
    S[src] += 0.0005
    trcr = jnp.asarray(np.stack([T, S]))
    ms, me, mp, phi, tavg = ovf.transports(cfg, m.grid, m.ovf_statics, trcr)
    assert float(ms[0]) > 0.0          # dense source -> transport
    assert float(mp[0]) >= float(ms[0])
    assert 0.0 <= float(phi[0]) < 1.0
    # buoyant source -> no transport
    T2 = np.array(st.tracer_cur[0])
    T2[src] += 4.0
    trcr2 = jnp.asarray(np.stack([T2, S - 0.0]))
    ms2, me2, mp2, _, _ = ovf.transports(cfg, m.grid, m.ovf_statics, trcr2)
    assert float(ms2[0]) >= 0.0
    assert float(ms2[0]) < float(ms[0])


def test_tendency_conserves_and_moves_dense_water():
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    masks = np.asarray(m.ovf_statics.masks)
    src = masks[0, ovf.REG_SRC] > 0
    T = np.array(st.tracer_cur[0])
    T[src] -= 4.0
    trcr = jnp.asarray(np.stack([T, np.asarray(st.tracer_cur[1])]))
    g = ovf.tendency(cfg, m.grid, m.ovf_statics, trcr)
    from pop2_tpu.grid import thickness_t
    vol = np.asarray(thickness_t(cfg, m.grid)
                     * m.grid.TAREA[None]) * np.asarray(m.grid.kmask_t)
    total = (np.asarray(g[0]) * vol).sum()
    scale = (np.abs(np.asarray(g[0])) * vol).sum() + 1e-30
    assert abs(total) < 1e-10 * scale        # exact conservation
    # product region cools (receives cold source water)
    prd = masks[0, ovf.REG_PRD] > 0
    assert np.asarray(g[0])[prd].mean() < 0.0
    # source region warms (return flow brings product/ambient water)
    assert np.asarray(g[0])[src].mean() > 0.0


def test_model_runs_with_overflow():
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    # densify the source so the overflow is active during the run
    masks = np.asarray(m.ovf_statics.masks)
    src = masks[0, ovf.REG_SRC] > 0
    T = np.array(st.tracer_cur[0])
    T[src] -= 3.0
    t = st.tracer_cur.at[0].set(jnp.asarray(T))
    st = st.replace(tracer_cur=t, tracer_old=t)
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])
    assert np.isfinite(np.asarray(st.tracer_cur)).all()


def test_qsurf_zero_sum_and_sign():
    """Barotropic continuity injection: globally zero-sum, negative over
    source/entrainment footprints, positive over the product footprint
    (ovf_rhs_brtrpc_continuity, source/overflows.F90:5068-5120)."""
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    masks = np.asarray(m.ovf_statics.masks)
    src = masks[0, ovf.REG_SRC] > 0
    T = np.array(st.tracer_cur[0])
    T[src] -= 4.0
    trcr = jnp.asarray(np.stack([T, np.asarray(st.tracer_cur[1])]))
    trans = ovf.transports(cfg, m.grid, m.ovf_statics, trcr)
    assert float(trans[0][0]) > 0.0  # active overflow
    q = np.asarray(ovf.qsurf(cfg, m.grid, m.ovf_statics, trans))
    tarea = np.asarray(m.grid.TAREA)
    net = (q * tarea).sum()
    scale = (np.abs(q) * tarea).sum()
    assert abs(net) < 1e-10 * scale
    fm = np.asarray(m.ovf_statics.fmask)
    assert q[fm[0, ovf.REG_PRD] > 0].mean() > 0.0
    assert q[fm[0, ovf.REG_SRC] > 0].mean() < 0.0


def test_overflow_drives_barotropic_response():
    """With the continuity injection, an active overflow must change the
    barotropic solution relative to the tracer-exchange-only form."""
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    masks = np.asarray(m.ovf_statics.masks)
    src = masks[0, ovf.REG_SRC] > 0
    T = np.array(st.tracer_cur[0])
    T[src] -= 4.0
    st = st.replace(tracer_cur=jnp.asarray(
        np.stack([T, np.asarray(st.tracer_cur[1])])),
        tracer_old=jnp.asarray(
        np.stack([T, np.asarray(st.tracer_old[1])])))

    s1 = st
    for _ in range(3):
        s1, _ = m.advance(s1)

    # disable only the injection by zeroing the transports' mass effect:
    # compare against a run whose overflow regions are identical but whose
    # qsurf is suppressed (monkeypatched to None)
    import pop2_tpu.step as step_mod
    orig = ovf.qsurf
    try:
        ovf.qsurf = lambda *a, **k: jnp.zeros((cfg.ny, cfg.nx),
                                              cfg.jnp_dtype)
        m2 = Model(cfg)
        s2 = st
        for _ in range(3):
            s2, _ = m2.advance(s2)
    finally:
        ovf.qsurf = orig

    dpsi = np.abs(np.asarray(s1.psurf_cur) - np.asarray(s2.psurf_cur)).max()
    assert dpsi > 0.0, "continuity injection had no barotropic effect"
    # mass conservation: area-mean SSH unchanged by the zero-sum injection
    rcalct = np.asarray(m.grid.RCALCT)
    tarea = np.asarray(m.grid.TAREA)
    m1 = (np.asarray(s1.psurf_cur) * tarea * rcalct).sum()
    m0 = (np.asarray(s2.psurf_cur) * tarea * rcalct).sum()
    assert abs(m1 - m0) < 1e-6 * (np.abs(np.asarray(s1.psurf_cur))
                                  * tarea * rcalct).sum()
