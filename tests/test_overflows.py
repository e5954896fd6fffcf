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
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
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
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
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
    prd = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_PRD) > 0
    assert np.asarray(g[0])[prd].mean() < 0.0
    # source region warms (return flow brings product/ambient water)
    assert np.asarray(g[0])[src].mean() > 0.0


def test_model_runs_with_overflow():
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    # densify the source so the overflow is active during the run
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
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
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
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
    fprd = ovf.footprint2(cfg, m.ovf_statics.regions[0][ovf.REG_PRD])
    fsrc = ovf.footprint2(cfg, m.ovf_statics.regions[0][ovf.REG_SRC])
    assert q[fprd > 0].mean() > 0.0
    assert q[fsrc > 0].mean() < 0.0


def test_overflow_drives_barotropic_response():
    """With the continuity injection, an active overflow must change the
    barotropic solution relative to the tracer-exchange-only form."""
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
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


# ---------------------------------------------------------------------------
# point-data overflows (overflows_infile geometry)
# ---------------------------------------------------------------------------

def _pt_spec():
    """Point-data overflow on the mini grid: src wall at i=5 flowing +x,
    ent at i=13, two product sets at k=5/6 selected by buoyancy."""
    return OverflowSpec(
        name="pt_ovf", lat=60.0, width=1.0e7, source_thick=3.0e4,
        distnc_str_ssb=1.0e7, bottom_slope=0.01, bottom_drag=3.0e-3,
        inf=RegionBox(kmin=1, kmax=2, jmin=16, jmax=18, imin=2, imax=5),
        src=RegionBox(kmin=2, kmax=3, jmin=16, jmax=18, imin=6, imax=8),
        ent=RegionBox(kmin=3, kmax=4, jmin=14, jmax=16, imin=14, imax=16),
        prd=RegionBox(kmin=5, kmax=6, jmin=12, jmax=14, imin=14, imax=16),
        src_pts=tuple((5, j, 3, 1) for j in range(16, 19)),
        ent_pts=tuple((13, j, 3, 1) for j in range(14, 17)),
        prd_sets=(tuple((13, j, 5, 1) for j in range(12, 15)),
                  tuple((13, j, 6, 1) for j in range(12, 15))))


def _dense_src_state(cfg, m, dT=-4.0):
    import jax.numpy as jnp
    st = m.initial_state()
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
    T = np.array(st.tracer_cur[0])
    T[src] += dT
    trcr = jnp.asarray(np.stack([T, np.asarray(st.tracer_cur[1])]))
    return st, trcr, src


def test_point_overflow_selection_and_conservation():
    """Neutral-buoyancy product-set selection (ovf_loc_prd) + exact
    conservation of the point-data tendency."""
    cfg = get_config("mini").with_(overflows=(_pt_spec(),))
    m = Model(cfg)
    st, trcr, src = _dense_src_state(cfg, m)
    trans = ovf.transports(cfg, m.grid, m.ovf_statics, trcr)
    assert float(trans[0][0]) > 0.0
    sel, sets_tavg = ovf.product_set_selection(cfg, m.grid, m.ovf_statics,
                                               trcr, trans)
    assert 0 <= int(sel[0]) < 2
    # cold dense product with a warm ambient -> deeper set
    assert int(sel[0]) == 1
    g = ovf.tendency(cfg, m.grid, m.ovf_statics, trcr, trans=trans,
                     sel=sel, sets_tavg=sets_tavg)
    from pop2_tpu.grid import thickness_t
    vol = np.asarray(thickness_t(cfg, m.grid) * m.grid.TAREA[None]
                     ) * np.asarray(m.grid.kmask_t)
    for n in range(2):
        tot = (np.asarray(g[n]) * vol).sum()
        scale = (np.abs(np.asarray(g[n])) * vol).sum() + 1e-30
        assert abs(tot) < 1e-10 * scale


def test_point_overflow_momentum_and_zren():
    """Sidewall momentum adjustment shifts the adjacent columns; the
    ZX/ZY renormalization map is 1 away from sidewalls."""
    import jax.numpy as jnp
    cfg = get_config("mini").with_(overflows=(_pt_spec(),))
    m = Model(cfg)
    st, trcr, src = _dense_src_state(cfg, m)
    trans = ovf.transports(cfg, m.grid, m.ovf_statics, trcr)
    sel, _ = ovf.product_set_selection(cfg, m.grid, m.ovf_statics, trcr,
                                       trans)
    u = jnp.zeros((cfg.km, cfg.ny, cfg.nx), cfg.jnp_dtype)
    v = jnp.zeros_like(u)
    ub = jnp.zeros((cfg.ny, cfg.nx), cfg.jnp_dtype)
    u2, v2 = ovf.momentum_adjust(cfg, m.grid, m.ovf_statics, trans, sel,
                                 u, v, ub, ub)
    assert float(jnp.abs(u2).max()) > 0.0        # active transport moved U
    # the shift is uniform over each active column (pure renormalization)
    du = np.asarray(u2)
    jj = np.asarray(m.ovf_statics.mom_u["j"])
    ii = np.asarray(m.ovf_statics.mom_u["i"])
    kmu = np.asarray(m.grid.KMU)
    for p in range(len(jj)):
        col = du[:kmu[jj[p], ii[p]], jj[p], ii[p]]
        assert np.allclose(col, col[0])
    zren = np.asarray(m.ovf_statics.zren)
    assert zren.max() <= 1.0
    off = np.ones_like(zren, bool)
    off[jj.min() - 2:jj.max() + 3, :] = False
    assert (zren[off] == 1.0).all()


def test_point_overflow_model_runs():
    import jax.numpy as jnp
    cfg = get_config("mini").with_(overflows=(_pt_spec(),))
    m = Model(cfg)
    st, trcr, src = _dense_src_state(cfg, m, dT=-3.0)
    st = st.replace(tracer_cur=trcr, tracer_old=trcr)
    for _ in range(5):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])
    assert np.isfinite(np.asarray(st.tracer_cur)).all()


def test_real_overflow_infile_parses():
    """Parse the reference's real gx1v7 overflow file: four overflows with
    the documented parameters (input_templates/gx1v7_overflow:41-47)."""
    import os
    path = "/root/reference/input_templates/gx1v7_overflow"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference input_templates not available")
    from pop2_tpu.io import input_templates as it
    specs = it.read_overflows(path)
    assert [s.name for s in specs] == [
        "Denmark Strait", "Faroe Bank Channel", "Ross Sea", "Weddell Sea"]
    dms = specs[0]
    assert dms.lat == 65.0 and dms.width == 5.0e6
    assert dms.source_thick == 450.0e2 and dms.bottom_drag == 3.0e-3
    assert len(dms.kmt_changes) == 3
    # pop-up: 19 372 33 32 (1-based) -> 0-based (18, 371)
    assert dms.kmt_changes[0] == (18, 371, 33, 32)
    assert len(dms.src_pts) == 3 and len(dms.ent_pts) == 5
    assert [len(s) for s in dms.prd_sets] == [4, 4, 7, 4, 6, 5, 6]
    # src point 19 370 33 1 -> (18, 369, 32, 1)
    assert dms.src_pts[0] == (18, 369, 32, 1)
    # inflow region 10 15 360 367 33 33
    assert (dms.inf.imin, dms.inf.imax) == (9, 14)
    assert (dms.inf.jmin, dms.inf.jmax) == (359, 366)
    assert (dms.inf.kmin, dms.inf.kmax) == (32, 32)


def test_real_overflow_geometry_builds():
    """Build the overflow statics on a gx1v7-shaped all-ocean grid from
    the real parsed Denmark Strait/Faroe/Ross/Weddell geometry, including
    the kmt pop-ups."""
    import os
    import pytest
    path = "/root/reference/input_templates/gx1v7_overflow"
    if not os.path.exists(path):
        pytest.skip("reference input_templates not available")
    from pop2_tpu.io import input_templates as it
    from pop2_tpu.grid import build_grid
    specs = it.read_overflows(path)
    cfg = get_config("test").with_(
        nx=320, ny=384, km=60, ns_boundary="tripole",
        overflows=specs)
    grid = build_grid(cfg)
    kmt = np.asarray(grid.KMT)
    # pop-ups applied
    assert kmt[371, 18] == 32
    st = ovf.build_statics(cfg, grid)
    assert len(st.regions) == 4
    assert st.sets is not None and len(st.sets[0]) == 7
    assert st.mom_u["j"].shape[0] > 0
    # all regions found ocean cells (build_statics would have raised)
    assert float(np.asarray(st.volumes).min()) > 0.0


# ---------------------------------------------------------------------------
# ovf_solvers_9pt: overflow columns folded into the barotropic operator
# ---------------------------------------------------------------------------

def _pt_spec_topo():
    """_pt_spec with kmt pop-downs shelving the columns just east of the
    source/entrainment walls, so the sidewall U-points sit above the
    overflow level (KMU < k_ovf) and ovf_HU has something to extend."""
    import dataclasses
    pops = tuple((6, j, 8, 2) for j in range(15, 20))
    spec = _pt_spec()
    if hasattr(spec, "_replace"):
        return spec._replace(kmt_changes=pops)
    return dataclasses.replace(spec, kmt_changes=pops)


def _oracle_ovf_hu(cfg, grid):
    """Direct NumPy transliteration of ovf_HU
    (source/overflows.F90:5730-5880): for each src, ent, then prd point,
    HUM(i_u,j_u) = HU + sum(dz, KMU+1..k_ovf), absolute assignment."""
    dz = np.asarray(grid.vgrid.dz, np.float64)
    kmu = np.asarray(grid.KMU)
    hu = np.asarray(grid.HU, np.float64)
    hum = hu.copy()
    for spec in cfg.overflows:
        groups = [spec.src_pts, spec.ent_pts] + list(spec.prd_sets)
        for pts in groups:
            for (i, j, k0, orient) in pts:
                iu, ju = ovf._u_point(i, j, orient, cfg.nx)
                if not (0 <= ju < cfg.ny):
                    continue
                dz_sw = dz[int(kmu[ju, iu]):k0 + 1].sum()
                hum[ju, iu] = hu[ju, iu] + dz_sw
    return hum


def test_ovf_hu_matches_oracle():
    cfg = get_config("mini").with_(overflows=(_pt_spec_topo(),))
    from pop2_tpu.grid import build_grid
    grid = build_grid(cfg)
    hum = ovf.modified_hu(cfg, grid)
    np.testing.assert_array_equal(hum, _oracle_ovf_hu(cfg, grid))
    # the sidewall columns actually deepened
    assert (hum > np.asarray(grid.HU)).any()


def test_ovf_solvers_9pt_modifies_solve_in_overflow_region():
    """The modified 9-pt operator changes the barotropic solution near the
    overflow sidewalls (round-4 verdict item 7). Also checks the weights
    are untouched away from the overflow neighborhood."""
    import jax.numpy as jnp
    from pop2_tpu import solvers
    from pop2_tpu.grid import build_grid, grid_bc
    from pop2_tpu.barotropic import diagonal_correction

    cfg = get_config("mini").with_(overflows=(_pt_spec_topo(),))
    g0 = build_grid(cfg)
    g1 = ovf.solvers_9pt(cfg, g0)
    bc = grid_bc(cfg)

    d_ne = np.abs(np.asarray(g1.btrop_ne) - np.asarray(g0.btrop_ne))
    assert d_ne.max() > 0.0
    # far field (away from all overflow j rows) untouched
    far = np.ones((cfg.ny, cfg.nx), bool)
    far[10:22, :] = False
    for a, b in ((g1.btrop_ne, g0.btrop_ne), (g1.btrop_n, g0.btrop_n),
                 (g1.btrop_e, g0.btrop_e),
                 (g1.btrop_c_indep, g0.btrop_c_indep)):
        assert np.array_equal(np.asarray(a)[far], np.asarray(b)[far])

    # same RHS, both operators: solutions differ in the overflow region
    dc = diagonal_correction(cfg, g0, True)
    rng = np.random.RandomState(3)
    rhs = jnp.asarray(rng.randn(cfg.ny, cfg.nx)
                      * np.asarray(g0.RCALCT), cfg.jnp_dtype)
    x0 = jnp.zeros_like(rhs)
    sols = []
    for g in (g0, g1):
        op = solvers.make_operator(g, dc)
        x, it, rr = solvers.chron_gear(cfg, op, bc, x0, rhs)
        sols.append(np.asarray(x))
    dif = np.abs(sols[1] - sols[0])
    assert dif.max() > 0.0
    # the difference is driven by the overflow neighborhood: the max
    # relative change is near the modified columns
    jmax, imax = np.unravel_index(np.argmax(dif), dif.shape)
    assert 8 <= jmax <= 24


def test_ovf_solvers_9pt_wired_into_model():
    """Model init swaps the operator weights when point-data overflows are
    configured, and the model still steps stably."""
    cfg = get_config("mini").with_(overflows=(_pt_spec_topo(),))
    from pop2_tpu.grid import build_grid
    g0 = build_grid(cfg)
    m = Model(cfg)
    assert not np.array_equal(np.asarray(m.grid.btrop_ne),
                              np.asarray(g0.btrop_ne))
    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])


def test_transport_stability_cap():
    """The joint transport cap keeps the explicit region-relaxation rates
    and the equivalent surface fluxes inside their stability envelope
    even when a region box's ocean volume is tiny (internally generated
    topographies; the round-4 flagship blowup), and leaves healthy
    configurations untouched."""
    cfg = _cfg()
    m = Model(cfg)
    st = m.initial_state()
    src = ovf.region_mask3(cfg, m.ovf_statics, 0, ovf.REG_SRC) > 0
    T = np.array(st.tracer_cur[0])
    S = np.array(st.tracer_cur[1])
    T[src] -= 4.0
    S[src] += 0.0005
    trcr = jnp.asarray(np.stack([T, S]))

    ms, me, mp, phi, _ = ovf.transports(cfg, m.grid, m.ovf_statics, trcr)
    assert float(ms[0]) > 0.0
    r_max = 0.25 / (2.0 * cfg.time.dtt)
    stx = m.ovf_statics
    # healthy volumes: the cap is far from binding
    assert float(ms[0]) < 0.5 * r_max * float(stx.volumes[0, ovf.REG_SRC])

    # shrink the source volume under the solver's feet: the capped rate
    # must respect (M/V)*c2dt <= 0.25 and M/A <= 2 cm/s
    import dataclasses
    small = 1.0e-6 * float(stx.volumes[0, ovf.REG_SRC])
    srd = stx.regions[0][ovf.REG_SRC]
    srd_small = srd._replace(vol=jnp.asarray(small, jnp.float64),
                             area=jnp.asarray(1.0e4, jnp.float64))
    regions = ((stx.regions[0][0], srd_small, stx.regions[0][2],
                stx.regions[0][3]),)
    vols = np.asarray(stx.volumes).copy()
    vols[0, ovf.REG_SRC] = small
    stx2 = stx._replace(regions=regions,
                        volumes=jnp.asarray(vols, stx.volumes.dtype))
    ms2, me2, mp2, _, _ = ovf.transports(cfg, m.grid, stx2, trcr)
    assert float(ms2[0]) <= r_max * small * (1.0 + 1e-6)
    assert float(ms2[0]) <= 2.0 * 1.0e4 * (1.0 + 1e-6)
    # the joint rescale preserves the split
    assert abs(float(mp2[0]) - float(ms2[0]) - float(me2[0])) \
        <= 1e-6 * max(float(mp2[0]), 1.0)


def test_geometry_validation_drops_inconsistent_overflow():
    """The init_overflows_kmt consistency contract
    (source/overflows.F90:1196-1275): kmt-change records that disagree
    with the topography deactivate the overflow (or abort in strict
    mode); consistent records keep it active."""
    import dataclasses
    import warnings as _w
    import pytest as _pt
    from pop2_tpu.grid import build_grid

    base = get_config("mini")
    kmt0 = np.asarray(build_grid(base).KMT)
    spec = _spec()
    # consistent: record the actual KMT values
    i, j = 8, 17
    ok_spec = dataclasses.replace(
        spec, kmt_changes=((i, j, int(kmt0[j, i]), int(kmt0[j, i])),))
    cfg = base.with_(overflows=(ok_spec,))
    m = Model(cfg)
    assert len(m.cfg.overflows) == 1

    bad_spec = dataclasses.replace(
        spec, kmt_changes=((i, j, int(kmt0[j, i]) + 3, int(kmt0[j, i])),))
    cfg = base.with_(overflows=(bad_spec,))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m2 = Model(cfg)
    assert len(m2.cfg.overflows) == 0
    assert m2.ovf_statics is None

    with _pt.raises(ValueError):
        Model(base.with_(overflows=(bad_spec,),
                         overflow_geometry_strict=True))
