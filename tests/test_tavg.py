"""tavg output stream tests: accumulation, normalization, NetCDF roundtrip,
accumulator checkpointing."""

import numpy as np

from pop2_tpu.config import get_config
from pop2_tpu.model import Model


def test_tavg_accumulates_and_writes(tmp_path):
    cfg = get_config("mini")
    m = Model(cfg)
    stream = m.enable_tavg(["SSH", "SST", "TEMP", "UVEL", "KE"],
                           freq_steps=5, outdir=str(tmp_path))
    st = m.initial_state()
    for _ in range(10):
        st, _ = m.advance(st)
    assert len(m.tavg_files) == 2

    from scipy.io import netcdf_file
    with netcdf_file(m.tavg_files[-1], "r") as f:
        assert f.variables["TEMP"].shape == (1, cfg.km, cfg.ny, cfg.nx)
        sst = f.variables["SST"][0].copy()
        temp = f.variables["TEMP"][0].copy()
        ke = f.variables["KE"][0].copy()
        zt = f.variables["z_t"][:].copy()
    assert np.isfinite(sst).all()
    # the average surface-layer T should stay near its initial value
    ocean = np.asarray(m.grid.RCALCT) > 0
    t0 = float(np.asarray(m.initial_state().tracer_cur[0, 0])[ocean].mean())
    assert abs(sst[ocean].mean() - t0) < 1.0
    assert (ke >= 0).all()
    assert zt.shape == (cfg.km,)


def test_tavg_mean_matches_manual(tmp_path):
    cfg = get_config("mini")
    m = Model(cfg)
    m.enable_tavg(["SSH"], freq_steps=3, outdir=str(tmp_path))
    st = m.initial_state()
    manual = []
    for _ in range(3):
        st, _ = m.advance(st)
        manual.append(np.asarray(st.psurf_cur) / 980.6)
    from scipy.io import netcdf_file
    with netcdf_file(m.tavg_files[0], "r") as f:
        ssh = f.variables["SSH"][0].copy()
    np.testing.assert_allclose(ssh, np.mean(manual, axis=0), atol=1e-6)


def test_tavg_accumulator_checkpoint(tmp_path):
    cfg = get_config("mini")
    m = Model(cfg)
    stream = m.enable_tavg(["SST"], freq_steps=100, outdir=str(tmp_path))
    st = m.initial_state()
    for _ in range(4):
        st, _ = m.advance(st)
    saved = stream.save_accumulators()
    stream.reset()
    stream.restore_accumulators(saved)
    assert stream.nsamples == 4
    assert np.isfinite(np.asarray(stream.sums["SST"])).all()


def test_unknown_field_raises(tmp_path):
    import pytest
    m = Model(get_config("mini"))
    with pytest.raises(KeyError):
        m.enable_tavg(["NOPE"], freq_steps=5)


def test_registry_component_and_sw_fields(tmp_path):
    """The coupler-component flux fields, shortwave diagnostics, and
    background-profile fields evaluate and accumulate through a run
    (gx1v7_tavg_contents production field set coverage)."""
    import jax.numpy as jnp
    from pop2_tpu import coupled

    cfg = get_config("mini").with_(sw_absorption="jerlov", vmix="kpp")
    m = Model(cfg)
    fields = ["PREC_F", "SNOW_F", "EVAP_F", "MELT_F", "IOFF_F", "SALT_F",
              "SENH_F", "LWUP_F", "LWDN_F", "MELTH_F", "ROFF_F",
              "QSW_HTP", "QSW_3D", "QSW_HBL", "VDC_BCK", "VVC_BCK"]
    m.enable_tavg(fields, freq_steps=3, outdir=str(tmp_path))

    # coupler import with every component populated
    r = np.asarray(m.grid.RCALCT)
    rng = np.random.RandomState(0)
    x2o = {k: jnp.asarray(np.abs(rng.randn(cfg.ny, cfg.nx)) * 1e-5)
           for k in ("rain", "snow", "evap", "melt", "rofl", "rofi",
                     "salt", "sen", "lwup", "lwdn", "melth", "swnet",
                     "taux", "tauy")}
    m.forcing = coupled.ocn_import(cfg, m.grid, x2o)

    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    assert len(m.tavg_files) == 1

    from scipy.io import netcdf_file
    with netcdf_file(m.tavg_files[-1], "r") as f:
        for name in fields:
            v = f.variables[name][0].copy()
            assert np.isfinite(v).all(), name
        prec = f.variables["PREC_F"][0].copy()
        q3d = f.variables["QSW_3D"][0].copy()
    ocean = r > 0
    assert prec[ocean].max() > 0.0
    # transmission decays with depth
    assert q3d[0][ocean].mean() >= q3d[-1][ocean].mean()


def test_tendency_component_fields(tmp_path):
    """TEND/ADV_3D/ADVT/HDIF/DIA_IMPVF tendency captures evaluate and the
    vertically integrated advection of a conserved tracer sums to ~the
    surface flux divergence scale (production contents coverage)."""
    cfg = get_config("mini")
    m = Model(cfg)
    fields = ["TEND_TEMP", "TEND_SALT", "ADV_3D_TEMP", "ADV_3D_SALT",
              "ADVT", "ADVS", "HDIFT", "HDIFS",
              "DIA_IMPVF_TEMP", "DIA_IMPVF_SALT"]
    m.enable_tavg(fields, freq_steps=3, outdir=str(tmp_path))
    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    from scipy.io import netcdf_file
    with netcdf_file(m.tavg_files[-1], "r") as f:
        for name in fields:
            v = f.variables[name][0].copy()
            assert np.isfinite(v).all(), name
        advt = f.variables["ADVT"][0].copy()
        tend = f.variables["TEND_TEMP"][0].copy()
    ocean = np.asarray(m.grid.RCALCT) > 0
    # global advective tendency of a conserved tracer ~integrates to zero
    area = np.asarray(m.grid.TAREA)
    tot = (advt * area)[ocean].sum() / area[ocean].sum()
    assert abs(tot) < 1e-4 * np.abs(advt[ocean]).max()
    assert np.abs(tend[:, ocean]).max() > 0.0


def test_round4_fields_accumulate(tmp_path):
    """The round-4 registry additions (KVMIX/KVMIX_M/TPOWER, HMXL_DR
    family, QFLUX, dTEMP, RESID, RF_TEND, DIA_DEPTH/TLT/INT_DEPTH)
    produce finite values in a production-physics run."""
    cfg = get_config("mini").with_(
        vmix="kpp", hmix_tracer="gm", liceform=True,
        ltidal_mixing=True, tidal_energy_const=1.0e-3,
        gm_kappa_isop_type="bfre", gm_kappa_thic_type="bfre",
        gm_transition_layer=True)
    cfg = cfg.with_(time=cfg.time.__class__(
        dt_option="steps_per_day", dt_count=96.0, time_mix_opt="robert"))
    m = Model(cfg)
    fields = ["KVMIX", "KVMIX_M", "TPOWER", "HMXL_DR", "HMXL_DR2",
              "XMXL_DR", "TMXL_DR", "HMXL_2", "XMXL_2", "HMXL_DR_2",
              "QFLUX", "dTEMP_POS_2D", "dTEMP_NEG_2D", "RESID_T",
              "RESID_S", "SFWF_WRST", "RF_TEND_TEMP", "RF_TEND_SALT",
              "DIA_DEPTH", "TLT", "INT_DEPTH",
              "T_FLUX_EXCH_INTRF", "S_FLUX_EXCH_INTRF",
              "S_FLUX_ROFF_VSF_SRF"]
    m.enable_tavg(fields, freq_steps=3, outdir=str(tmp_path))
    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    from scipy.io import netcdf_file
    with netcdf_file(m.tavg_files[0], "r") as f:
        ocean = np.asarray(m.grid.RCALCT) > 0
        for name in fields:
            v = f.variables[name][0].copy()
            assert np.isfinite(v).all(), name
        kv = f.variables["KVMIX"][0].copy()
        hd = f.variables["HMXL_DR"][0].copy()
        dia = f.variables["DIA_DEPTH"][0].copy()
    # KVMIX >= background over ocean interior
    assert kv[:-1][np.asarray(m.grid.kmask_t)[:-1]].min() >= 0.0
    assert kv.max() > 0.0
    # density-criterion MLD positive over deep ocean columns
    deep = np.asarray(m.grid.KMT) > 1
    assert (hd[deep] >= 0).all() and hd[deep].max() > 0
    assert (dia[ocean] > 0).all()
