"""History/movie streams and tracer budget diagnostics."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import budget
from pop2_tpu.config import get_config
from pop2_tpu.model import Model


def test_history_and_movie_streams(mini_cfg, tmp_path):
    m = Model(mini_cfg)
    m.enable_history(["SSH", "TEMP", "UVEL"], freq_steps=3,
                     outdir=str(tmp_path))
    m.enable_movie(["SST", "TEMP"], freq_steps=2, outdir=str(tmp_path))
    st = m.initial_state()
    for _ in range(6):
        st, _ = m.advance(st)
    hist = [f for f in m.tavg_files if ".h." in f]
    mov = [f for f in m.tavg_files if ".m." in f]
    assert len(hist) == 2   # steps 3, 6
    assert len(mov) == 3    # steps 2, 4, 6

    from scipy.io import netcdf_file
    with netcdf_file(hist[-1], "r") as f:
        assert f.variables["TEMP"].shape == (1, mini_cfg.km, mini_cfg.ny,
                                             mini_cfg.nx)
        ssh = f.variables["SSH"][0]
        assert np.isfinite(ssh).all()
    with netcdf_file(mov[-1], "r") as f:
        # 3-D field sampled at the surface -> 2-D
        assert f.variables["TEMP"].shape == (1, mini_cfg.ny, mini_cfg.nx)
        sst = f.variables["SST"][0]
        # instantaneous snapshot equals the state's surface temperature
        np.testing.assert_allclose(
            sst, np.asarray(st.tracer_cur[0, 0], dtype=np.float32),
            rtol=1e-6)


def test_budget_closed_without_forcing(mini_cfg):
    m = Model(mini_cfg)
    st0 = m.initial_state()
    st = st0
    for _ in range(6):
        st, _ = m.advance(st)
    res = budget.budget_residual(mini_cfg, m.grid, st0, st, m.forcing, 6)
    # zero surface tracer flux -> totals conserved to roundoff
    assert abs(float(res[0])) < 1e-10   # degC drift
    assert abs(float(res[1])) < 1e-12   # salt drift


def test_budget_tracks_heat_input(mini_cfg):
    m = Model(mini_cfg)
    st0 = m.initial_state()
    ny, nx = mini_cfg.ny, mini_cfg.nx
    stf = m.forcing.stf.at[0].set(jnp.where(m.grid.RCALCT > 0, 1.0e-2, 0.0))
    f = m.forcing.replace(stf=stf)
    st = st0
    nsteps = 8
    for _ in range(nsteps):
        st, _ = m.advance(st, forcing=f)
    tot0 = np.asarray(budget.tracer_totals(mini_cfg, m.grid, st0))
    tot1 = np.asarray(budget.tracer_totals(mini_cfg, m.grid, st))
    influx = float(budget.surface_flux_integral(mini_cfg, m.grid, f)[0])
    expected = influx * nsteps * mini_cfg.time.dtt
    # leapfrog/filtering give O(dt) edge effects; closure within a few %
    np.testing.assert_allclose(tot1[0] - tot0[0], expected, rtol=0.1)
    res = budget.budget_residual(mini_cfg, m.grid, st0, st, f, nsteps)
    assert abs(float(res[0])) < 0.1 * abs(expected) / float(
        m.grid.volume_t)


def test_postrun_monthly_mean_and_strip(tmp_path):
    """Post-run history processing (tools/postrun_proc/
    pop_hist_postprocess.csh): recreate monthly means from daily-mean
    stream files and strip fields from the daily stream — native
    reimplementation over the framework's own stream format."""
    from pop2_tpu import tavg
    from pop2_tpu.config import get_config
    from pop2_tpu.grid import build_grid
    from pop2_tpu.io import postrun

    cfg = get_config("mini")
    grid = build_grid(cfg)
    contents = ["SSH", "TEMP"]
    rng = np.random.RandomState(0)
    daily = []
    fields_by_day = []
    for day in range(3):
        arrays = {"SSH": rng.randn(cfg.ny, cfg.nx),
                  "TEMP": rng.randn(cfg.km, cfg.ny, cfg.nx)}
        fields_by_day.append(arrays)
        p = str(tmp_path / f"day{day}.nc")
        tavg.write_fields_netcdf(cfg, grid, p, contents, arrays,
                                 step_number=day)
        daily.append(p)

    out = postrun.monthly_mean_from_daily(daily, str(tmp_path / "mon.nc"))
    from scipy.io import netcdf_file
    with netcdf_file(out, "r", mmap=False) as f:
        ssh = np.array(f.variables["SSH"][:])
        temp = np.array(f.variables["TEMP"][:])
        assert "z_t" in f.variables and "TLAT" in f.variables
    want_ssh = np.mean([a["SSH"] for a in fields_by_day], axis=0)
    np.testing.assert_allclose(ssh.squeeze(), want_ssh, rtol=1e-5, atol=1e-6)
    want_t = np.mean([a["TEMP"] for a in fields_by_day], axis=0)
    np.testing.assert_allclose(temp.squeeze(), want_t, rtol=1e-5, atol=1e-6)

    # strip TEMP from the daily stream in place
    postrun.strip_fields(daily[0], ["TEMP"])
    with netcdf_file(daily[0], "r", mmap=False) as f:
        assert "TEMP" not in f.variables
        assert "SSH" in f.variables and "TLAT" in f.variables
    import pytest
    with pytest.raises(ValueError):
        postrun.strip_fields(daily[1], ["time"])
