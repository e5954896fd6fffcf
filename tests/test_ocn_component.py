"""Coupler-cap protocol: init/run/final phases, coupling time flags,
export-buffer averaging, and coupler-requested restart with bitwise resume
(drivers/mct/ocn_comp_mct.F90; ERS-class invariant of SURVEY.md §4.2).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.ocn_component import OcnComponent


def _x2o(cfg, seed=0):
    rng = np.random.RandomState(seed)
    shape = (cfg.ny, cfg.nx)
    f = lambda s: jnp.asarray(rng.uniform(-s, s, shape))
    return {
        "taux": f(0.1), "tauy": f(0.1),          # N/m^2
        "swnet": jnp.asarray(rng.uniform(0, 200, shape)),
        "sen": f(20.0), "lwup": f(50.0), "lwdn": f(50.0), "melth": f(5.0),
        "snow": f(1e-5), "rain": f(1e-5), "evap": f(1e-5),
        "melt": f(1e-6), "rofl": f(1e-6), "rofi": f(1e-7),
        "salt": f(1e-7), "ifrac": jnp.zeros(shape),
        "pslv": jnp.full(shape, 101325.0), "duu10n": f(25.0),
    }


@pytest.fixture(scope="module")
def cfg():
    # 4 steps per coupling interval (mini: dtt = 900 s, nhour coupling)
    return get_config("mini")


def test_cap_protocol_phases(cfg, tmp_path):
    comp = OcnComponent(cfg, coupling_freq_opt="nhour", coupling_freq=1,
                        outdir=str(tmp_path))
    o2x0 = comp.initialize()
    for name in ("So_t", "So_s", "So_u", "So_v", "So_dhdx", "So_dhdy",
                 "So_ssh"):
        assert name in o2x0, name
        assert np.isfinite(np.asarray(o2x0[name])).all(), name
    # initial SST export is the initial state in Kelvin
    assert np.asarray(o2x0["So_t"]).max() > 250.0

    x2o = _x2o(cfg)
    n0 = comp.model.nsteps_total
    o2x = comp.run(x2o)
    steps_per_interval = comp.model.nsteps_total - n0
    assert steps_per_interval == 4  # 3600 s / dtt(900 s)
    assert np.isfinite(np.asarray(o2x["So_t"])).all()

    # second interval advances the same number of steps
    o2x2 = comp.run(x2o)
    assert comp.model.nsteps_total - n0 == 8
    # the interval-averaged exports differ between intervals (model evolving)
    assert not np.allclose(np.asarray(o2x["So_u"]), np.asarray(o2x2["So_u"]))

    final = comp.finalize()
    assert final is not None


def test_cap_restart_on_request_bitwise(cfg, tmp_path):
    x2o = _x2o(cfg)
    comp = OcnComponent(cfg, coupling_freq_opt="nhour", coupling_freq=1,
                        outdir=str(tmp_path))
    comp.initialize()
    comp.run(x2o)
    # driver requests a restart at the end of interval 2
    comp.run(x2o, rstwr=True)
    assert comp.restart_files, "rstwr must trigger a restart write"
    state_mid = comp.state
    o2x_ref = comp.run(x2o)  # interval 3 in the original component

    # resume a NEW component from the pointer file and run interval 3
    comp2 = OcnComponent(cfg, coupling_freq_opt="nhour", coupling_freq=1,
                         outdir=str(tmp_path))
    comp2.initialize(restart_dir=str(tmp_path))
    assert comp2.model.nsteps_total == 8
    np.testing.assert_array_equal(np.asarray(comp2.state.tracer_cur),
                                  np.asarray(state_mid.tracer_cur))
    o2x_resumed = comp2.run(x2o)

    for name in ("So_t", "So_s", "So_u", "So_v", "So_ssh"):
        np.testing.assert_array_equal(
            np.asarray(o2x_resumed[name]), np.asarray(o2x_ref[name]),
            err_msg=f"{name} not bitwise after restart resume")
    np.testing.assert_array_equal(np.asarray(comp2.state.tracer_cur),
                                  np.asarray(comp.state.tracer_cur))


def test_cap_scheduled_restart(cfg, tmp_path):
    """Restart flag on a calendar schedule (nhour 2 = every 2nd interval)."""
    comp = OcnComponent(cfg, coupling_freq_opt="nhour", coupling_freq=1,
                        restart_freq_opt="nhour", restart_freq=2,
                        outdir=str(tmp_path))
    comp.initialize()
    x2o = _x2o(cfg)
    comp.run(x2o)
    assert len(comp.restart_files) == 0
    comp.run(x2o)
    assert len(comp.restart_files) == 1
