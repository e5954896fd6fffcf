"""avgfit time mixing: fitted timestep, interval scheduling, and exact
day-boundary alignment (source/time_management.F90:795-870, 2195-2213)."""

import numpy as np
import pytest

from pop2_tpu.config import get_config, TimeConfig
from pop2_tpu.model import Model


def _cfg(steps_per_day=12.0, tmf=17, fit_freq=1):
    return get_config("mini").with_(time=TimeConfig(
        dt_option="steps_per_day", dt_count=steps_per_day,
        time_mix_opt="avgfit", time_mix_freq=tmf, fit_freq=fit_freq))


def test_fitted_counts_and_dtt():
    cfg = _cfg(12.0, 17, 1)
    full, half, n, dtt = cfg.time.avgfit_params()
    assert (full, half, n) == (12, 1, 13)
    # interval seconds come out exactly: full + half/2 steps per interval
    assert (full + 0.5 * half) * dtt == pytest.approx(86400.0)
    assert cfg.time.dtt == pytest.approx(dtt)


def test_never_ends_interval_on_half_step():
    for spd in (4.0, 12.0, 24.0, 45.0, 96.0):
        for tmf in (5, 17, 33):
            cfg = _cfg(spd, tmf)
            full, half, n, dtt = cfg.time.avgfit_params()
            m = Model(cfg)
            # walk two intervals; count halves and check the last step
            for interval in range(2):
                halves = 0
                for i in range(1, n + 1):
                    step = interval * n + i
                    _, avg = m.step_flags(step)
                    if avg:
                        halves += 1
                    if i == n:
                        assert not avg, (spd, tmf, step)
                if interval > 0:   # first interval: step 1 is Euler not avg
                    assert halves == half, (spd, tmf, halves, half)


def test_calendar_hits_midnight_exactly():
    cfg = _cfg(12.0, 17, 1)
    full, half, n, dtt = cfg.time.avgfit_params()
    m = Model(cfg)
    st = m.initial_state()
    # one full day = fit_freq * n steps; advancing through the model
    # must land exactly on midnight (the point of avgfit)
    for _ in range(n):
        st, _ = m.advance(st)
    cal = m.time_manager.calendar
    assert cal.iday == 2
    assert cal.seconds_this_day == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(np.asarray(st.tracer_cur)).all()


def test_requires_small_tmf_guard():
    cfg = _cfg(12.0, 3)
    with pytest.raises(ValueError, match="time_mix_freq"):
        cfg.time.avgfit_params()
