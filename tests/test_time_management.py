"""Calendar / time-flag tests (clone of the reference's
test/unit/time_management program: drive the calendar with known timesteps
and compare against analytically expected date sequences)."""

import numpy as np

from pop2_tpu.time_management import (Calendar, TimeFlag, TimeManager,
                                      is_leapyear, days_in_month)


def test_leapyear_rule():
    assert is_leapyear(2000)
    assert is_leapyear(1996)
    assert not is_leapyear(1900)
    assert not is_leapyear(2025)
    assert days_in_month(2000, 2, True) == 29
    assert days_in_month(1900, 2, True) == 28
    assert days_in_month(2000, 2, False) == 28


def test_calendar_day_rollover_exact():
    """4 steps/day: eod fires exactly every 4th step, at midnight."""
    cal = Calendar(dt_seconds=86400.0 / 4)
    days = []
    for n in range(1, 17):
        cal.advance()
        if cal.eod:
            days.append((n, cal.midnight, cal.date))
    assert [d[0] for d in days] == [4, 8, 12, 16]
    assert all(d[1] for d in days)           # always lands on midnight
    assert days[-1][2] == (1, 1, 5)


def test_calendar_month_year_rollover():
    """1 step/day from Jan 1 year 1: month lengths and year length."""
    cal = Calendar(dt_seconds=86400.0)
    months = []
    for _ in range(365):
        cal.advance()
        if cal.eom:
            months.append(cal.imonth)
    # eom fires when entering months 2..12 and again entering year 2
    assert months == [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 1]
    assert cal.eoy and cal.date == (2, 1, 1)
    assert cal.elapsed_days == 365


def test_calendar_leapyear_feb29():
    cal = Calendar(dt_seconds=86400.0, iyear=2000, imonth=2, iday=28,
                   allow_leapyear=True)
    cal.advance()
    assert cal.date == (2000, 2, 29)
    cal.advance()
    assert cal.date == (2000, 3, 1) and cal.eom


def test_nday_flag_non_divisible_dt():
    """dt not dividing the day: the nday test uses elapsed_days+1 when the
    boundary is crossed off-midnight (time_to_do,
    source/time_management.F90:3345-3352)."""
    cal = Calendar(dt_seconds=10000.0)
    flag = TimeFlag("dump", freq_opt="nday", freq=2)
    fires = []
    for n in range(1, 100):
        cal.advance()
        if flag.check(cal):
            fires.append(cal.elapsed_days)
    # off-midnight crossings count the in-progress day (mod_test+1): the
    # flag fires on entering day 2, 4, ... i.e. at elapsed_days 1, 3, 5, ...
    assert fires[:4] == [1, 3, 5, 7]


def test_nmonth_nyear_flags():
    mgr = TimeManager(dt_seconds=86400.0)
    mgr.init_time_flag("monthly", "nmonth", 1)
    mgr.init_time_flag("quarterly", "nmonth", 3)
    mgr.init_time_flag("annual", "nyear", 1)
    monthly = quarterly = annual = 0
    for _ in range(2 * 365):
        mgr.advance()
        monthly += mgr.check_time_flag("monthly")
        quarterly += mgr.check_time_flag("quarterly")
        annual += mgr.check_time_flag("annual")
    assert monthly == 24
    assert quarterly == 8
    assert annual == 2


def test_flag_override_and_once():
    mgr = TimeManager(dt_seconds=3600.0)
    mgr.init_time_flag("restart", "never")
    mgr.advance()
    assert not mgr.check_time_flag("restart")
    mgr.override_time_flag("restart", True)   # coupler-requested write
    assert mgr.check_time_flag("restart")
    mgr.override_time_flag("restart", None)
    assert not mgr.check_time_flag("restart")

    mgr.init_time_flag("spinup", "once")
    assert mgr.check_time_flag("spinup")
    assert not mgr.check_time_flag("spinup")  # consumed


def test_nhour_flag():
    cal = Calendar(dt_seconds=1800.0)  # half-hour steps
    flag = TimeFlag("6hourly", freq_opt="nhour", freq=6)
    fires = 0
    for _ in range(96):                # two days
        cal.advance()
        fires += flag.time_to_do(cal)
    assert fires == 8


def test_model_calendar_wiring():
    """Model advances its calendar; a monthly history flag schedules."""
    import jax.numpy as jnp
    from pop2_tpu.config import get_config, TimeConfig
    from pop2_tpu.model import Model
    cfg = get_config("mini").with_(
        time=TimeConfig(dt_option="steps_per_day", dt_count=4.0))
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(9):
        st, _ = m.advance(st)
    cal = m.time_manager.calendar
    assert cal.nsteps_total == 9
    assert cal.date == (1, 1, 3)       # 9 quarter-day steps -> day 3, 06:00
    assert cal.seconds_this_day == 21600.0
