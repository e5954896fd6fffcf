"""Robert-filter time mixing tests."""

import numpy as np

from pop2_tpu.config import get_config, TimeConfig
from pop2_tpu.model import Model


def _rcfg():
    return get_config("mini").with_(
        time=TimeConfig(dt_option="steps_per_day", dt_count=96.0,
                        time_mix_opt="robert", robert_alpha=1.0,
                        robert_nu=0.1))


def test_robert_run_stable_and_conservative():
    m = Model(_rcfg())
    st = m.initial_state()
    from tests.test_step import _tracer_integral
    tot0 = _tracer_integral(m, st)
    for _ in range(60):
        st, _ = m.advance(st)
    dd = m.diagnostics(st)
    assert np.isfinite(dd["KE"]) and dd["KE"] < 100.0
    tot = _tracer_integral(m, st)
    rel = np.abs(tot - tot0) / np.abs(tot0)
    assert rel.max() < 1e-6, rel


def test_robert_damps_computational_mode():
    """The leapfrog computational mode (2-dt oscillation) must decay faster
    with the filter than without."""
    def run(mix):
        cfg = get_config("mini").with_(
            time=TimeConfig(dt_option="steps_per_day", dt_count=96.0,
                            time_mix_opt=mix, time_mix_freq=10**9,
                            robert_nu=0.2))
        m = Model(cfg)
        st = m.initial_state()
        kes = []
        for _ in range(40):
            st, _ = m.advance(st)
            kes.append(m.diagnostics(st)["KE"])
        return np.asarray(kes)

    ke_rf = run("robert")
    ke_none = run("avg")  # freq huge -> effectively unfiltered leapfrog
    # 2-dt oscillation amplitude of the KE series
    osc = lambda k: np.abs(np.diff(k, 2)).mean()  # noqa: E731
    assert np.isfinite(ke_rf).all() and np.isfinite(ke_none).all()
    assert osc(ke_rf[-20:]) <= osc(ke_none[-20:]) * 1.5
