"""Depth-accelerated tracer timesteps (laccel/dttxcel,
source/time_management.F90:975-1009, input_templates/gx1v7_depth_accel)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu.baroclinic import _timestep_arrays
from pop2_tpu.config import get_config, TimeConfig
from pop2_tpu.model import Model


def _accel_cfg(factor=3.0):
    base = get_config("mini")
    km = base.km
    xcel = (1.0,) * (km // 2) + (factor,) * (km - km // 2)
    return base.with_(time=TimeConfig(
        dt_option="steps_per_day", dt_count=96.0,
        laccel=True, dttxcel=xcel))


def test_c2dtt_profile():
    cfg = _accel_cfg(3.0)
    c2dtt, c2dtu, c2dtp = _timestep_arrays(cfg, leapfrog=True)
    dtt = cfg.time.dtt
    np.testing.assert_allclose(np.asarray(c2dtt[:cfg.km // 2]), 2.0 * dtt)
    np.testing.assert_allclose(np.asarray(c2dtt[cfg.km // 2:]),
                               6.0 * dtt)
    # momentum/pressure timesteps are NOT accelerated
    assert c2dtu == pytest.approx(2.0 * dtt)


def test_top_layer_never_accelerated():
    cfg = get_config("mini")
    cfg = cfg.with_(time=TimeConfig(
        dt_option="steps_per_day", dt_count=96.0,
        laccel=True, dttxcel=(5.0,) * cfg.km))
    c2dtt, _, _ = _timestep_arrays(cfg, leapfrog=False)
    assert float(c2dtt[0]) == pytest.approx(cfg.time.dtt)
    assert float(c2dtt[1]) == pytest.approx(5.0 * cfg.time.dtt)


def test_wrong_length_raises():
    cfg = get_config("mini").with_(time=TimeConfig(
        laccel=True, dttxcel=(1.0, 2.0)))
    with pytest.raises(ValueError, match="levels"):
        _timestep_arrays(cfg, leapfrog=True)


def test_accelerated_run_stable_and_converges_faster_at_depth():
    """An accelerated run stays finite and its deep tracers move further
    per step (the point of acceleration: deep equilibration in fewer
    steps, Bryan 1984). Measured on the first (Euler) step, where the
    explicit tendency enters scaled by c2dtt(k)."""
    cfg0 = _accel_cfg(1.0)
    cfg1 = _accel_cfg(4.0)
    m0, m1 = Model(cfg0), Model(cfg1)
    s0, s1 = m0.initial_state(), m1.initial_state()
    # perturb the deep temperature with a horizontal gradient so advection
    # and diffusion have something to act on
    mask = np.asarray(m0.grid.kmask_t)
    T = np.array(s0.tracer_cur[0])
    gradient = np.linspace(-0.5, 0.5, T.shape[-1])[None, :]
    T[-2:] += gradient * mask[-2:]
    trcr = jnp.asarray(np.stack([T, np.asarray(s0.tracer_cur[1])]))
    s0 = s0.replace(tracer_cur=trcr, tracer_old=trcr)
    s1 = s1.replace(tracer_cur=trcr, tracer_old=trcr)
    s0, _ = m0.advance(s0)
    s1, _ = m1.advance(s1)
    ocean = mask[-1] > 0
    d0 = np.abs(np.asarray(s0.tracer_cur[0, -1]) - T[-1])[ocean].mean()
    d1 = np.abs(np.asarray(s1.tracer_cur[0, -1]) - T[-1])[ocean].mean()
    assert np.isfinite(np.asarray(s1.tracer_cur)).all()
    assert d1 > 1.5 * d0  # accelerated deep tracers moved further
