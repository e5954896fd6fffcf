"""Passive-tracer framework tests: ideal age ages in the interior and stays
zero at the surface (source/iage_mod.F90 semantics)."""

import numpy as np

from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.passive_tracers import SECONDS_IN_YEAR


def test_iage_ages_interior_resets_surface():
    cfg = get_config("mini").with_(nt=3, passive_tracers=("iage",))
    m = Model(cfg)
    st = m.initial_state()
    nsteps = 20
    for _ in range(nsteps):
        st, _ = m.advance(st)
    iage = np.asarray(st.tracer_cur[2])
    kmask = np.asarray(m.grid.kmask_t)
    # surface reset to zero
    assert np.abs(iage[0][kmask[0]]).max() < 1e-12
    # deep interior has aged roughly nsteps*dt / year (mixing reduces it)
    dt = cfg.time.dtt
    expected = nsteps * dt / SECONDS_IN_YEAR
    deep = iage[-1][kmask[-1]]
    assert deep.max() > 0.2 * expected
    assert deep.max() < 2.5 * expected
    # land stays zero
    assert np.abs(iage[~kmask]).max() == 0.0


def test_nt_mismatch_raises():
    import pytest
    cfg = get_config("mini").with_(nt=2, passive_tracers=("iage",))
    with pytest.raises(ValueError):
        Model(cfg)
