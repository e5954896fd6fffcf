"""Flagship (prod_full) integration stability — the regression net for
the round-4/5 finding that the production benchmark configuration blew
up (NaN by step 20) on real hardware while every smaller-config test
stayed green: the real gx1v7 overflow point data is inconsistent with
the internally generated topography, and the prescribed overflow
circuit turned into an unstable forcing.  Model init now applies the
reference's init_overflows_kmt consistency contract
(source/overflows.F90:1196-1275) and deactivates inconsistent
overflows; this test steps the real flagship dims/menu long enough to
see the old exponential blowup (doubling from ~step 14)."""

import warnings

import numpy as np
import pytest


@pytest.mark.slow
def test_flagship_integrates_finite():
    from pop2_tpu.model import Model
    from pop2_tpu.production import get_production_config

    cfg = get_production_config(dtype="float32")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        m = Model(cfg)
    # the internally generated topography cannot host the real gx1v7
    # overflow conduits: validation must have deactivated them (loudly)
    assert len(m.cfg.overflows) == 0
    assert any("deactivating overflows" in str(w.message) for w in rec)

    state = m.initial_state()
    state, diags = m.advance(state)
    state, diags = m.run_compiled(state, 24)
    u = np.asarray(state.u_cur)
    t = np.asarray(state.tracer_cur)
    assert np.isfinite(u).all() and np.isfinite(t).all()
    # spun up from rest: bounded currents and physical temperatures
    assert np.abs(u).max() < 500.0            # cm/s
    assert np.abs(t[0]).max() < 45.0          # degC
    assert int(diags.solver_iters) < 1500
