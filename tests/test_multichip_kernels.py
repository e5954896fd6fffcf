"""Model-level multichip fast path: the fused Pallas kernels must be the
ACTIVE path in a multi-device production-menu step, and the sharded step
must agree with the single-device one (round-4 verdict item 4 — front-end
equivalence alone does not prove the model wiring engages the kernels).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pop2_tpu import clinic_pallas, gm_pallas, tracer_pallas
from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.parallel import mesh as pmesh


def _prod_mini_cfg(mesh_shape=(1, 1)):
    """A production-shaped menu at CI dims: tripole, GM tracer mixing,
    aniso momentum (kernel path with_hdiffu=False), KPP, fp32."""
    return get_config("mini").with_(
        dtype="float32", nx=64, ny=64, km=8, nt=2,
        ns_boundary="tripole", hmix_tracer="gm", hmix_momentum="aniso",
        vmix="kpp", mesh_shape=mesh_shape)


def test_kernels_active_in_multidevice_step():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    calls = {"tracer": 0, "clinic": 0, "gm": 0}
    orig_t = tracer_pallas.tracer_tendency_tiles
    orig_c = clinic_pallas.clinic_rhs_tiles
    orig_g = gm_pallas.flux_assembly_tiles

    def count(name, orig):
        def wrapped(*a, **k):
            calls[name] += 1
            return orig(*a, **k)
        return wrapped

    mods = [(tracer_pallas, "tracer_tendency_tiles", orig_t, "tracer"),
            (clinic_pallas, "clinic_rhs_tiles", orig_c, "clinic"),
            (gm_pallas, "flux_assembly_tiles", orig_g, "gm")]
    olds = [(tracer_pallas.USE_PALLAS, tracer_pallas.force_interpret),
            (clinic_pallas.USE_PALLAS, clinic_pallas.force_interpret),
            (gm_pallas.USE_PALLAS, gm_pallas.force_interpret)]
    try:
        for mod, attr, orig, name in mods:
            setattr(mod, attr, count(name, orig))
            mod.USE_PALLAS = True
            mod.force_interpret = True

        # single device, kernels forced on
        m1 = Model(_prod_mini_cfg())
        s1 = m1.initial_state()
        for _ in range(2):
            s1, d1 = m1.advance(s1)
        assert calls["tracer"] > 0, "tracer kernel not engaged (1-dev)"
        assert calls["clinic"] > 0, "clinic kernel not engaged (1-dev)"
        assert calls["gm"] > 0, "gm kernel not engaged (1-dev)"

        # (8, 1) mesh: every kernel must still be the active path
        for k in calls:
            calls[k] = 0
        cfg8 = _prod_mini_cfg(mesh_shape=(8, 1))
        m8, mesh = pmesh.sharded_model(cfg8)
        s8 = pmesh.shard_pytree(m8.initial_state(), mesh)
        for _ in range(2):
            s8, d8 = m8.advance(s8)
        assert calls["tracer"] > 0, "tracer kernel not engaged (8-dev)"
        assert calls["clinic"] > 0, "clinic kernel not engaged (8-dev)"
        assert calls["gm"] > 0, "gm kernel not engaged (8-dev)"
    finally:
        for (mod, attr, orig, name), (use, interp) in zip(mods, olds):
            setattr(mod, attr, orig)
            mod.USE_PALLAS = use
            mod.force_interpret = interp

    # sharded step agrees with the single-device step at fp32 tolerance
    # (bitwise equality across shardings is not achievable under XLA SPMD
    # for the jnp glue between kernels — see tests/test_b4b.py docstring)
    for name in ("tracer_cur", "u_cur", "v_cur", "psurf_cur"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(s8, name))
        scale = np.abs(a).max() + 1e-30
        np.testing.assert_allclose(
            a, b, rtol=0, atol=5e-6 * scale,
            err_msg=f"{name} differs between 1-dev and 8-dev kernel runs")
