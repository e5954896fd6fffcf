"""Decomposition invariance: the same steps on a sharded mesh must match the
single-device run (the reference's b4b-across-decompositions requirement,
SURVEY.md §4.3; tested on the 8-device virtual CPU mesh from conftest)."""

import numpy as np
import jax
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.parallel import mesh as pmesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    cfg = get_config("mini")
    m1 = Model(cfg)
    st1 = m1.initial_state()
    for _ in range(5):
        st1, _ = m1.advance(st1)

    cfg8 = cfg.with_(mesh_shape=(4, 2))
    m8, mesh = pmesh.sharded_model(cfg8)
    st8 = pmesh.shard_pytree(m8.initial_state(), mesh)
    for _ in range(5):
        st8, _ = m8.advance(st8)

    np.testing.assert_allclose(np.asarray(st1.tracer_cur),
                               np.asarray(st8.tracer_cur),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st1.u_cur), np.asarray(st8.u_cur),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(st1.psurf_cur),
                               np.asarray(st8.psurf_cur),
                               rtol=0, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_with_pallas_tridiag_matches_single_device():
    """Decomposition invariance with the Pallas Thomas kernel ENABLED
    (interpret mode on CPU): the shard_map dispatch (tridiag_pallas.thomas)
    must keep the kernel usable under meshes (VERDICT round-1 item 4)."""
    from pop2_tpu import tridiag_pallas

    cfg = get_config("mini").with_(dtype="float32")
    try:
        tridiag_pallas.USE_PALLAS = True
        tridiag_pallas.force_interpret = True

        m1 = Model(cfg)
        st1 = m1.initial_state()
        for _ in range(3):
            st1, _ = m1.advance(st1)

        cfg8 = cfg.with_(mesh_shape=(2, 2))
        m8, mesh = pmesh.sharded_model(cfg8)
        st8 = pmesh.shard_pytree(m8.initial_state(), mesh)
        for _ in range(3):
            st8, _ = m8.advance(st8)
    finally:
        tridiag_pallas.USE_PALLAS = None
        tridiag_pallas.force_interpret = False
        tridiag_pallas.MESH = None

    np.testing.assert_allclose(np.asarray(st1.tracer_cur),
                               np.asarray(st8.tracer_cur),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st1.u_cur), np.asarray(st8.u_cur),
                               rtol=0, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_output_is_sharded():
    cfg = get_config("mini").with_(mesh_shape=(2, 4))
    m8, mesh = pmesh.sharded_model(cfg)
    st = pmesh.shard_pytree(m8.initial_state(), mesh)
    st, _ = m8.advance(st)
    sh = st.tracer_cur.sharding
    assert sh.is_fully_replicated is False
