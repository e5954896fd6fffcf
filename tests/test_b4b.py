"""Bit-for-bit reproducible reductions (the reference's b4b_flag,
mpi/global_reductions.F90:134,599; enabled via source/initial.F90:730-741):
with cfg.b4b the model state must be IDENTICAL BITS on any mesh
decomposition, the invariant POP's PET tests enforce across PE layouts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.parallel import mesh as pmesh
from pop2_tpu.reductions import global_sum


def test_b4b_sum_order_independent():
    """The fixed-point sum gives identical bits for any summation order and
    stays within a few ulps of the float sum."""
    rng = np.random.RandomState(0)
    x = rng.randn(64, 96) * np.logspace(-8, 8, 64 * 96).reshape(64, 96)
    ref = float(global_sum(jnp.asarray(x), b4b=True))
    for perm in range(4):
        xs = x.flatten()
        rng.shuffle(xs)
        got = float(global_sum(jnp.asarray(xs.reshape(96, 64)), b4b=True))
        assert got == ref  # bitwise
    assert abs(ref - x.sum()) <= 1e-12 * abs(x.sum()) + 1e-300


def test_b4b_sum_handles_zeros_and_axis():
    z = jnp.zeros((4, 5))
    assert float(global_sum(z, b4b=True)) == 0.0
    x = jnp.asarray(np.random.RandomState(1).randn(3, 8, 9))
    per = global_sum(x, b4b=True, axis=(1, 2))
    assert per.shape == (3,)
    np.testing.assert_allclose(np.asarray(per), np.asarray(x).sum((1, 2)),
                               rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_b4b_step_bitwise_across_mesh():
    """Full steps (solver dot products, checkerboard removal) produce
    identical bits single-device vs a (4,2) mesh when b4b is on."""
    cfg = get_config("mini").with_(b4b=True)
    m1 = Model(cfg)
    st1 = m1.initial_state()
    for _ in range(5):
        st1, d1 = m1.advance(st1)

    cfg8 = cfg.with_(mesh_shape=(4, 2))
    m8, mesh = pmesh.sharded_model(cfg8)
    st8 = pmesh.shard_pytree(m8.initial_state(), mesh)
    for _ in range(5):
        st8, d8 = m8.advance(st8)

    assert int(d1.solver_iters) == int(d8.solver_iters)
    for name in ("tracer_cur", "u_cur", "v_cur", "psurf_cur"):
        a = np.asarray(getattr(st1, name))
        b = np.asarray(getattr(st8, name))
        assert np.array_equal(a, b), f"{name} differs across decompositions"
