"""Tripole fold tests against the reference unit-test oracle
(test/unit/halo/POP.F90Tripole:321-344 center, :565-612 E-face, corner and
N-face blocks; mapping table in mpi/POP_HaloMod.F90:1961-2013)."""

import numpy as np
import jax.numpy as jnp

from pop2_tpu import tripole

NY, NX = 12, 16


def _global_field():
    # analytic oracle field f(iglob, jglob) as in the reference test
    ig = np.arange(1, NX + 1)[None, :]
    jg = np.arange(1, NY + 1)[:, None]
    return ((jg - 1) * NX + ig) * 100.0


def test_center_scalar_fold():
    f = jnp.asarray(_global_field())
    for n in (1, 2):
        ghost = np.asarray(tripole.fold_rows(f, n, "center", "scalar"))
        # expected: ghost(i, ny+n) = f(nx+1-i, ny+1-n)  (1-based)
        g = _global_field()
        expect = np.array([g[NY - n, NX - i0 - 1] for i0 in range(NX)])
        np.testing.assert_array_equal(ghost, expect)


def test_eface_fold():
    f = jnp.asarray(_global_field())
    for n in (1, 2):
        ghost = np.asarray(tripole.fold_rows(f, n, "eface", "scalar"))
        g = _global_field()
        # expected: ghost(i, ny+n) = f(nx-i, ny+1-n); i = nx -> f(nx, .)
        expect = np.empty(NX)
        for i0 in range(NX):
            i = i0 + 1
            isrc = NX - i if i != NX else NX
            expect[i0] = g[NY - n, isrc - 1]
        np.testing.assert_array_equal(ghost, expect)


def test_necorner_vector_fold():
    f = jnp.asarray(_global_field())
    for n in (1, 2):
        ghost = np.asarray(tripole.fold_rows(f, n, "necorner", "vector"))
        g = _global_field()
        # expected: ghost(i, ny+n) = -f(nx-i, ny-n)
        expect = np.empty(NX)
        for i0 in range(NX):
            i = i0 + 1
            isrc = NX - i if i != NX else NX
            expect[i0] = -g[NY - n - 1, isrc - 1]
        np.testing.assert_array_equal(ghost, expect)


def test_nface_fold():
    f = jnp.asarray(_global_field())
    ghost = np.asarray(tripole.fold_rows(f, 1, "nface", "vector"))
    g = _global_field()
    expect = np.array([-g[NY - 2, NX - i0 - 1] for i0 in range(NX)])
    np.testing.assert_array_equal(ghost, expect)


def test_shift_n_interior_unchanged():
    f = jnp.asarray(_global_field())
    for dist in (1, 2):
        s = np.asarray(tripole.shift_n_tripole(f, dist, "center", "scalar"))
        np.testing.assert_array_equal(s[:NY - dist], _global_field()[dist:])
        # ghost rows match fold
        for n in range(1, dist + 1):
            np.testing.assert_array_equal(
                s[NY - 1 - dist + n],
                np.asarray(tripole.fold_rows(f, n, "center", "scalar")))


def test_top_symmetry_enforcement():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randn(NY, NX))
    g = np.asarray(tripole.enforce_top_symmetry(f, "necorner", "vector"))
    top = g[-1]
    old = np.asarray(f)[-1]
    # reference semantics (mpi/POP_HaloMod.F90:1977-1986): equal magnitudes
    # between fold partners; each new value takes isign * sign of the OLD
    # partner value
    for i0 in range(NX - 1):
        p0 = NX - 2 - i0
        np.testing.assert_allclose(abs(top[i0]), abs(top[p0]), atol=1e-12)
        expect = -np.sign(old[p0]) * 0.5 * (abs(old[i0]) + abs(old[p0]))
        np.testing.assert_allclose(top[i0], expect, atol=1e-12)


def test_reduction_weights():
    w = np.asarray(tripole.reduction_weights(NY, NX, "necorner"))
    assert w[-1, : NX // 2].sum() == NX // 2
    assert w[-1, NX // 2:].sum() == 0
    assert w[:-1].sum() == (NY - 1) * NX
    wc = np.asarray(tripole.reduction_weights(NY, NX, "center"))
    assert wc.sum() == NY * NX
