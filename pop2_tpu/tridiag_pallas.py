"""Pallas TPU kernel for the batched implicit-vertical-mixing tridiagonal
solve.

The jnp path (``tridiag._thomas``) expresses the Thomas sweep as two
``lax.scan``s; XLA materializes the per-level elimination coefficients E and
partial solutions F to HBM (~5 full-field passes). This kernel performs the
whole forward-elimination + back-substitution in VMEM per tile, so HBM
traffic drops to the roofline minimum: read A and the RHS once, write the
solution once.

Layout: vertical columns are independent, so the (ny, nx) horizontal is
flattened to one padded point axis P and tiled as (km, bp) VMEM blocks —
this tiles cleanly for every grid preset regardless of nx/ny divisibility.
The km sweep is a static Python loop (km <= 62) over (bp,)-wide vector ops.

Matches ``tridiag._thomas`` (itself a port of source/vertical_mix.F90:1164,
:1679) bitwise in the shared-precision sense; the 1-D-thickness (non
partial-bottom-cell) path only — 3-D DZT falls back to the scan.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: None = auto (TPU backend + float32 + 1-D thickness); True/False forces.
#: Tests set ``interpret=True`` through ``force_interpret``.
USE_PALLAS = None
force_interpret = False

#: Device mesh for per-shard dispatch, scoped (NOT module-global): each
#: Model's jitted step enters ``dispatch_mesh(model._mesh)`` at trace time,
#: so two models with different meshes never clobber each other and a
#: single-device Model never resets a sharded model's dispatch. Columns are
#: independent, so under a (y, x)-sharded mesh the kernel runs per shard
#: inside ``jax.shard_map`` with zero communication — the TPU equivalent of
#: the reference running its per-block column loops on each rank's local
#: blocks (source/vertical_mix.F90:1164 block loop).
_DISPATCH_MESH = contextvars.ContextVar("pop2_tpu_dispatch_mesh",
                                        default=None)


@contextlib.contextmanager
def dispatch_mesh(mesh):
    """Scope the per-shard dispatch mesh for Pallas kernels traced inside."""
    token = _DISPATCH_MESH.set(mesh)
    try:
        yield
    finally:
        _DISPATCH_MESH.reset(token)

_BP = 3072  # points per tile (24 lanes x 128); (km, _BP) f32 = 0.5 MB/array


def _thomas_kernel(nr, km, hfac_ref, h1_ref, kmax_ref, a_ref, rhs_ref,
                   out_ref, e_scr):
    """One tile. The point axis is shaped (bs sublanes, 128 lanes) so every
    per-level vector op fills the 8x128 VPU: hfac (km,) scalar-prefetch;
    h1/kmax (bs, 128); a/e_scr (km, bs, 128); rhs/out (nr*km, bs, 128)
    with row n*km + k."""
    h1 = h1_ref[:, :]
    kmax = kmax_ref[:, :]

    # level-1 setup (source/vertical_mix.F90:1263-1274); one reciprocal per
    # level feeds both the E update and the RHS solves
    a0 = a_ref[0]
    dinv = 1.0 / (h1 + a0)
    e = a0 * dinv
    b = h1 * e
    e_scr[0] = e
    hf0 = hfac_ref[0]
    for n in range(nr):
        out_ref[n * km] = hf0 * rhs_ref[n * km] * dinv

    # forward elimination
    for k in range(1, km):
        kk = k + 1  # 1-based level
        at_bot = kmax == kk
        below = kmax < kk
        c = a_ref[k - 1]
        ak = a_ref[k]
        hf = hfac_ref[k]
        d = jnp.where(below, 1.0,
                      hf + b + jnp.where(at_bot, 0.0, ak))
        dinv = 1.0 / d
        e = jnp.where(below, 0.0, ak * dinv)
        b = (hf + b) * e
        e_scr[k] = e
        for n in range(nr):
            f_prev = out_ref[n * km + k - 1]
            out_ref[n * km + k] = jnp.where(
                below, 0.0, (hf * rhs_ref[n * km + k] + c * f_prev) * dinv)

    # back substitution (source/vertical_mix.F90:1338-1349)
    for k in range(km - 2, -1, -1):
        interior = (k + 1) < kmax
        ek = e_scr[k]
        for n in range(nr):
            r = n * km + k
            f_dn = out_ref[r + 1]
            out_ref[r] = jnp.where(
                interior, out_ref[r] + ek * f_dn, out_ref[r])


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_tiles(hfac, h1, kmax, a, rhs, interpret=False):
    """Solve the masked tridiagonal systems for every column.

    hfac: (km,) diagonal mass terms dz_k/c2dt_k.
    h1: (ny, nx) surface diagonal term (incl. psurf correction).
    kmax: (ny, nx) int32 deepest level (1-based; 0 = land).
    a: (km, ny, nx) subdiagonal coupling.
    rhs: (nr, km, ny, nx) right-hand sides BEFORE the hfac scaling (the
      kernel forms hfac_k * rhs_k itself).
    Returns (nr, km, ny, nx) solutions.
    """
    nr, km = rhs.shape[0], rhs.shape[1]
    ny, nx = h1.shape
    p = ny * nx
    bp = min(_BP, max(1024, p))
    p_pad = -(-p // bp) * bp
    bs = bp // 128                 # sublane rows per tile
    nrows = p_pad // 128

    def flat(x, lead):
        x = jnp.reshape(x, lead + (p,))
        pad = [(0, 0)] * len(lead) + [(0, p_pad - p)]
        x = jnp.pad(x, pad)
        return jnp.reshape(x, lead + (nrows, 128))

    h1f = flat(h1, ())                              # (R, 128)
    kmaxf = flat(kmax.astype(jnp.int32), ())        # (R, 128) — 0-pad = land
    af = flat(a, (km,))
    rhsf = jnp.reshape(flat(rhs, (nr, km)), (nr * km, nrows, 128))

    # index maps cast to int32: with jax_enable_x64 their returns would be
    # i64, which Mosaic fails to legalize
    def imap2(i, *_):
        return (jnp.int32(i), jnp.int32(0))

    def imap3(i, *_):
        return (jnp.int32(0), jnp.int32(i), jnp.int32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # hfac (km,) rides as a scalar-prefetch arg
        grid=(p_pad // bp,),
        in_specs=[
            pl.BlockSpec((bs, 128), imap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 128), imap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((km, bs, 128), imap3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nr * km, bs, 128), imap3,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nr * km, bs, 128), imap3,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((km, bs, 128), rhs.dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_thomas_kernel, nr, km),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr * km, nrows, 128), rhs.dtype),
        interpret=interpret,
    )(hfac, h1f, kmaxf, af, rhsf)
    out = jnp.reshape(out, (nr, km, p_pad))
    return jnp.reshape(out[:, :, :p], (nr, km, ny, nx))


def thomas(hfac, h1, kmax, a, rhs, interpret=False):
    """Mesh-aware entry point: under an active ``dispatch_mesh`` scope,
    dispatch ``thomas_tiles`` per shard via ``jax.shard_map`` (the
    flatten/pad inside the kernel is then shard-local and never gathers);
    with no mesh in scope, fall through to the direct call."""
    mesh = _DISPATCH_MESH.get()
    if mesh is None:
        return thomas_tiles(hfac, h1, kmax, a, rhs, interpret=interpret)
    from jax.sharding import PartitionSpec as P
    yx = ("y", "x")
    return jax.shard_map(
        functools.partial(thomas_tiles, interpret=interpret),
        mesh=mesh,
        in_specs=(P(), P(*yx), P(*yx), P(None, *yx), P(None, None, *yx)),
        out_specs=P(None, None, *yx),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )(hfac, h1, kmax, a, rhs)


def available(dz, dtype) -> bool:
    """Fast path applies: 1-D layer thickness, f32, TPU (or forced)."""
    if USE_PALLAS is not None:
        return bool(USE_PALLAS) and dz.ndim == 1
    return (dz.ndim == 1 and jnp.dtype(dtype) == jnp.float32
            and jax.default_backend() == "tpu")
