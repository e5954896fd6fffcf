"""Fused Pallas TPU kernel for the GM/Redi flux assembly.

The production gx1v7 menu runs GM (bfre kappa + transition layer) for
every tracer; the jnp flux assembly (gm.flux_assembly_jnp,
source/hmix_gm.F90:1720-2080) materializes the per-face weight fields,
the three flux fields, and their shifted copies to HBM — measured ~75 ms
of the ~250 ms production step on one v5e chip against a ~5 ms roofline.

This kernel computes, for each y-tile and tracer,

    GTK = (Fx - Fx_w + Fy - Fy_s + Fz_top - Fz) * dzr * TAREA_R
    VDC_GM = dzw * kmask * TAREA_R * quarter-cell kappa |S|^2 sums

in ONE pass over HBM: the tracer-independent weights (effective
diffusivities, skew-minus-bolus streamfunction weights, masked face
coefficients) are built once per level in VMEM and reused across
tracers; the vertical-flux FZTOP carry and the south-row Fy evaluation
(for the divergence) stay on-chip.

Scope: isotropic kappa (gm_aniso=None — the production GM; the aniso
variant keeps the jnp chain), closed/cyclic E-W, closed/tripole N-S
(the tripole top row is re-patched from an 8-row jnp slab), float32,
single chip or y-sharded dispatch meshes' per-shard blocks via the
closed-edge path (GM's stencil reach is one row; the jnp fallback is
used under multi-chip meshes for now). Equivalence vs
gm.flux_assembly_jnp is asserted by tests/test_gm_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pop2_tpu.tracer_pallas import (_VMEM_BUDGET, _lane_pad, _roll_e,
                                    _roll_w)

#: None = auto (TPU + float32 + supported config); True/False forces.
USE_PALLAS = None
force_interpret = False

_I0 = np.int32(0)


def available(cfg, grid) -> bool:
    """The fused GM flux assembly applies: isotropic kappa, full cells,
    closed/cyclic E-W, closed/tripole N-S, an admissible y-tiling,
    float32 on TPU. Under a y-sharded dispatch mesh the shard_map/
    ppermute halo front-end feeds the kernel per shard (x-sharded meshes
    fall back to the jnp chain, whose shifts lower to collective
    permutes)."""
    from pop2_tpu.tracer_pallas import _mesh_y_only
    mesh = _mesh_y_only()
    if mesh is None:
        return False               # x-sharded mesh: jnp fallback
    ny_loc = cfg.ny if mesh == "none" else cfg.ny // mesh.shape["y"]
    ok = (grid.DZT is None
          and cfg.ns_boundary in ("closed", "tripole")
          and cfg.ew_boundary in ("cyclic", "closed")
          and ny_loc % 8 == 0
          and _pick_by(cfg.nt, cfg.km, ny_loc,
                       -(-cfg.nx // 128) * 128) is not None)
    if not ok:
        return False
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    return (jnp.dtype(cfg.jnp_dtype) == jnp.float32
            and jax.default_backend() == "tpu")


def _pick_by(nt, km, ny, nx):
    """Largest y-tile whose VMEM working set fits (exact 8-aligned
    tiling only). Planes: center tx/ty/tz (3nt) + wpack (9) + abpack
    (8) + gtk out (nt); south halos ty/tz (2nt) + 3 weights; north
    halos tz (nt) + 3 weights."""
    for by in (16, 8):
        if ny % by:
            continue
        per = km * nx * 4
        b = ((4 * nt + 17) * by * per
             + (3 * nt + 6) * 8 * per
             + 24 * by * nx * 4)                   # 2-D fields
        if b <= _VMEM_BUDGET:
            return by
    return None


# wpack plane order (tracer-independent weight fields); np.int32 so ref
# indices stay 32-bit under jax_enable_x64 (Mosaic rejects i64 slices)
(_WEFF, _WS0, _WS1, _WN0, _WN1, _VE0, _VE1, _VW0, _VW1) = (
    np.int32(i) for i in range(9))


def _kernel(nt, km, by, nx, ew, cancellation, s_edge, n_edge,
            dz_ref, dzr_ref,
            # HBM operands
            tx_hbm, ty_hbm, tz_hbm,          # (nt, km, ny, nx)
            wp_hbm,                          # (9, km, ny, nx) weights
            ab_hbm,                          # (8, km, ny, nx) A/B packs
            kmt_hbm, hyx_hbm, hxy_hbm, tarea_r_hbm,
            sed_ty_hbm, sed_tz_hbm, sed_wp_hbm, sed_kmt_hbm, sed_hxy_hbm,
            ned_tz_hbm, ned_wp_hbm, ned_kmt_hbm,
            # output
            gtk_hbm,
            # VMEM scratch
            txb, tyb, tzb, wpb, abb,
            tys, tzs, wps_w, wps_n,          # south halos
            tzn, wpn,                        # north halos
            kmtb, kmts, kmtn, hyxb, hxyb, hxys_blk, tareab,
            gtkb, sems):
    ny = kmt_hbm.shape[-2]
    t = pl.program_id(0)
    ntiles = pl.num_programs(0)
    j0 = pl.multiple_of(t * by, 8)

    # ---- DMA the tile working set -----------------------------------------
    copies = []

    def dma(src, dst, slot):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        copies.append(c)

    dma(tx_hbm.at[:, :, pl.ds(j0, by), :], txb, 0)
    dma(ty_hbm.at[:, :, pl.ds(j0, by), :], tyb, 1)
    dma(tz_hbm.at[:, :, pl.ds(j0, by), :], tzb, 2)
    dma(wp_hbm.at[:, :, pl.ds(j0, by), :], wpb, 3)
    dma(ab_hbm.at[:, :, pl.ds(j0, by), :], abb, 4)
    dma(kmt_hbm.at[pl.ds(j0, by), :], kmtb, 5)
    dma(hyx_hbm.at[pl.ds(j0, by), :], hyxb, 6)
    dma(hxy_hbm.at[pl.ds(j0, by), :], hxyb, 7)
    dma(tarea_r_hbm.at[pl.ds(j0, by), :], tareab, 8)

    # south halo blocks: rows [j0-8, j0); zeros at the closed south edge
    @pl.when(t > 0)
    def _():
        js = pl.multiple_of(j0 - 8, 8)
        halos = []
        for src, dst, slot in (
                (ty_hbm.at[:, :, pl.ds(js, 8), :], tys, 9),
                (tz_hbm.at[:, :, pl.ds(js, 8), :], tzs, 10),
                (wp_hbm.at[pl.ds(_I0, 1), :, pl.ds(js, 8), :],
                 wps_w, 11),                      # weff
                (wp_hbm.at[pl.ds(np.int32(_WN0), 2), :, pl.ds(js, 8), :],
                 wps_n, 12),                      # wN0, wN1
                (kmt_hbm.at[pl.ds(js, 8), :], kmts, 13),
                (hxy_hbm.at[pl.ds(js, 8), :], hxys_blk, 14)):
            c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
            c.start()
            halos.append(c)
        for c in halos:
            c.wait()

    if s_edge == "data":
        # provided south-edge blocks (shard_map neighbor rows; the mesh
        # south edge receives ppermute zeros == closed)
        @pl.when(t == 0)
        def _():
            halos = []
            for src, dst, slot in (
                    (sed_ty_hbm, tys, 9), (sed_tz_hbm, tzs, 10),
                    (sed_wp_hbm.at[pl.ds(_I0, 1)], wps_w, 11),
                    (sed_wp_hbm.at[pl.ds(np.int32(1), 2)], wps_n, 12),
                    (sed_kmt_hbm, kmts, 13), (sed_hxy_hbm, hxys_blk, 14)):
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                halos.append(c)
            for c in halos:
                c.wait()
    else:
        @pl.when(t == 0)
        def _():
            tys[...] = jnp.zeros_like(tys[...])
            tzs[...] = jnp.zeros_like(tzs[...])
            wps_w[...] = jnp.zeros_like(wps_w[...])
            wps_n[...] = jnp.zeros_like(wps_n[...])
            kmts[...] = jnp.zeros_like(kmts[...])
            hxys_blk[...] = jnp.zeros_like(hxys_blk[...])

    # north halo blocks: rows [j0+by, j0+by+8); zeros at the north edge
    # (closed; the tripole top row is re-patched by the wrapper)
    @pl.when(t < ntiles - 1)
    def _():
        jn = pl.multiple_of(j0 + by, 8)
        halos = []
        for src, dst, slot in (
                (tz_hbm.at[:, :, pl.ds(jn, 8), :], tzn, 15),
                (wp_hbm.at[pl.ds(_I0, 3), :, pl.ds(jn, 8), :],
                 wpn, 16),                        # weff, wS0, wS1
                (kmt_hbm.at[pl.ds(jn, 8), :], kmtn, 17)):
            c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
            c.start()
            halos.append(c)
        for c in halos:
            c.wait()

    if n_edge == "data":
        # provided north-edge blocks; zeros arrive at the global top
        # shard (kmt 0 there reproduces the closed-edge masking, and the
        # tripole top row is re-patched by the wrapper)
        @pl.when(t == ntiles - 1)
        def _():
            halos = []
            for src, dst, slot in (
                    (ned_tz_hbm, tzn, 15), (ned_wp_hbm, wpn, 16),
                    (ned_kmt_hbm, kmtn, 17)):
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                halos.append(c)
            for c in halos:
                c.wait()
    else:
        @pl.when(t == ntiles - 1)
        def _():
            tzn[...] = jnp.zeros_like(tzn[...])
            wpn[...] = jnp.zeros_like(wpn[...])
            kmtn[...] = jnp.zeros_like(kmtn[...])

    for c in copies:
        c.wait()

    # ---- row helpers (tracer_pallas pattern) ------------------------------
    def row7(b):
        return pltpu.roll(b, np.int32(1), axis=b.ndim - 2)[..., 0:1, :]

    def row0(b):
        return b[..., 0:1, :]

    row2 = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)

    def sh_n(x, north_row):
        g = pltpu.roll(x, np.int32(by - 1), axis=x.ndim - 2)
        return jnp.where(row2 == by - 1, north_row, g)

    def sh_s(x, south_row):
        g = pltpu.roll(x, np.int32(1), axis=x.ndim - 2)
        return jnp.where(row2 == 0, south_row, g)

    # ---- 2-D precomputation -----------------------------------------------
    kmt_c = kmtb[...]
    kmt_n = sh_n(kmt_c, row0(kmtn[...]))
    kmt_e = _roll_e(kmt_c, ew)
    kmt_srow = row7(kmts[...])
    hyx = hyxb[...]
    hyxw = _roll_w(hyx, ew)
    hxy = hxyb[...]
    hxys = sh_s(hxy, row7(hxys_blk[...]))
    hxy_srow = row7(hxys_blk[...])
    tarea_r = tareab[...]

    fzfac = 0.5 if cancellation else 0.25

    # ---- k loop: FZTOP carried per tracer ---------------------------------
    fztop0 = [jnp.zeros((by, nx), jnp.float32) for _ in range(nt)]

    def level(k, fztop):
        kk = k + 1                           # 1-based level
        ki = np.int32(k)
        kp = np.int32(min(k + 1, km - 1))
        last = k == km - 1
        dzk = dz_ref[ki]
        dzrk = dzr_ref[ki]

        cx = jnp.where((kk <= kmt_c) & (kk <= kmt_e), 0.25 * hyx, 0.0)
        cy = jnp.where((kk <= kmt_c) & (kk <= kmt_n), 0.25 * hxy, 0.0)
        cy_s = jnp.where((kk <= kmt_srow) & (kk <= row0(kmt_c)),
                         0.25 * hxy_srow, 0.0)
        kmask = ((kk < kmt_c).astype(jnp.float32))
        tmask = ((kk <= kmt_c).astype(jnp.float32))

        weff = wpb[_WEFF, ki]
        weff_n = sh_n(weff, row0(wpn[_I0, ki]))
        weff_srow = row7(wps_w[_I0, ki])
        work3 = weff + _roll_e(weff, ew)
        work4 = weff + weff_n
        work4_srow = weff_srow + row0(weff)

        if not cancellation:
            vE0, vE1 = wpb[_VE0, ki], wpb[_VE1, ki]
            vW0e = _roll_e(wpb[_VW0, ki], ew)
            vW1e = _roll_e(wpb[_VW1, ki], ew)
            wN0, wN1 = wpb[_WN0, ki], wpb[_WN1, ki]
            wS0n = sh_n(wpb[_WS0, ki], row0(wpn[np.int32(1), ki]))
            wS1n = sh_n(wpb[_WS1, ki], row0(wpn[np.int32(2), ki]))
            wN0_srow = row7(wps_n[_I0, ki])
            wN1_srow = row7(wps_n[np.int32(1), ki])
            wS0_r0 = row0(wpb[_WS0, ki])
            wS1_r0 = row0(wpb[_WS1, ki])

        A_e, A_w = abb[_I0, ki], abb[np.int32(1), ki]
        A_n, A_s = abb[np.int32(2), ki], abb[np.int32(3), ki]
        if last:
            B_e = B_w = B_n = B_s = jnp.zeros((by, nx), jnp.float32)
        else:
            B_e, B_w = abb[np.int32(4), kp], abb[np.int32(5), kp]
            B_n, B_s = abb[np.int32(6), kp], abb[np.int32(7), kp]

        for n in range(nt):
            nn = np.int32(n)
            txk = txb[nn, ki]
            tyk = tyb[nn, ki]
            tzk = tzb[nn, ki]
            tzkp = tzb[nn, kp]
            txkp = txb[nn, kp]
            tykp = tyb[nn, kp]
            tzk_n = sh_n(tzk, row0(tzn[nn, ki]))
            tzkp_n = sh_n(tzkp, row0(tzn[nn, kp]))
            tzk_srow = row7(tzs[nn, ki])
            tzkp_srow = row7(tzs[nn, kp])
            tyk_srow = row7(tys[nn, ki])
            tykp_srow = row7(tys[nn, kp])
            tyk_s = sh_s(tyk, tyk_srow)
            tykp_s = sh_s(tykp, tykp_srow)

            fx = dzk * cx * txk * work3
            fy = dzk * cy * tyk * work4
            fy_srow = dzk * cy_s * tyk_srow * work4_srow
            if not cancellation:
                fx = fx - cx * (vE0 * tzk + vE1 * tzkp
                                + vW0e * _roll_e(tzk, ew)
                                + vW1e * _roll_e(tzkp, ew))
                fy = fy - cy * (wN0 * tzk + wN1 * tzkp
                                + wS0n * tzk_n + wS1n * tzkp_n)
                fy_srow = fy_srow - cy_s * (
                    wN0_srow * tzk_srow + wN1_srow * tzkp_srow
                    + wS0_r0 * row0(tzk) + wS1_r0 * row0(tzkp))

            work = (A_e * hyx * txk + A_w * hyxw * _roll_w(txk, ew)
                    + A_n * hxy * tyk + A_s * hxys * tyk_s
                    + B_e * hyx * txkp + B_w * hyxw * _roll_w(txkp, ew)
                    + B_n * hxy * tykp + B_s * hxys * tykp_s)
            fz = -kmask * fzfac * work

            gtk = ((fx - _roll_w(fx, ew) + fy - sh_s(fy, fy_srow)
                    + fztop[n] - fz) * dzrk * tarea_r)
            gtkb[nn, ki] = tmask * gtk
            fztop[n] = fz
        return fztop

    fztop = fztop0
    for k in range(km):
        fztop = level(np.int32(k), fztop)

    # ---- write the tile back ----------------------------------------------
    out = pltpu.make_async_copy(gtkb, gtk_hbm.at[:, :, pl.ds(j0, by), :],
                                sems.at[np.int32(18)])
    out.start()
    out.wait()


@functools.partial(jax.jit,
                   static_argnames=("ew", "cancellation", "s_edge",
                                    "n_edge", "interpret"))
def flux_assembly_tiles(tx, ty, tz, wpack, abpack, kmt, hyx, hxy,
                        tarea_r, dz, dzr, edges=None, ew="cyclic",
                        cancellation=False,
                        s_edge="closed", n_edge="closed", interpret=False):
    """GTK in one HBM pass. Shapes: tx/ty/tz (nt,km,ny,nx); wpack
    (9,km,ny,nx) in (_WEFF.._VW1) order; abpack (8,km,ny,nx) =
    [A_e,A_w,A_n,A_s,B_e,B_w,B_n,B_s]; 2-D fields (ny,nx); dz/dzr (km,).

    ``edges`` (shard_map front-end, s_edge/n_edge 'data'): dict with
    sed_ty/sed_tz (nt,km,8,nx), sed_wp (3,km,8,nx) = [weff,wN0,wN1],
    sed_kmt/sed_hxy (8,nx); ned_tz (nt,km,8,nx), ned_wp (3,km,8,nx) =
    [weff,wS0,wS1], ned_kmt (8,nx) — the first/last tile reads these
    instead of closed zeros."""
    nt, km, ny, nx_log = tx.shape
    nx = -(-nx_log // 128) * 128
    f32_ = jnp.float32
    if edges is None:
        edges = {}
    e = {
        "sed_ty": edges.get("sed_ty",
                            jnp.zeros((nt, km, 8, nx_log), f32_)),
        "sed_tz": edges.get("sed_tz",
                            jnp.zeros((nt, km, 8, nx_log), f32_)),
        "sed_wp": edges.get("sed_wp",
                            jnp.zeros((3, km, 8, nx_log), f32_)),
        "sed_kmt": edges.get("sed_kmt",
                             jnp.zeros((8, nx_log), jnp.int32)),
        "sed_hxy": edges.get("sed_hxy", jnp.zeros((8, nx_log), f32_)),
        "ned_tz": edges.get("ned_tz",
                            jnp.zeros((nt, km, 8, nx_log), f32_)),
        "ned_wp": edges.get("ned_wp",
                            jnp.zeros((3, km, 8, nx_log), f32_)),
        "ned_kmt": edges.get("ned_kmt",
                             jnp.zeros((8, nx_log), jnp.int32)),
    }
    if nx != nx_log:
        pad = functools.partial(_lane_pad, ew=ew)
        (tx, ty, tz, wpack, abpack, kmt, hyx, hxy, tarea_r) = (
            pad(a) for a in (tx, ty, tz, wpack, abpack, kmt, hyx, hxy,
                             tarea_r))
        e = {k: pad(v) for k, v in e.items()}
    by = _pick_by(nt, km, ny, nx)
    if by is None:
        raise ValueError(f"no admissible y-tile for ny={ny}")
    ntiles = ny // by
    f32 = jnp.float32
    kmt = kmt.astype(jnp.int32)

    scratch = [
        pltpu.VMEM((nt, km, by, nx), f32),        # txb
        pltpu.VMEM((nt, km, by, nx), f32),        # tyb
        pltpu.VMEM((nt, km, by, nx), f32),        # tzb
        pltpu.VMEM((9, km, by, nx), f32),         # wpb
        pltpu.VMEM((8, km, by, nx), f32),         # abb
        pltpu.VMEM((nt, km, 8, nx), f32),         # tys
        pltpu.VMEM((nt, km, 8, nx), f32),         # tzs
        pltpu.VMEM((1, km, 8, nx), f32),          # wps_w (weff)
        pltpu.VMEM((2, km, 8, nx), f32),          # wps_n (wN0, wN1)
        pltpu.VMEM((nt, km, 8, nx), f32),         # tzn
        pltpu.VMEM((3, km, 8, nx), f32),          # wpn (weff, wS0, wS1)
        pltpu.VMEM((by, nx), jnp.int32),          # kmtb
        pltpu.VMEM((8, nx), jnp.int32),           # kmts
        pltpu.VMEM((8, nx), jnp.int32),           # kmtn
        pltpu.VMEM((by, nx), f32),                # hyxb
        pltpu.VMEM((by, nx), f32),                # hxyb
        pltpu.VMEM((8, nx), f32),                 # hxys_blk
        pltpu.VMEM((by, nx), f32),                # tareab
        pltpu.VMEM((nt, km, by, nx), f32),        # gtkb
        pltpu.SemaphoreType.DMA((19,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # dz, dzr
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 17,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nt, km, by, nx, ew, cancellation,
                          s_edge, n_edge),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, km, ny, nx), f32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024),
    )(dz, dzr,
      tx.astype(f32), ty.astype(f32), tz.astype(f32),
      wpack.astype(f32), abpack.astype(f32), kmt,
      hyx.astype(f32), hxy.astype(f32), tarea_r.astype(f32),
      e["sed_ty"].astype(f32), e["sed_tz"].astype(f32),
      e["sed_wp"].astype(f32), e["sed_kmt"].astype(jnp.int32),
      e["sed_hxy"].astype(f32),
      e["ned_tz"].astype(f32), e["ned_wp"].astype(f32),
      e["ned_kmt"].astype(jnp.int32))
    return out[..., :nx_log] if nx != nx_log else out


def _packs(cfg, grid, slx, sly, sf_slx, sf_sly, kisop, hor_diff,
           cancellation):
    """Tracer-independent weight packs (wpack, abpack) in jnp — one
    cheap fused pass; the kernel reuses them across tracers."""
    km = cfg.km
    f32 = jnp.float32
    dz = jnp.reshape(grid.vgrid.dz, (km, 1, 1)).astype(f32)
    zeros = jnp.zeros_like(kisop[0])

    if cancellation:
        wS0 = wS1 = wN0 = wN1 = vE0 = vE1 = vW0 = vW1 = zeros
        A_e = dz * kisop[1] * slx[0, 1]
        A_w = dz * kisop[1] * slx[1, 1]
        A_n = dz * kisop[1] * sly[0, 1]
        A_s = dz * kisop[1] * sly[1, 1]
        B_e = dz * kisop[0] * slx[0, 0]
        B_w = dz * kisop[0] * slx[1, 0]
        B_n = dz * kisop[0] * sly[0, 0]
        B_s = dz * kisop[0] * sly[1, 0]
    else:
        vE0 = kisop[0] * slx[0, 0] * dz - sf_slx[0, 0]
        vE1 = kisop[1] * slx[0, 1] * dz - sf_slx[0, 1]
        vW0 = kisop[0] * slx[1, 0] * dz - sf_slx[1, 0]
        vW1 = kisop[1] * slx[1, 1] * dz - sf_slx[1, 1]
        wN0 = kisop[0] * sly[0, 0] * dz - sf_sly[0, 0]
        wN1 = kisop[1] * sly[0, 1] * dz - sf_sly[0, 1]
        wS0 = kisop[0] * sly[1, 0] * dz - sf_sly[1, 0]
        wS1 = kisop[1] * sly[1, 1] * dz - sf_sly[1, 1]
        A_e = dz * kisop[1] * slx[0, 1] + sf_slx[0, 1]
        A_w = dz * kisop[1] * slx[1, 1] + sf_slx[1, 1]
        A_n = dz * kisop[1] * sly[0, 1] + sf_sly[0, 1]
        A_s = dz * kisop[1] * sly[1, 1] + sf_sly[1, 1]
        B_e = dz * kisop[0] * slx[0, 0] + sf_slx[0, 0]
        B_w = dz * kisop[0] * slx[1, 0] + sf_slx[1, 0]
        B_n = dz * kisop[0] * sly[0, 0] + sf_sly[0, 0]
        B_s = dz * kisop[0] * sly[1, 0] + sf_sly[1, 0]

    weff = kisop[0] + kisop[1] + hor_diff[0] + hor_diff[1]
    wpack = jnp.stack([weff, wS0, wS1, wN0, wN1, vE0, vE1, vW0, vW1])
    abpack = jnp.stack([A_e, A_w, A_n, A_s, B_e, B_w, B_n, B_s])
    return wpack.astype(f32), abpack.astype(f32)


def flux_assembly_tiles_wrapper(cfg, grid, bc, tx, ty, tz, slx, sly,
                                sf_slx, sf_sly, kisop, hor_diff,
                                cancellation):
    """Model-facing wrapper: build the weight packs, run the fused GTK
    kernel, compute VDC_GM in jnp (tracer-independent, one output
    plane), and re-patch the tripole top row from an 8-row jnp slab
    (the kernel treats the northern edge as closed)."""
    from pop2_tpu import gm as gm_mod
    f32 = jnp.float32
    km = cfg.km
    wpack, abpack = _packs(cfg, grid, slx, sly, sf_slx, sf_sly, kisop,
                           hor_diff, cancellation)
    hyx = (grid.HTE / grid.HUS).astype(f32)
    hxy = (grid.HTN / grid.HUW).astype(f32)
    dz = grid.vgrid.dz.astype(f32)

    from pop2_tpu.tracer_pallas import _mesh_y_only
    mesh = _mesh_y_only()
    if mesh == "none":
        gtk = flux_assembly_tiles(
            tx.astype(f32), ty.astype(f32), tz.astype(f32), wpack, abpack,
            grid.KMT, hyx, hxy, grid.TAREA_R.astype(f32),
            dz, (1.0 / dz).astype(f32),
            ew=cfg.ew_boundary, cancellation=cancellation,
            interpret=force_interpret)
    else:
        gtk = _flux_assembly_sharded(
            cfg, mesh, tx.astype(f32), ty.astype(f32), tz.astype(f32),
            wpack, abpack, grid.KMT, hyx, hxy,
            grid.TAREA_R.astype(f32), dz, (1.0 / dz).astype(f32),
            cancellation)

    # VDC_GM: tracer-independent, no north-edge dependence — plain jnp
    # (gm.flux_assembly_jnp's vdc block, source/hmix_gm.F90:1720-1750)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (km, 1, 1), 0) + 1
    km_mask = (kidx < grid.KMT[None]).astype(f32)
    hyxw = bc.w(hyx)
    hxys = bc.s(hxy)
    quad_x = hyx * slx[0, 1] ** 2 + hyxw * slx[1, 1] ** 2
    quad_y = hxy * sly[0, 1] ** 2 + hxys * sly[1, 1] ** 2
    quad_x_kp1 = hyx * slx[0, 0] ** 2 + hyxw * slx[1, 0] ** 2
    quad_y_kp1 = hxy * sly[0, 0] ** 2 + hxys * sly[1, 0] ** 2

    def ktp_kp1(kf):
        return jnp.concatenate([kf[0, 1:], jnp.zeros_like(kf[0, :1])],
                               axis=0)

    def dn(q):
        return jnp.concatenate([q[1:], jnp.zeros_like(q[:1])], axis=0)

    dz3 = jnp.reshape(dz, (km, 1, 1))
    dz_kp1 = jnp.concatenate([dz3[1:], dz3[-1:]], axis=0)
    dzw_k = jnp.reshape(grid.vgrid.dzw[1:km + 1], (km, 1, 1))
    kis_kp1 = ktp_kp1(kisop)
    vdc_gm = (dzw_k * km_mask * grid.TAREA_R
              * (dz3 * 0.25 * kisop[1] * (quad_x + quad_y)
                 + dz_kp1 * 0.25 * kis_kp1 * (dn(quad_x_kp1)
                                              + dn(quad_y_kp1))))
    vdc_gm = vdc_gm.at[-1].set(0.0)

    if cfg.ns_boundary == "tripole":
        # recompute the global top row from an 8-row full-width jnp slab
        # (the tripole fold stays inside the slab; kernel-vs-fold errors
        # cannot reach the last row from the slab's south edge)
        rows = 8
        sgrid = _slice_grid(cfg, grid, rows)
        cut = lambda a: a[..., -rows:, :]                  # noqa: E731
        gtk_top, _ = gm_mod.flux_assembly_jnp(
            cfg, sgrid, bc, cut(tx), cut(ty), cut(tz),
            cut(slx), cut(sly), cut(sf_slx), cut(sf_sly),
            cut(kisop), cut(kisop), cut(hor_diff), cancellation)
        gtk = gtk.at[..., -1:, :].set(gtk_top[..., -1:, :].astype(
            gtk.dtype))
    return gtk, vdc_gm


def _slice_grid(cfg, grid, rows):
    """Last ``rows`` full-width rows of every (..., ny, nx) grid leaf
    (clinic_pallas._slice_grid pattern)."""
    ny = cfg.ny

    def cut(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[-2] == ny:
            return leaf[..., -rows:, :]
        return leaf

    return jax.tree_util.tree_map(cut, grid)


def _flux_assembly_sharded(cfg, mesh, tx, ty, tz, wpack, abpack, kmt,
                           hyx, hxy, tarea_r, dz, dzr, cancellation):
    """shard_map front-end: each y shard exchanges 8-row edge blocks with
    its neighbors via ppermute, then runs the fused GTK kernel on its
    local block with the received rows as edge data. The global mesh
    edges receive ppermute zeros (== closed; kmt 0 reproduces the edge
    masking), and the tripole top row is re-patched by the wrapper
    outside this shard_map."""
    from jax.sharding import PartitionSpec as P
    py = mesh.shape["y"]

    def body(tx, ty, tz, wpack, abpack, kmt, hyx, hxy, tarea_r):
        up = [(i, i + 1) for i in range(py - 1)]      # send north
        dn = [(i + 1, i) for i in range(py - 1)]      # send south

        def from_south(x):
            return jax.lax.ppermute(x[..., -8:, :], "y", up)

        def from_north(x):
            return jax.lax.ppermute(x[..., :8, :], "y", dn)

        kmt32 = kmt.astype(jnp.int32)
        edges = {
            "sed_ty": from_south(ty), "sed_tz": from_south(tz),
            "sed_wp": from_south(jnp.concatenate(
                [wpack[0:1], wpack[np.int32(_WN0):np.int32(_WN0) + 2]])),
            "sed_kmt": from_south(kmt32), "sed_hxy": from_south(hxy),
            "ned_tz": from_north(tz), "ned_wp": from_north(wpack[0:3]),
            "ned_kmt": from_north(kmt32),
        }
        return flux_assembly_tiles(
            tx, ty, tz, wpack, abpack, kmt, hyx, hxy, tarea_r, dz, dzr,
            edges=edges, ew=cfg.ew_boundary, cancellation=cancellation,
            s_edge="data", n_edge="data", interpret=force_interpret)

    yx = ("y", "x")
    p2 = P(*yx)
    p3 = P(None, *yx)
    p4 = P(None, None, *yx)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(p4, p4, p4, p4, p4, p2, p2, p2, p2),
        out_specs=p4,
        check_vma=False,
    )(tx, ty, tz, wpack, abpack, kmt, hyx, hxy, tarea_r)
