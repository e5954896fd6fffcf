"""Fused Pallas TPU kernel for the momentum (clinic) hot path.

The reference's second-hottest loop is ``clinic`` (source/baroclinic.F90:1635
-> advu source/advection.F90:1127, hdiffu source/hmix_del2.F90:892, vdiffu
source/vertical_mix.F90:853, gradp source/pressure_grad.F90:185). The jnp
formulation materializes the four U-face flux fields, every shifted operand,
and the pressure cumsum to HBM.

This kernel performs the whole forcing assembly in ONE pass over HBM: for
each y-tile it DMAs the operands (with one-row halos) into VMEM, computes

    fx = -L(u) + f*(wc*v_cur + wo*v_old) - PKX + am*Lap(u,v) + D_v(u_old)
    fy = -L(v) - f*(wc*u_cur + wo*u_old) - PKY + am*Lap(v,-u) + D_v(v_old)

entirely on-chip (U-face flux velocities, the k-cumsum for w-from-continuity
at U points, the pressure-gradient vertical integral, the metric terms, wind
stress / quadratic bottom drag), writes the masked forcing once, and also
emits its thickness-weighted vertical averages ZX/ZY
(source/baroclinic.F90:1035-1057) so the driver never re-reads fx/fy for
them.

Scope (v1, mirroring tracer_pallas): del2 momentum mixing, no topostress,
1-D layer thickness (no partial bottom cells), closed north-south boundary,
float32. Everything else falls back to the jnp chain; equivalence is
asserted by tests/test_clinic_pallas.py against the jnp chain.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pop2_tpu import constants as const
from pop2_tpu.tracer_pallas import _lane_pad, _roll_e, _roll_w

if sys.getrecursionlimit() < 10000:
    sys.setrecursionlimit(10000)

#: None = auto (TPU + float32 + supported config); True/False forces.
USE_PALLAS = None
force_interpret = False

# 64 MiB of the chip's 128 MiB VMEM (see tracer_pallas._VMEM_BUDGET):
# the old 10 MiB budget silently rejected the production km=60 shape
_VMEM_BUDGET = 64 * 1024 * 1024

_I0, _I1 = np.int32(0), np.int32(1)

# index layout of the stacked 2-D grid-metric operand (static per grid)
_G2D = ("DYU", "DXU", "UAREA_R", "FCOR", "KXU", "KYU", "DXUR", "DYUR",
        "DUCM", "DUN", "DUS", "DUE", "DUW",
        "DMC", "DMN", "DMS", "DME", "DMW", "HUR")
_NG = len(_G2D)


def _kernel(km, by, nx, ew, with_hdiffu, s_edge, n_edge,
            dz_ref, dzr_ref, dz2r_ref, dzwr2_ref, facs_ref, par_ref,
            # HBM refs
            uc_hbm, vc_hbm, uo_hbm, vo_hbm, um_hbm, vm_hbm, ra_hbm,
            vvc_hbm, g2d_hbm, kmu_hbm, dhu_hbm, smf_hbm,
            sed3_hbm, sed2_hbm, ned3_hbm, ned2_hbm,
            fx_hbm, fy_hbm, zx_hbm, zy_hbm,
            # VMEM scratch
            ucb, vcb, uob, vob, umb, vmb, rab, vvcb,
            ucs, ucn, vcs, vcn, ums, umn, vms, vmn, ran,
            g2db, dyxs, dyxn, kmub, dhub, smfb,
            fxb, fyb, zxb, zyb, sems):
    ny = uc_hbm.shape[-2]
    t = pl.program_id(0)
    ntiles = pl.num_programs(0)
    # exact 8-aligned tiling, see tracer_pallas._kernel
    j0 = pl.multiple_of(t * by, 8)

    copies = []

    def dma(src, dst, slot):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
        c.start()
        copies.append(c)

    dma(uc_hbm.at[:, pl.ds(j0, by), :], ucb, 0)
    dma(vc_hbm.at[:, pl.ds(j0, by), :], vcb, 1)
    dma(uo_hbm.at[:, pl.ds(j0, by), :], uob, 2)
    dma(vo_hbm.at[:, pl.ds(j0, by), :], vob, 3)
    if with_hdiffu:  # umix/vmix feed only the del2 friction
        dma(um_hbm.at[:, pl.ds(j0, by), :], umb, 4)
        dma(vm_hbm.at[:, pl.ds(j0, by), :], vmb, 5)
    dma(ra_hbm.at[:, pl.ds(j0, by), :], rab, 6)
    dma(vvc_hbm.at[:, pl.ds(j0, by), :], vvcb, 7)
    dma(g2d_hbm.at[:, pl.ds(j0, by), :], g2db, 8)
    dma(kmu_hbm.at[pl.ds(j0, by), :], kmub, 9)
    dma(dhu_hbm.at[pl.ds(j0, by), :], dhub, 10)
    dma(smf_hbm.at[:, pl.ds(j0, by), :], smfb, 11)

    # halo rows as aligned 8-row blocks (Mosaic DMA alignment; see
    # tracer_pallas._kernel): south neighbor row j0-1 = LAST row of
    # [j0-8, j0); north neighbor row j0+by = FIRST row of [j0+by, +8)
    @pl.when(t > 0)
    def _():
        js = pl.multiple_of(j0 - 8, 8)
        halos = []
        pairs = [(uc_hbm, ucs, 12), (vc_hbm, vcs, 13)]
        if with_hdiffu:
            pairs += [(um_hbm, ums, 14), (vm_hbm, vms, 15)]
        for src, dst, slot in pairs:
            c = pltpu.make_async_copy(src.at[:, pl.ds(js, 8), :], dst,
                                      sems.at[np.int32(slot)])
            c.start()
            halos.append(c)
        c = pltpu.make_async_copy(g2d_hbm.at[pl.ds(_I0, 2),
                                             pl.ds(js, 8), :],
                                  dyxs, sems.at[np.int32(16)])
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
            pairs = [(sed3_hbm.at[_I0], ucs, 12), (sed3_hbm.at[_I1],
                                                   vcs, 13)]
            if with_hdiffu:
                pairs += [(sed3_hbm.at[np.int32(2)], ums, 14),
                          (sed3_hbm.at[np.int32(3)], vms, 15)]
            for src, dst, slot in pairs:
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                halos.append(c)
            c = pltpu.make_async_copy(sed2_hbm, dyxs, sems.at[np.int32(16)])
            c.start()
            halos.append(c)
            for c in halos:
                c.wait()
            if not with_hdiffu:
                ums[...] = jnp.zeros_like(ums[...])
                vms[...] = jnp.zeros_like(vms[...])
    else:
        @pl.when(t == 0)
        def _():  # closed southern edge: halo rows are zero / land
            ucs[...] = jnp.zeros_like(ucs[...])
            vcs[...] = jnp.zeros_like(vcs[...])
            ums[...] = jnp.zeros_like(ums[...])
            vms[...] = jnp.zeros_like(vms[...])
            dyxs[...] = jnp.zeros_like(dyxs[...])

    is_top = t == ntiles - 1

    @pl.when(t < ntiles - 1)
    def _():
        jn = pl.multiple_of(j0 + by, 8)
        halos = []
        pairs = [(uc_hbm, ucn, 17), (vc_hbm, vcn, 18), (ra_hbm, ran, 21)]
        if with_hdiffu:
            pairs += [(um_hbm, umn, 19), (vm_hbm, vmn, 20)]
        for src, dst, slot in pairs:
            c = pltpu.make_async_copy(src.at[:, pl.ds(jn, 8), :], dst,
                                      sems.at[np.int32(slot)])
            c.start()
            halos.append(c)
        c = pltpu.make_async_copy(g2d_hbm.at[pl.ds(_I0, 2),
                                             pl.ds(jn, 8), :],
                                  dyxn, sems.at[np.int32(22)])
        c.start()
        halos.append(c)
        for c in halos:
            c.wait()

    if n_edge == "data":
        # provided north-edge blocks (the global top shard gets ppermute
        # zeros; its top ROW is re-patched by the sharded wrapper, so
        # zero data there is inconsequential)
        @pl.when(is_top)
        def _():
            halos = []
            pairs = [(ned3_hbm.at[_I0], ucn, 17),
                     (ned3_hbm.at[_I1], vcn, 18),
                     (ned3_hbm.at[np.int32(2)], ran, 21)]
            if with_hdiffu:
                pairs += [(ned3_hbm.at[np.int32(3)], umn, 19),
                          (ned3_hbm.at[np.int32(4)], vmn, 20)]
            for src, dst, slot in pairs:
                c = pltpu.make_async_copy(src, dst, sems.at[np.int32(slot)])
                c.start()
                halos.append(c)
            c = pltpu.make_async_copy(ned2_hbm, dyxn, sems.at[np.int32(22)])
            c.start()
            halos.append(c)
            for c in halos:
                c.wait()
            if not with_hdiffu:
                umn[...] = jnp.zeros_like(umn[...])
                vmn[...] = jnp.zeros_like(vmn[...])
    else:
        @pl.when(is_top)
        def _():  # closed northern edge
            ucn[...] = jnp.zeros_like(ucn[...])
            vcn[...] = jnp.zeros_like(vcn[...])
            umn[...] = jnp.zeros_like(umn[...])
            vmn[...] = jnp.zeros_like(vmn[...])
            ran[...] = jnp.zeros_like(ran[...])
            dyxn[...] = jnp.zeros_like(dyxn[...])

    for c in copies:
        c.wait()

    # ---- halo-row extraction + row-shift helpers ---------------------------
    def row7(b):
        """Last row of an 8-row halo block as a (1, nx) value."""
        return pltpu.roll(b, np.int32(1), axis=b.ndim - 2)[..., 0:1, :]

    def row0(b):
        """First row of an 8-row halo block."""
        return b[..., 0:1, :]

    row2 = jax.lax.broadcasted_iota(jnp.int32, (by, nx), 0)

    def sh_n(x, north_row):
        g = pltpu.roll(x, np.int32(by - 1), axis=x.ndim - 2)
        return jnp.where(row2 == by - 1, north_row, g)

    def sh_s(x, south_row):
        g = pltpu.roll(x, np.int32(1), axis=x.ndim - 2)
        return jnp.where(row2 == 0, south_row, g)

    # 1 everywhere except the global top row (used to express n(s(x)) == x
    # away from the closed northern edge); explicit f32 so the weak Python
    # scalars cannot widen to f64 under jax_enable_x64 (Mosaic is 32-bit).
    # With provided north-edge data the identity holds on every row of
    # this shard (the global top shard's top row is wrapper-patched).
    if n_edge == "data":
        tm = jnp.float32(1.0)
    else:
        tm = jnp.where(is_top & (row2 == by - 1),
                       jnp.float32(0.0), jnp.float32(1.0))

    # ---- 2-D precomputation ------------------------------------------------
    dyu_c, dxu_c = g2db[_I0], g2db[_I1]
    dyu_s, dxu_s = row7(dyxs[_I0]), row7(dyxs[_I1])
    dyu_n, dxu_n = row0(dyxn[_I0]), row0(dyxn[_I1])
    uarear = g2db[np.int32(2)]
    fcor = g2db[np.int32(3)]
    kxu = g2db[np.int32(4)]
    kyu = g2db[np.int32(5)]
    dxur = g2db[np.int32(6)]
    dyur = g2db[np.int32(7)]
    ducm = g2db[np.int32(8)]
    dun = g2db[np.int32(9)]
    dus = g2db[np.int32(10)]
    due = g2db[np.int32(11)]
    duw = g2db[np.int32(12)]
    dmc = g2db[np.int32(13)]
    dmn = g2db[np.int32(14)]
    dms = g2db[np.int32(15)]
    dme = g2db[np.int32(16)]
    dmw = g2db[np.int32(17)]
    hur = g2db[np.int32(18)]
    kmu_c = kmub[...]
    dhu = dhub[...]
    am = par_ref[0]
    bdrag = par_ref[1]
    wcor_c = par_ref[2]
    wcor_o = par_ref[3]

    sfc_mask = kmu_c >= 1
    sfc_u = jnp.where(sfc_mask, smfb[_I0], 0.0)
    sfc_v = jnp.where(sfc_mask, smfb[_I1], 0.0)

    # ---- k loop: the whole forcing assembly fused --------------------------
    def level(k, carry):
        (wuk, wsum, rkx_p, rky_p, pkx, pky,
         vuf_p, vvf_p, zxa, zya) = carry
        kk = k + 1  # 1-based level
        kp1 = np.int32(min(k + 1, km - 1))
        dz = dz_ref[k]
        dzr = dzr_ref[k]
        dz2r = dz2r_ref[k]
        mask = kmu_c >= kk

        u = ucb[k]
        v = vcb[k]

        # U-face flux velocities (advection.F90:1245-1339)
        a = u * dyu_c * dz
        b = v * dxu_c * dz
        a_s = row7(ucs[k]) * dyu_s * dz
        b_s = row7(vcs[k]) * dxu_s * dz
        a_n = row0(ucn[k]) * dyu_n * dz
        b_n = row0(vcn[k]) * dxu_n * dz
        uuw = (0.25 * (a + _roll_w(a, ew))
               + 0.125 * (sh_s(a, a_s) + sh_s(_roll_w(a, ew),
                                              _roll_w(a_s, ew))
                          + sh_n(a, a_n) + sh_n(_roll_w(a, ew),
                                                _roll_w(a_n, ew))))
        uue = _roll_e(uuw, ew)
        vus = (0.25 * (b + sh_s(b, b_s))
               + 0.125 * (_roll_w(b, ew)
                          + sh_s(_roll_w(b, ew), _roll_w(b_s, ew))
                          + _roll_e(b, ew)
                          + sh_s(_roll_e(b, ew), _roll_e(b_s, ew))))
        # vun = n(vus): expand n() through vus' own south shifts; n(s(b))
        # equals b away from the closed top edge (tm masks that row)
        bn = sh_n(b, b_n)
        vun = (0.25 * (bn + b * tm)
               + 0.125 * (_roll_w(bn, ew) + _roll_w(b, ew) * tm
                          + _roll_e(bn, ew) + _roll_e(b, ew) * tm))

        cc = vun - vus + uue - uuw
        fc = cc * uarear
        wsum = wsum + fc
        wukb = wsum

        # momentum advection L(u), L(v) (advection.F90:1127-1491)
        u_n = sh_n(u, row0(ucn[k]))
        u_s = sh_s(u, row7(ucs[k]))
        v_n = sh_n(v, row0(vcn[k]))
        v_s = sh_s(v, row7(vcs[k]))
        luk = 0.5 * (cc * u + vun * u_n - vus * u_s
                     + uue * _roll_e(u, ew) - uuw * _roll_w(u, ew)) \
            * uarear * dzr
        lvk = 0.5 * (cc * v + vun * v_n - vus * v_s
                     + uue * _roll_e(v, ew) - uuw * _roll_w(v, ew)) \
            * uarear * dzr
        u_kp1 = ucb[kp1]
        v_kp1 = vcb[kp1]
        if k == 0:
            top_u = dzr * wuk * u
            top_v = dzr * wuk * v
        else:
            u_km1 = ucb[np.int32(k - 1)]
            v_km1 = vcb[np.int32(k - 1)]
            top_u = dz2r * wuk * (u_km1 + u)
            top_v = dz2r * wuk * (v_km1 + v)
        if k == km - 1:
            bot_u = jnp.zeros_like(u)
            bot_v = bot_u
        else:
            bot_u = dz2r * wukb * (u + u_kp1)
            bot_v = dz2r * wukb * (v + v_kp1)
        luk = luk + top_u - bot_u + u * v * kyu - v * v * kxu
        lvk = lvk + top_v - bot_v + u * v * kxu - u * u * kyu

        # Coriolis (baroclinic.F90:971-995)
        uo = uob[k]
        vo = vob[k]
        cor_x = fcor * (wcor_c * v + wcor_o * vo)
        cor_y = -fcor * (wcor_c * u + wcor_o * uo)

        # pressure gradient vertical integral (pressure_grad.F90:262-296);
        # rhoavg is pre-multiplied by the bouss factor
        f = rab[k]
        f_n = sh_n(f, row0(ran[k]))
        f_e = _roll_e(f, ew)
        f_ne = _roll_e(f_n, ew)
        rkx = jnp.where(mask, dxur * 0.5 * (f_ne - f - f_n + f_e), 0.0)
        rky = jnp.where(mask, dyur * 0.5 * (f_ne - f + f_n - f_e), 0.0)
        if k == 0:
            rkx_p, rky_p = rkx, rky
        fac = facs_ref[k]
        pkx = pkx + fac * (rkx + rkx_p)
        pky = pky + fac * (rky + rky_p)

        # del2 momentum diffusion with U/V metric mixing
        # (hmix_del2.F90:892-936); with_hdiffu=False leaves the
        # horizontal friction (e.g. anisotropic) to the jnp path outside
        if with_hdiffu:
            um = umb[k]
            vm = vmb[k]
            nu = sh_n(um, row0(umn[k]))
            nv = sh_n(vm, row0(vmn[k]))
            su = sh_s(um, row7(ums[k]))
            sv = sh_s(vm, row7(vms[k]))
            eu, wu = _roll_e(um, ew), _roll_w(um, ew)
            ev, wv = _roll_e(vm, ew), _roll_w(vm, ew)
            lap_u = ducm * um + dun * nu + dus * su + due * eu + duw * wu
            lap_v = ducm * vm + dun * nv + dus * sv + due * ev + duw * wv
            mix_u = dmc * um + dmn * nu + dms * su + dme * eu + dmw * wu
            mix_v = dmc * vm + dmn * nv + dms * sv + dme * ev + dmw * wv
            hduk = am * (lap_u + mix_v)
            hdvk = am * (lap_v - mix_u)
        else:
            hduk = jnp.float32(0.0)
            hdvk = jnp.float32(0.0)

        # explicit vertical friction: wind stress top BC, quadratic bottom
        # drag (vertical_mix.F90:853-1026)
        uo_kp1 = uob[kp1]
        vo_kp1 = vob[kp1]
        vvc = vvcb[k]
        dzwr2 = dzwr2_ref[k]
        vufb = vvc * (uo - uo_kp1) * dzwr2
        vvfb = vvc * (vo - vo_kp1) * dzwr2
        at_bot = kk == kmu_c
        vmag = bdrag * jnp.sqrt(uo * uo + vo * vo)
        vufb = jnp.where(at_bot, vmag * uo, vufb)
        vvfb = jnp.where(at_bot, vmag * vo, vvfb)
        vuf = sfc_u if k == 0 else vuf_p
        vvf = sfc_v if k == 0 else vvf_p
        du = (vuf - vufb) * dzr
        dv = (vvf - vvfb) * dzr

        fxk = jnp.where(mask, (((-luk + cor_x) - pkx) + hduk) + du, 0.0)
        fyk = jnp.where(mask, (((-lvk + cor_y) - pky) + hdvk) + dv, 0.0)
        fxb[k] = fxk
        fyb[k] = fyk
        zxa = zxa + fxk * dz
        zya = zya + fyk * dz
        return (wukb, wsum, rkx, rky, pkx, pky, vufb, vvfb, zxa, zya)

    zero2 = jnp.zeros((by, nx), jnp.float32)
    wuk0 = jnp.broadcast_to(dhu, (by, nx))
    carry = (wuk0, wuk0 + 0.0, zero2, zero2, zero2, zero2, zero2, zero2,
             zero2, zero2)
    # static unroll: every VMEM access has literal indices, which Mosaic
    # compiles far faster than the dynamic-index fori form
    for k in range(km):
        carry = level(np.int32(k), carry)
    zxb[...] = hur * carry[8]
    zyb[...] = hur * carry[9]

    outs = []
    for slot, (src, dst) in enumerate([
            (fxb, fx_hbm.at[:, pl.ds(j0, by), :]),
            (fyb, fy_hbm.at[:, pl.ds(j0, by), :]),
            (zxb, zx_hbm.at[pl.ds(j0, by), :]),
            (zyb, zy_hbm.at[pl.ds(j0, by), :])]):
        c = pltpu.make_async_copy(src, dst, sems.at[np.int32(23 + slot)])
        c.start()
        outs.append(c)
    for c in outs:
        c.wait()


def _pick_by(km, ny, nx):
    """Largest y-tile whose VMEM working set fits. Exact tiling only
    (ny % by == 0, by % 8 == 0, Mosaic DMA alignment); None if none."""
    for by in (16, 8):
        if ny % by:
            continue
        per_row = nx * 4
        b = (10 * km * by * per_row            # 8 center 3-D + fx/fy out
             + 72 * km * per_row               # 8-row 3-D halo blocks
             + (_NG + 30) * by * per_row)      # 2-D fields
        if b <= _VMEM_BUDGET:
            return by
    return None


@functools.partial(jax.jit,
                   static_argnames=("ew", "with_hdiffu", "s_edge",
                                    "n_edge", "interpret"))
def clinic_rhs_tiles(ucur, vcur, uold, vold, umix, vmixm, rhoavg, vvc,
                     g2d, kmu, dhu, smf,
                     dz, dzr, dz2r, dzwr2, facs, params,
                     sed3=None, sed2=None, ned3=None, ned2=None,
                     ew="cyclic", with_hdiffu=True,
                     s_edge="closed", n_edge="closed", interpret=False):
    """(fx, fy, zx, zy) in one HBM pass.

    Shapes: velocity/rhoavg/vvc (km,ny,nx); g2d (len(_G2D),ny,nx) stacked
    metric fields; kmu int32 (ny,nx); dhu (ny,nx); smf (2,ny,nx); profiles
    (km,); params (4,) = [am, bottom_drag, wcor_cur, wcor_old].

    Edge data (shard_map front-end): s_edge/n_edge 'data' makes the first/
    last tile read the provided 8-row blocks instead of closed zeros —
    sed3 (2|4, km, 8, nx) = stacked [ucur, vcur(, umix, vmix)] south
    neighbor rows, sed2 (2, 8, nx) = [DYU, DXU] south rows; ned3
    (3|5, km, 8, nx) = [ucur, vcur, rhoavg(, umix, vmix)], ned2 likewise.
    """
    km, ny, nx_log = ucur.shape
    nx = -(-nx_log // 128) * 128
    f32_ = jnp.float32
    n3 = (4 if with_hdiffu else 2)
    if sed3 is None:
        sed3 = jnp.zeros((n3, km, 8, nx_log), f32_)
        sed2 = jnp.zeros((2, 8, nx_log), f32_)
    if ned3 is None:
        ned3 = jnp.zeros((n3 + 1, km, 8, nx_log), f32_)
        ned2 = jnp.zeros((2, 8, nx_log), f32_)
    if nx != nx_log:
        # lane-pad to the 128 multiple Mosaic's HBM slicing requires
        # (gx1v7 nx=320 -> 384; see tracer_pallas._lane_pad); outputs are
        # sliced back below
        pad = functools.partial(_lane_pad, ew=ew)
        (ucur, vcur, uold, vold, umix, vmixm, rhoavg, vvc, g2d, kmu,
         dhu, smf, sed3, sed2, ned3, ned2) = (
            pad(a) for a in (ucur, vcur, uold, vold, umix, vmixm,
                             rhoavg, vvc, g2d, kmu, dhu, smf,
                             sed3, sed2, ned3, ned2))
    by = _pick_by(km, ny, nx)
    if by is None:
        raise ValueError(f"no admissible y-tile for ny={ny} (need a "
                         "divisor in (16, 8)); use the jnp chain")
    ntiles = ny // by
    f32 = jnp.float32
    kmu = kmu.astype(jnp.int32)

    scratch = (
        [pltpu.VMEM((km, by, nx), f32) for _ in range(8)]      # center 3-D
        + [pltpu.VMEM((km, 8, nx), f32) for _ in range(9)]     # halo blocks
        + [pltpu.VMEM((_NG, by, nx), f32),                     # g2db
           pltpu.VMEM((2, 8, nx), f32),                        # dyxs
           pltpu.VMEM((2, 8, nx), f32),                        # dyxn
           pltpu.VMEM((by, nx), jnp.int32),                    # kmub
           pltpu.VMEM((by, nx), f32),                          # dhub
           pltpu.VMEM((2, by, nx), f32),                       # smfb
           pltpu.VMEM((km, by, nx), f32),                      # fxb
           pltpu.VMEM((km, by, nx), f32),                      # fyb
           pltpu.VMEM((by, nx), f32),                          # zxb
           pltpu.VMEM((by, nx), f32),                          # zyb
           pltpu.SemaphoreType.DMA((27,))])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # dz, dzr, dz2r, dzwr2, facs, params
        grid=(ntiles,),
        # pin operands to HBM: under memory_space=ANY Mosaic may promote
        # small operands into VMEM, where the tile/halo DMA slices at
        # dynamic (and for halos, odd) sublane offsets fail its (8,128)
        # tiling-divisibility prover; HBM slices have no such constraint
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 16,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, km, by, nx, ew, with_hdiffu,
                          s_edge, n_edge),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((km, ny, nx), f32),
                   jax.ShapeDtypeStruct((km, ny, nx), f32),
                   jax.ShapeDtypeStruct((ny, nx), f32),
                   jax.ShapeDtypeStruct((ny, nx), f32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 4 * 1024 * 1024),
    )(dz, dzr, dz2r, dzwr2, facs, params,
      ucur.astype(f32), vcur.astype(f32), uold.astype(f32),
      vold.astype(f32), umix.astype(f32), vmixm.astype(f32),
      rhoavg.astype(f32), vvc.astype(f32), g2d, kmu,
      dhu.astype(f32), smf.astype(f32),
      sed3.astype(f32), sed2.astype(f32),
      ned3.astype(f32), ned2.astype(f32))
    if nx != nx_log:
        outs = [o[..., :nx_log] for o in outs]
    return outs


def _mesh_y_only():
    """The active dispatch mesh when it shards only the y axis (the
    kernel's lane dimension is whole per shard), else None; no mesh in
    scope returns the sentinel 'none' (tracer_pallas pattern)."""
    from pop2_tpu.tridiag_pallas import _DISPATCH_MESH
    mesh = _DISPATCH_MESH.get()
    if mesh is None:
        return "none"
    if mesh.shape.get("x", 1) == 1:
        return mesh
    return None


def available(cfg, grid) -> bool:
    """The fused path applies: del2 or anisotropic momentum mixing (the
    aniso friction is computed outside and added, with_hdiffu=False), no
    topostress, full cells, closed/cyclic-EW with closed or tripole NS
    (the tripole top row is re-patched from an 8-row jnp slab), float32,
    TPU. Under a y-sharded dispatch mesh the shard_map/ppermute halo
    front-end feeds the kernel per shard (x-sharded meshes fall back to
    the jnp chain, whose shifts lower to collective permutes)."""
    mesh = _mesh_y_only()
    if mesh is None:
        return False               # x-sharded mesh: jnp fallback
    ny_loc = cfg.ny if mesh == "none" else cfg.ny // mesh.shape["y"]
    ok = (cfg.hmix_momentum in ("del2", "aniso") and not cfg.ltopostress
          and grid.DZU is None
          and cfg.ns_boundary in ("closed", "tripole")
          and cfg.ew_boundary in ("cyclic", "closed")
          # exact 8-aligned y-tiling must exist (Mosaic DMA alignment);
          # VMEM sizing sees the lane-padded width (_lane_pad)
          and ny_loc % 8 == 0
          and _pick_by(cfg.km, ny_loc,
                       -(-cfg.nx // 128) * 128) is not None)
    if not ok:
        return False
    if USE_PALLAS is not None:
        return bool(USE_PALLAS)
    return (jnp.dtype(cfg.jnp_dtype) == jnp.float32
            and jax.default_backend() == "tpu")


def pack_g2d(cfg, grid):
    """Stack the static 2-D metric operands in _G2D order. DUCM is
    DUC + DUM (the combined center weight of hmix_del2.F90:892)."""
    f32 = jnp.float32
    fields = {name: getattr(grid, name) for name in _G2D
              if name not in ("DUCM",)}
    fields["DUCM"] = grid.DUC + grid.DUM
    return jnp.stack([fields[name].astype(f32) for name in _G2D])


def clinic_rhs(cfg, grid, state, umix, vmixm, rho_new, vvc, smf, dhu,
               leapfrog: bool):
    """Model-facing wrapper: assemble static operands, compute the
    pressure-averaged density (pre-scaled by the bouss factor), pick the
    Coriolis time weights, and call the fused kernel. Replaces the jnp
    momentum forcing assembly in baroclinic.driver
    (advu + coriolis + gradp + hdiffu + vdiffu + ZX/ZY;
    source/baroclinic.F90:935-1057)."""
    from pop2_tpu import pgrad
    f32 = jnp.float32
    km = cfg.km
    vg = grid.vgrid

    if cfg.lpressure_avg and leapfrog:
        rhoavg = 0.25 * (rho_new + 2.0 * state.rho_cur + state.rho_old)
    else:
        rhoavg = state.rho_cur
    bouss = pgrad.bouss_factor(cfg, vg.pressz)
    rhoavg = rhoavg * jnp.reshape(bouss, (km, 1, 1))

    if cfg.time.impcor and leapfrog:
        wc, wo = cfg.time.gamma, 1.0 - cfg.time.gamma
    elif leapfrog:
        wc, wo = 1.0, 0.0
    else:
        wc, wo = 0.0, 1.0

    dz = vg.dz.astype(f32)
    dz_kp1 = jnp.concatenate([dz[1:], dz[-1:]])
    facs = (vg.dzw[0:km] * (const.GRAV * 0.5)).astype(f32)
    params = jnp.array([cfg.auto_am, cfg.bottom_drag, wc, wo], f32)
    with_hdiffu = cfg.hmix_momentum == "del2"

    mesh = _mesh_y_only()
    tile_args = (state.u_cur, state.v_cur, state.u_old, state.v_old,
                 umix, vmixm, rhoavg, vvc, pack_g2d(cfg, grid), grid.KMU,
                 dhu, smf)
    prof = (dz, (1.0 / dz).astype(f32), (0.5 / dz).astype(f32),
            (1.0 / (0.5 * (dz + dz_kp1))).astype(f32), facs, params)
    if mesh == "none":
        fx, fy, zx, zy = clinic_rhs_tiles(
            *tile_args, *prof,
            ew=cfg.ew_boundary, with_hdiffu=with_hdiffu,
            interpret=force_interpret)
    else:
        fx, fy, zx, zy = _clinic_rhs_sharded(cfg, mesh, tile_args, prof,
                                             with_hdiffu)

    from pop2_tpu.grid import grid_bc, thickness_u
    bc = grid_bc(cfg)
    dzc = thickness_u(cfg, grid)

    if not with_hdiffu:
        # anisotropic (or other non-del2) friction computed in jnp and
        # folded into the forcing + its vertical average
        from pop2_tpu import hmix
        hdu, hdv = hmix.hdiffu(cfg, grid, bc, umix, vmixm)
        hdu = jnp.where(grid.kmask_u, hdu, 0.0).astype(fx.dtype)
        hdv = jnp.where(grid.kmask_u, hdv, 0.0).astype(fx.dtype)
        fx = fx + hdu
        fy = fy + hdv
        zx = zx + (grid.HUR * jnp.sum(hdu * dzc, axis=0)).astype(zx.dtype)
        zy = zy + (grid.HUR * jnp.sum(hdv * dzc, axis=0)).astype(zy.dtype)

    if cfg.ns_boundary == "tripole" or mesh != "none":
        # the kernel treats the northern edge as closed; only the global
        # top row reads the fold, so recompute it from an 8-row jnp slab
        # (full x width — the fold stays inside the slab; the slab's own
        # southern edge error cannot reach the last row's 2-row stencil).
        # The sharded path patches for 'closed' too: its uniform
        # n_edge='data' drops the closed-top-row mask (tm) that the
        # single-device kernel applies.
        fx, fy, zx, zy = _patch_top_rows(
            cfg, grid, state, umix, vmixm, rho_new, vvc, smf, dhu,
            leapfrog, fx, fy, zx, zy, dzc)
    return fx, fy, zx, zy


def _clinic_rhs_sharded(cfg, mesh, tile_args, prof, with_hdiffu):
    """shard_map front-end: each y shard exchanges 8-row edge blocks with
    its neighbors via ppermute (the collective rides the ICI ring), then
    runs the fused kernel on its local block with the received rows as
    edge data (tracer_pallas._tracer_tendency_sharded pattern)."""
    from jax.sharding import PartitionSpec as P
    py = mesh.shape["y"]

    def body(ucur, vcur, uold, vold, umix, vmixm, rhoavg, vvc, g2d,
             kmu, dhu, smf):
        up = [(i, i + 1) for i in range(py - 1)]      # send north
        dn = [(i + 1, i) for i in range(py - 1)]      # send south

        def from_south(x):
            return jax.lax.ppermute(x[..., -8:, :], "y", up)

        def from_north(x):
            return jax.lax.ppermute(x[..., :8, :], "y", dn)

        f32 = jnp.float32
        s3 = [ucur, vcur] + ([umix, vmixm] if with_hdiffu else [])
        n3 = [ucur, vcur, rhoavg] + ([umix, vmixm] if with_hdiffu else [])
        sed3 = from_south(jnp.stack([a.astype(f32) for a in s3]))
        ned3 = from_north(jnp.stack([a.astype(f32) for a in n3]))
        sed2 = from_south(g2d[:2])
        ned2 = from_north(g2d[:2])
        return tuple(clinic_rhs_tiles(
            ucur, vcur, uold, vold, umix, vmixm, rhoavg, vvc, g2d, kmu,
            dhu, smf, *prof, sed3=sed3, sed2=sed2, ned3=ned3, ned2=ned2,
            ew=cfg.ew_boundary, with_hdiffu=with_hdiffu,
            s_edge="data", n_edge="data", interpret=force_interpret))

    yx = ("y", "x")
    p2 = P(*yx)
    p3 = P(None, *yx)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(p3, p3, p3, p3, p3, p3, p3, p3, p3, p2, p2, p3),
        out_specs=(p3, p3, p2, p2),
        check_vma=False,
    )(*tile_args)


_SLAB = 8


def _slice_grid(cfg, grid):
    """The top _SLAB rows of every (ny, nx)-trailing grid leaf."""
    import jax
    ny, nx = cfg.ny, cfg.nx

    def cut(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 \
                and leaf.shape[-2:] == (ny, nx):
            return leaf[..., ny - _SLAB:, :]
        return leaf
    return jax.tree_util.tree_map(cut, grid)


def _patch_top_rows(cfg, grid, state, umix, vmixm, rho_new, vvc, smf,
                    dhu, leapfrog, fx, fy, zx, zy, dzc, rows=1):
    """Recompute the top ``rows`` rows of (fx, fy, zx, zy) with the jnp
    chain on a top slab whose bc carries the tripole fold."""
    from pop2_tpu import baroclinic
    from pop2_tpu.grid import grid_bc
    ny = cfg.ny
    sl = np.s_[..., ny - _SLAB:, :]
    sgrid = _slice_grid(cfg, grid)
    sbc = grid_bc(cfg)
    fx_s, fy_s = baroclinic.clinic_forcing_jnp(
        cfg, sgrid, sbc, state.u_cur[sl], state.v_cur[sl],
        state.u_old[sl], state.v_old[sl], umix[sl], vmixm[sl],
        state.rho_old[sl], state.rho_cur[sl], rho_new[sl], vvc[sl],
        smf[sl], dhu[ny - _SLAB:, :], leapfrog)
    fx = fx.at[:, ny - rows:, :].set(
        fx_s[:, _SLAB - rows:, :].astype(fx.dtype))
    fy = fy.at[:, ny - rows:, :].set(
        fy_s[:, _SLAB - rows:, :].astype(fy.dtype))
    # thickness_u is (km, 1, 1) for full cells, (km, ny, nx) under PBC
    dzc_r = dzc[:, ny - rows:, :] if dzc.shape[1] == ny else dzc
    zx = zx.at[ny - rows:, :].set(
        (grid.HUR[ny - rows:, :]
         * jnp.sum(fx[:, ny - rows:, :] * dzc_r, axis=0)).astype(zx.dtype))
    zy = zy.at[ny - rows:, :].set(
        (grid.HUR[ny - rows:, :]
         * jnp.sum(fy[:, ny - rows:, :] * dzc_r, axis=0)).astype(zy.dtype))
    return fx, fy, zx, zy
