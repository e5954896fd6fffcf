"""NumPy transliteration of the reference KPP boundary-layer-depth pipeline
(source/vmix_kpp.F90: wscale :3234-3342, bldepth :2002-2760, smooth_hblt
:3699-3877) plus the EOS expansion-coefficient branch it needs
(source/state_mod.F90:475-499) and the Jerlov shortwave absorption fraction
(source/sw_absorption.F90:736-811).

This is an INDEPENDENT implementation of the same math the framework's
``pop2_tpu.kpp`` computes in vectorized JAX form: the rolling three-slot
RI_BULK window, per-level kref surface-layer averaging, the quadratic
crossing interpolation, and the Ekman/Monin-Obukhov limit loops are written
the reference's way (level-by-level, stale-variable quirks included) so the
two sides share no code path. tests/test_kpp_oracle.py asserts value-level
agreement on the test grid, giving KPP the golden-value validation that the
dynamics already have (PARITY.md).

Scope: full cells (no partial bottom cells), lcvmix=.false. (native KPP,
not CVMix), lniw_mixing/linertial off — the configuration the framework's
bldepth mirrors.
"""

import numpy as np

from tests.reference_oracle import ogrid

eps = 1.0e-10
eps2 = 1.0e-20
vonkar = 0.4
zeta_m = -0.2
zeta_s = -1.0
c_m = 8.38
c_s = 98.96
a_m = 1.26
a_s = -28.86
epssfc = 0.1
Ricr = 0.3
cekman = 0.7
cmonob = 1.0
concv = 1.7
Vtc = np.sqrt(0.2 / c_s / epssfc) / vonkar ** 2  # vmix_kpp.F90:458

grav = ogrid.grav

jerlov_rfac = (0.58, 0.62, 0.67, 0.77, 0.78)
jerlov_depth1 = (0.35, 0.60, 1.00, 1.50, 1.40)
jerlov_depth2 = (23.0, 20.0, 17.0, 14.0, 7.90)
mpercm = 0.01


def state_mwjf_derivs(TEMPK, SALTK, pressz_kk):
    """rho, drho/dT, drho/dS of the MWJF EOS with range enforcement
    (state_mod.F90:393-398, :419-499)."""
    TQ = np.maximum(np.minimum(TEMPK, ogrid.TMAX), ogrid.TMIN)
    SQ = np.maximum(np.minimum(SALTK, ogrid.SMAX), ogrid.SMIN)
    p = 10.0 * pressz_kk
    SQ = 1000.0 * SQ
    SQR = np.sqrt(SQ)
    o = ogrid
    n0 = o.mwjfnp0s0t0 + p * (o.mwjfnp1s0t0 + p * o.mwjfnp2s0t0)
    n1 = o.mwjfnp0s0t1
    n2 = o.mwjfnp0s0t2 + p * (o.mwjfnp1s0t2 + p * o.mwjfnp2s0t2)
    n3 = o.mwjfnp0s0t3
    ns1t0 = o.mwjfnp0s1t0 + p * o.mwjfnp1s1t0
    ns1t1 = o.mwjfnp0s1t1
    ns2t0 = o.mwjfnp0s2t0
    WORK1 = (n0 + TQ * (n1 + TQ * (n2 + n3 * TQ))
             + SQ * (ns1t0 + ns1t1 * TQ + ns2t0 * SQ))
    d0 = o.mwjfdp0s0t0 + p * o.mwjfdp1s0t0
    d1 = o.mwjfdp0s0t1 + p ** 3 * o.mwjfdp3s0t1
    d2 = o.mwjfdp0s0t2
    d3 = o.mwjfdp0s0t3 + p ** 2 * o.mwjfdp2s0t3
    d4 = o.mwjfdp0s0t4
    ds1t0 = o.mwjfdp0s1t0
    ds1t1 = o.mwjfdp0s1t1
    ds1t3 = o.mwjfdp0s1t3
    dsqt0 = o.mwjfdp0sqt0
    dsqt2 = o.mwjfdp0sqt2
    WORK2 = (d0 + TQ * (d1 + TQ * (d2 + TQ * (d3 + d4 * TQ)))
             + SQ * (ds1t0 + TQ * (ds1t1 + TQ * TQ * ds1t3)
                     + SQR * (dsqt0 + TQ * TQ * dsqt2)))
    DENOMK = 1.0 / WORK2
    RHOFULL = WORK1 * DENOMK
    # dP_1/dT, dP_2/dT (state_mod.F90:475-487)
    W3 = n1 + TQ * (2.0 * n2 + 3.0 * n3 * TQ) + ns1t1 * SQ
    W4 = (d1 + SQ * ds1t1
          + TQ * (2.0 * (d2 + SQ * SQR * dsqt2)
                  + TQ * (3.0 * (d3 + SQ * ds1t3)
                          + TQ * 4.0 * d4)))
    DRHODT = (W3 - WORK1 * DENOMK * W4) * DENOMK
    # dP_1/dS, dP_2/dS (state_mod.F90:489-498)
    W3 = ns1t0 + ns1t1 * TQ + 2.0 * ns2t0 * SQ
    W4 = (ds1t0 + TQ * (ds1t1 + TQ * TQ * ds1t3)
          + 1.5 * SQR * (dsqt0 + TQ * TQ * dsqt2))
    DRHODS = (W3 - WORK1 * DENOMK * W4) * DENOMK * 1000.0
    return RHOFULL, DRHODT, DRHODS


def sw_absorb_frac(depth_cm, water_type):
    """Two-band Simpson & Paulson decay (sw_absorption.F90:736-811);
    depth_cm > 0."""
    d = -depth_cm * mpercm
    w = water_type - 1
    frac = np.where(
        d < -200.0, 0.0,
        jerlov_rfac[w] * np.exp(d / jerlov_depth1[w])
        + (1.0 - jerlov_rfac[w]) * np.exp(d / jerlov_depth2[w]))
    return frac


def wscale(SIGMA, HBL, USTAR, BFSFC, m_or_s):
    """vmix_kpp.F90:3234-3342. Returns (WM, WS); unwanted one is None."""
    ZETAH = SIGMA * HBL * vonkar * BFSFC
    ZETA = ZETAH / (USTAR ** 3 + eps)
    WM = WS = None
    if m_or_s in (1, 3):
        WM = np.where(
            ZETA >= 0.0, vonkar * USTAR / (1.0 + 5.0 * ZETA),
            np.where(ZETA >= zeta_m,
                     vonkar * USTAR * np.abs(1.0 - 16.0 * ZETA) ** 0.25,
                     vonkar * np.abs(a_m * USTAR ** 3
                                     - c_m * ZETAH) ** (1.0 / 3.0)))
    if m_or_s in (2, 3):
        WS = np.where(
            ZETA >= 0.0, vonkar * USTAR / (1.0 + 5.0 * ZETA),
            np.where(ZETA >= zeta_s,
                     vonkar * USTAR * np.sqrt(np.abs(1.0 - 16.0 * ZETA)),
                     vonkar * np.abs(a_s * USTAR ** 3
                                     - c_s * ZETAH) ** (1.0 / 3.0)))
    return WM, WS


def _shift(F, dj, di):
    """Value at (j+dj, i+di): cyclic in x, zeros shifted in from the
    closed north/south boundary (the test-grid topology)."""
    G = np.roll(F, -di, axis=-1)
    if dj > 0:
        G = np.concatenate([G[..., dj:, :], np.zeros_like(G[..., :dj, :])],
                           axis=-2)
    elif dj < 0:
        G = np.concatenate([np.zeros_like(G[..., dj:, :]), G[..., :dj, :]],
                           axis=-2)
    return G


def smooth_hblt(HBLT, KBL, KMT, zt, km):
    """vmix_kpp.F90:3699-3877 (overwrite_hblt=.true. branch) on the global
    cyclic-x/closed-y domain."""
    WORK1 = HBLT.copy()
    kmt_w = _shift(KMT, 0, -1)
    kmt_e = _shift(KMT, 0, +1)
    kmt_s = _shift(KMT, -1, 0)
    kmt_n = _shift(KMT, +1, 0)
    cw = np.where(kmt_w == 0, 0.0, 0.125)
    ce = np.where(kmt_e == 0, 0.0, 0.125)
    cs = np.where(kmt_s == 0, 0.0, 0.125)
    cn = np.where(kmt_n == 0, 0.0, 0.125)
    cc = 0.5 + (0.125 - cw) + (0.125 - ce) + (0.125 - cs) + (0.125 - cn)
    WORK2 = np.where(
        KMT != 0,
        cw * _shift(WORK1, 0, -1) + ce * _shift(WORK1, 0, +1)
        + cs * _shift(WORK1, -1, 0) + cn * _shift(WORK1, +1, 0)
        + cc * WORK1,
        WORK1)
    for k in range(1, km + 1):
        ztmp = zt[k - 1]
        WORK2 = np.where((KMT == k) & (WORK2 > ztmp), ztmp, WORK2)
    HBLT = np.maximum(WORK2, zt[0])
    KBL = KBL.copy()
    for k in range(1, km + 1):
        ztmp = zt[k - 1]
        zupper = -eps if k == 1 else zt[k - 2]  # -zgrid(0) = -eps
        upd = (KMT != 0) & (HBLT > zupper) & (HBLT <= ztmp)
        KBL = np.where(upd, max(k, 2), KBL)
    return HBLT, KBL


def bldepth(zt, zw, dz, KMT, FCORT, TRCR, UUU, VVV, STF, SHF_QSW, SMFT,
            pressz1, lshort_wave=True, lcheckekmo=True, water_type=3,
            DBLOC=None, DBSFC=None):
    """vmix_kpp.F90:2002-2760 for the native (lcvmix=.false.) path.

    zt/zw/dz: (km,) positive depths (cm) — zgrid(k) = -zt(k);
    TRCR: (nt, km, ny, nx); UUU/VVV: (km, ny, nx); DBLOC/DBSFC are taken
    as inputs (the seam is the bldepth boundary, matching the framework
    call signature). Returns HBLT, USTAR, BFSFC, STABLE, KBL.
    """
    km, ny, nx = UUU.shape
    bottom = zt[km - 1]

    USTAR = np.maximum(np.sqrt(np.sqrt(SMFT[0] ** 2 + SMFT[1] ** 2)), eps)

    W = np.where(TRCR[0, 0] < -2.0, -2.0, TRCR[0, 0])
    RHO1, TALPHA, SBETA = state_mwjf_derivs(W, TRCR[1, 0], pressz1)
    BO = np.where(RHO1 != 0.0,
                  grav * (-TALPHA * STF[0] - SBETA * STF[1])
                  / np.where(RHO1 != 0.0, RHO1, 1.0), 0.0)
    BOSOL = np.where(RHO1 != 0.0,
                     -grav * TALPHA * SHF_QSW
                     / np.where(RHO1 != 0.0, RHO1, 1.0), 0.0)

    # initialize to bottomed-out values (:2199-2238)
    KBL = np.where(KMT > 1, KMT, 1).astype(np.int64)
    HBLT = np.zeros((ny, nx))
    for kl in range(1, km + 1):
        ZKL = zt[kl - 1]
        HBLT = np.where(kl == KBL, ZKL, HBLT)

    kupper, kup, kdn = 0, 1, 2
    z_upper = 0.0
    z_up = -zt[0]  # zgrid(1)
    RI_BULK = np.zeros((3, ny, nx))

    if lcheckekmo:
        HEKMAN = np.full((ny, nx), bottom + eps)
        HLIMIT = np.full((ny, nx), bottom + eps)
        if lshort_wave:
            absorb = sw_absorb_frac(-z_up, water_type)
            BFSFC = BO + BOSOL * (1.0 - absorb)
        else:
            BFSFC = BO
        STABLE = np.where(BFSFC >= 0.0, 1.0, 0.0)
        BFSFC = BFSFC + STABLE * eps
        WORK = (STABLE * cmonob * USTAR ** 3 / vonkar / BFSFC
                + (STABLE - 1.0) * (-bottom))
        HMONOB = np.zeros((3, ny, nx))
        HMONOB[kup] = np.where(WORK <= -z_up, -z_up + eps, WORK)

    for kl in range(2, km + 1):
        # surface-layer reference velocities (:2322-2349)
        SURFTHICK = epssfc * zt[kl - 1]
        kref = kl
        for ktmp in range(1, kl + 1):
            if zw[ktmp - 1] >= SURFTHICK:
                kref = ktmp
                break
        if kref > 1:
            UREF = UUU[kref - 1] * (SURFTHICK - zw[kref - 2])
            VREF = VVV[kref - 1] * (SURFTHICK - zw[kref - 2])
            for ktmp in range(1, kref):
                UREF = UREF + dz[ktmp - 1] * UUU[ktmp - 1]
                VREF = VREF + dz[ktmp - 1] * VVV[ktmp - 1]
            UREF = UREF / SURFTHICK
            VREF = VREF / SURFTHICK
        else:
            UREF = UUU[0]
            VREF = VVV[0]

        WORK = (UREF - UUU[kl - 1]) ** 2 + (VREF - VVV[kl - 1]) ** 2
        ZKL = zt[kl - 1]

        # 4-point max onto T points (:2371-2378)
        VSHEAR = np.maximum(
            np.maximum(WORK, _shift(WORK, 0, -1)),
            np.maximum(_shift(WORK, -1, 0), _shift(WORK, -1, -1)))

        if lshort_wave:
            absorb = sw_absorb_frac(ZKL, water_type)
            BFSFC = BO + BOSOL * (1.0 - absorb)
        else:
            BFSFC = BO
        STABLE = np.where(BFSFC >= 0.0, 1.0, 0.0)
        BFSFC = BFSFC + STABLE * eps

        if lcheckekmo:
            HEKMAN = np.where(
                (STABLE > 0.5) & (HEKMAN >= bottom),
                np.maximum(ZKL, cekman * USTAR / (np.abs(FCORT) + eps)),
                HEKMAN)
            HMONOB[kdn] = (STABLE * cmonob * USTAR ** 3 / vonkar / BFSFC
                           + (STABLE - 1.0) * (-bottom))
            cond = (HMONOB[kdn] <= ZKL) & (HMONOB[kup] > -z_up)
            W2 = (HMONOB[kdn] - HMONOB[kup]) / (z_up + ZKL)
            HLIMIT = np.where(cond,
                              (HMONOB[kdn] - W2 * ZKL) / (1.0 - W2),
                              HLIMIT)

        _, WS = wscale(epssfc, ZKL, USTAR, BFSFC, 2)

        B_FRQNCY = np.sqrt(
            0.5 * (DBLOC[kl - 1] + np.abs(DBLOC[kl - 1]) + eps2)
            / (zt[kl] - zt[kl - 1] if kl < km else zw[km - 1] - zt[km - 1]))

        WM = (ZKL * WS * B_FRQNCY
              * ((Vtc / Ricr) * np.maximum(2.1 - 200.0 * B_FRQNCY, concv)))

        ZREF = -SURFTHICK / 2.0
        WORKN = np.where(KMT >= kl, (ZREF + ZKL) * DBSFC[kl - 1], 0.0)
        RI_BULK[kdn] = WORKN / (VSHEAR + WM + eps)

        # crossing search with quadratic interpolation (:2602-2638)
        found_here = (KBL == KMT) & (RI_BULK[kdn] > Ricr)
        slope_up = (RI_BULK[kupper] - RI_BULK[kup]) / (z_up - z_upper)
        a_co = (RI_BULK[kdn] - RI_BULK[kup]
                - slope_up * (ZKL + z_up)) / (z_up + ZKL) ** 2
        b_co = slope_up + 2.0 * a_co * z_up
        c_co = RI_BULK[kup] + z_up * (a_co * z_up + slope_up) - Ricr
        sqrt_arg = b_co ** 2 - 4.0 * a_co * c_co
        with np.errstate(divide="ignore", invalid="ignore"):
            lin = (-z_up + (z_up + ZKL)
                   * (Ricr - RI_BULK[kup])
                   / (RI_BULK[kdn] - RI_BULK[kup]))
            quad = (-b_co + np.sqrt(np.maximum(sqrt_arg, 0.0))) \
                / (2.0 * a_co)
        use_lin = (((np.abs(b_co) > eps)
                    & (np.abs(a_co) / np.abs(np.where(b_co == 0.0, eps,
                                                      b_co)) <= eps))
                   | (sqrt_arg <= 0.0))
        hnew = np.where(use_lin, lin, quad)
        HBLT = np.where(found_here, hnew, HBLT)
        KBL = np.where(found_here, kl, KBL)

        kupper, kup, kdn = kup, kdn, kupper
        z_upper = z_up
        z_up = -zt[kl - 1]

    if lcheckekmo:
        HLIMIT = np.where(HEKMAN < HLIMIT, HEKMAN, HLIMIT)
        ZKL_stale = zt[km - 1]  # loop-stale ZKL from the kl = km iteration
        for kl in range(2, km + 1):
            zkm1 = zt[kl - 2]
            upd = ((HLIMIT < HBLT) & (HLIMIT > zkm1)
                   & (HLIMIT <= ZKL_stale))
            KBL = np.where(upd, kl, KBL)
            HBLT = np.where(upd, HLIMIT, HBLT)

    HBLT, KBL = smooth_hblt(HBLT, KBL, KMT, zt, km)

    if lshort_wave:
        absorb = sw_absorb_frac(HBLT, water_type)
        BFSFC = BO + BOSOL * (1.0 - absorb)
    STABLE = np.where(BFSFC >= 0.0, 1.0, 0.0)
    BFSFC = BFSFC + STABLE * eps
    return HBLT, USTAR, BFSFC, STABLE, KBL
