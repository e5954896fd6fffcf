"""NumPy transliteration of the reference GM/Redi tracer mixing.

Routine-by-routine port of:
  - tracer_diffs_and_isopyc_slopes (source/hmix_gm_submeso_share.F90:149-434)
  - hdifft_gm                      (source/hmix_gm.F90:1102-2219)
for the constant-kappa, 'notanh' slope control, no-transition-layer,
use_const_ah_bkg_srfbl configuration (the oracle seam for
tests/test_gm_oracle.py). Follows the Fortran's level-by-level sweep with
the FZTOP carry and two-level ring buffers — deliberately NOT the
whole-column jnp formulation of pop2_tpu/gm.py, so agreement is evidence
of independent correctness.

Same conventions as oracle.py/okpp.py: ghosted (nyg, nxg) arrays from
OGrid, 1-based k indexing in comments, eoshift for neighbor access.
"""

import numpy as np

from tests.reference_oracle.ogrid import eoshift, pressure_bars
from tests.reference_oracle.okpp import state_mwjf_derivs

c0, c1, c2, c4, c10, p5, p25 = 0.0, 1.0, 2.0, 4.0, 10.0, 0.5, 0.25
eps = 1.0e-10
eps2 = 1.0e-20
mpercm = 0.01

ieast, iwest = 0, 1      # 0-based face indices (reference 1, 2)
jnorth, jsouth = 0, 1
ktp, kbt = 0, 1


def tracer_slopes(g, TMIX, full=False):
    """tracer_diffs_and_isopyc_slopes: returns (TX, TY, TZ, SLX, SLY)
    with TX/TY/TZ (nt, km, nyg, nxg) and SLX/SLY
    (2 faces, 2 halves, km, nyg, nxg); k index 0-based = level-1.
    full=True appends (RX, RY, RZ_SAVE) for the submesoscale oracle
    (RZ_SAVE = min(RZ, 0) at the ktp pass,
    hmix_gm_submeso_share.F90:398)."""
    nt, km = TMIX.shape[0], TMIX.shape[1]
    nyg, nxg = TMIX.shape[2], TMIX.shape[3]
    KMT = g.KMT

    TX = np.zeros((nt, km, nyg, nxg))
    TY = np.zeros((nt, km, nyg, nxg))
    TZ = np.zeros((nt, km, nyg, nxg))
    RX = np.zeros((2, km, nyg, nxg))
    RY = np.zeros((2, km, nyg, nxg))
    SLX = np.zeros((2, 2, km, nyg, nxg))
    SLY = np.zeros((2, 2, km, nyg, nxg))

    RZ_SAVE = np.zeros((km, nyg, nxg))
    TEMP = np.zeros((2, nyg, nxg))      # ring buffer (kn, ks)
    TXP = np.zeros((2, nyg, nxg))
    TYP = np.zeros((2, nyg, nxg))
    kn, ks = 0, 1

    for kk in range(1, km + 1):         # 1-based level
        KMASK = np.where(kk < KMT, c1, c0)

        if kk == 1:
            KMASKE = np.where((kk <= KMT) & (kk <= g.KMTE), c1, c0)
            KMASKN = np.where((kk <= KMT) & (kk <= g.KMTN), c1, c0)
            TEMP[kn] = np.maximum(-c2, TMIX[0, kk - 1])
            TXP[kn] = KMASKE * (eoshift(TEMP[kn], 1, 1) - TEMP[kn])
            TYP[kn] = KMASKN * (eoshift(TEMP[kn], 2, 1) - TEMP[kn])
            for n in range(nt):
                TX[n, kk - 1] = KMASKE * (eoshift(TMIX[n, kk - 1], 1, 1)
                                          - TMIX[n, kk - 1])
                TY[n, kk - 1] = KMASKN * (eoshift(TMIX[n, kk - 1], 2, 1)
                                          - TMIX[n, kk - 1])
            press = pressure_bars(g.zt1[kk - 1] * mpercm)
            _, DRDT, DRDS = state_mwjf_derivs(TMIX[0, kk - 1],
                                              TMIX[1, kk - 1], press)
            RX[ieast, kk - 1] = DRDT * TXP[kn] + DRDS * TX[1, kk - 1]
            RY[jnorth, kk - 1] = DRDT * TYP[kn] + DRDS * TY[1, kk - 1]
            RX[iwest, kk - 1] = (DRDT * eoshift(TXP[kn], 1, -1)
                                 + DRDS * eoshift(TX[1, kk - 1], 1, -1))
            RY[jsouth, kk - 1] = (DRDT * eoshift(TYP[kn], 2, -1)
                                  + DRDS * eoshift(TY[1, kk - 1], 2, -1))

        if kk < km:
            TEMP[ks] = np.maximum(-c2, TMIX[0, kk])
            TZ[0, kk] = TMIX[0, kk - 1] - TMIX[0, kk]
            TZ[1, kk] = TMIX[1, kk - 1] - TMIX[1, kk]
            for n in range(2, nt):
                TZ[n, kk] = TMIX[n, kk - 1] - TMIX[n, kk]
            TZP_ks = TEMP[kn] - TEMP[ks]

            press = pressure_bars(g.zt1[kk - 1] * mpercm)
            _, DRDT, DRDS = state_mwjf_derivs(TMIX[0, kk - 1],
                                              TMIX[1, kk - 1], press)
            RZ = DRDT * TZP_ks + DRDS * TZ[1, kk]
            RZ = np.minimum(RZ, -eps2)

            SLX[ieast, kbt, kk - 1] = KMASK * RX[ieast, kk - 1] / RZ
            SLX[iwest, kbt, kk - 1] = KMASK * RX[iwest, kk - 1] / RZ
            SLY[jnorth, kbt, kk - 1] = KMASK * RY[jnorth, kk - 1] / RZ
            SLY[jsouth, kbt, kk - 1] = KMASK * RY[jsouth, kk - 1] / RZ

            KMASKE = np.where((kk + 1 <= KMT) & (kk + 1 <= g.KMTE), c1, c0)
            KMASKN = np.where((kk + 1 <= KMT) & (kk + 1 <= g.KMTN), c1, c0)
            TXP[ks] = KMASKE * (eoshift(TEMP[ks], 1, 1) - TEMP[ks])
            TYP[ks] = KMASKN * (eoshift(TEMP[ks], 2, 1) - TEMP[ks])
            for n in range(nt):
                TX[n, kk] = KMASKE * (eoshift(TMIX[n, kk], 1, 1)
                                      - TMIX[n, kk])
                TY[n, kk] = KMASKN * (eoshift(TMIX[n, kk], 2, 1)
                                      - TMIX[n, kk])
            press1 = pressure_bars(g.zt1[kk] * mpercm)
            _, DRDT, DRDS = state_mwjf_derivs(TMIX[0, kk], TMIX[1, kk],
                                              press1)
            RX[ieast, kk] = DRDT * TXP[ks] + DRDS * TX[1, kk]
            RY[jnorth, kk] = DRDT * TYP[ks] + DRDS * TY[1, kk]
            RX[iwest, kk] = (DRDT * eoshift(TXP[ks], 1, -1)
                             + DRDS * eoshift(TX[1, kk], 1, -1))
            RY[jsouth, kk] = (DRDT * eoshift(TYP[ks], 2, -1)
                              + DRDS * eoshift(TY[1, kk], 2, -1))

            RZ = DRDT * TZP_ks + DRDS * TZ[1, kk]
            RZ_SAVE[kk] = np.minimum(RZ, c0)
            RZ = np.minimum(RZ, -eps2)
            w = kk + 1 <= KMT
            SLX[ieast, ktp, kk] = np.where(w, RX[ieast, kk] / RZ,
                                           SLX[ieast, ktp, kk])
            SLX[iwest, ktp, kk] = np.where(w, RX[iwest, kk] / RZ,
                                           SLX[iwest, ktp, kk])
            SLY[jnorth, ktp, kk] = np.where(w, RY[jnorth, kk] / RZ,
                                            SLY[jnorth, ktp, kk])
            SLY[jsouth, ktp, kk] = np.where(w, RY[jsouth, kk] / RZ,
                                            SLY[jsouth, ktp, kk])

        kn, ks = ks, kn

    if full:
        return TX, TY, TZ, SLX, SLY, RX, RY, RZ_SAVE
    return TX, TY, TZ, SLX, SLY


def hdifft_gm(g, TMIX, BL_DEPTH, ah, ah_bolus, ah_bkg_srfbl,
              slm_r=0.3, slm_b=0.3):
    """hdifft_gm for every level k = 1..km (const kappa, notanh,
    use_const_ah_bkg_srfbl, no transition layer, no bolus diagnostics).

    Returns (GTK (nt, km, nyg, nxg), VDC_GM (km, nyg, nxg)); GTK is valid
    in the physical region only (ghost rows carry partial stencils)."""
    nt, km = TMIX.shape[0], TMIX.shape[1]
    nyg, nxg = TMIX.shape[2], TMIX.shape[3]
    KMT = g.KMT
    dz, dzr = g.dz, g.dzr
    dzw = g.dzw                      # dzw(0:km), index k = interface below
    zt = g.zt1                       # zt(k), k 1-based -> zt[k-1]

    TX, TY, TZ, SLX, SLY = tracer_slopes(g, TMIX)

    HYX = g.HTE / g.HUS
    HXY = g.HTN / g.HUW
    HYXW = eoshift(HYX, 1, -1)
    HXYS = eoshift(HXY, 2, -1)

    # inverse Rossby radius (init_gm :887-894)
    RBR = np.abs(g.FCORT) / 200.0
    RBR = np.minimum(RBR, c1 / 1.5e6)
    RBR = np.maximum(RBR, 1.0e-7)

    diff_tapering = slm_r != slm_b
    cancellation_occurs = (ah == ah_bolus) and not diff_tapering

    # ---- k == 1 preparation (hdifft_gm :1196-1706) ----
    KAPPA_ISOP = np.full((2, km, nyg, nxg), ah)
    KAPPA_THIC = np.full((2, km, nyg, nxg), ah_bolus)
    HOR_DIFF = np.full((2, km, nyg, nxg), ah)
    HOR_DIFF[ktp, 0] = ah_bkg_srfbl

    for kk in range(1, km + 1):
        kp1 = min(kk + 1, km)
        ref_depth = [zt[kp1 - 1], g.zw1[kp1 - 1]]     # (ktp, kbt)
        if kk == km:
            ref_depth[ktp] = g.zw1[kp1 - 1]

        for kk_sub in (ktp, kbt):
            kid = kk + kk_sub - 1                      # 1-based interface
            SLA = dzw[kid] * np.sqrt(p5 * (
                (SLX[ieast, kk_sub, kk - 1] ** 2
                 + SLX[iwest, kk_sub, kk - 1] ** 2) / g.DXT ** 2
                + (SLY[jnorth, kk_sub, kk - 1] ** 2
                   + SLY[jsouth, kk_sub, kk - 1] ** 2) / g.DYT ** 2)) + eps

            dz_bottom = c0 if kk == 1 else zt[kk - 2]

            # TAPER1: notanh-family Rossby taper (:1459-1470)
            WORK1 = np.minimum(c1, zt[kk - 1] * RBR / SLA)
            TAPER1 = p5 + c2 * (WORK1 - p5) * (c1 - np.abs(WORK1 - p5))
            TAPER1 = np.where(dz_bottom <= BL_DEPTH, TAPER1, c1)

            # TAPER2/3: notanh slope control (:1503-1538)
            TAPER2 = np.ones((nyg, nxg))
            mid = (SLA > 0.2 * slm_r) & (SLA < 0.6 * slm_r)
            TAPER2 = np.where(
                mid, p5 * (c1 - (2.5 * SLA / slm_r - c1)
                           * (c4 - np.abs(c10 * SLA / slm_r - c4))),
                TAPER2)
            TAPER2 = np.where(SLA >= 0.6 * slm_r, c0, TAPER2)
            if diff_tapering:
                TAPER3 = np.ones((nyg, nxg))
                mid = (SLA > 0.2 * slm_b) & (SLA < 0.6 * slm_b)
                TAPER3 = np.where(
                    mid, p5 * (c1 - (2.5 * SLA / slm_b - c1)
                               * (c4 - np.abs(c10 * SLA / slm_b - c4))),
                    TAPER3)
                TAPER3 = np.where(SLA >= 0.6 * slm_b, c0, TAPER3)
            else:
                TAPER3 = TAPER2

            # HOR_DIFF (use_const_ah_bkg_srfbl, KAPPA_VERTICAL = 1,
            # :1614-1630)
            if not (kk == 1 and kk_sub == ktp):
                HOR_DIFF[kk_sub, kk - 1] = np.where(
                    dz_bottom <= BL_DEPTH,
                    ah_bkg_srfbl * (c1 - TAPER1 * TAPER2), c0)

            KAPPA_ISOP[kk_sub, kk - 1] = (TAPER1 * TAPER2
                                          * KAPPA_ISOP[kk_sub, kk - 1])
            KAPPA_THIC[kk_sub, kk - 1] = (TAPER1 * TAPER3
                                          * KAPPA_THIC[kk_sub, kk - 1])

        # bottom B.C. (:1652-1655)
        at_bot = kk == KMT
        KAPPA_ISOP[kbt, kk - 1] = np.where(at_bot, c0,
                                           KAPPA_ISOP[kbt, kk - 1])
        KAPPA_THIC[kbt, kk - 1] = np.where(at_bot, c0,
                                           KAPPA_THIC[kbt, kk - 1])

    # top B.C. (:1661-1662)
    KAPPA_ISOP[ktp, 0] = c0
    KAPPA_THIC[ktp, 0] = c0

    # merged streamfunction without the transition layer (:1678-1704)
    SF_SLX = np.zeros((2, 2, km, nyg, nxg))
    SF_SLY = np.zeros((2, 2, km, nyg, nxg))
    for kk in range(1, km + 1):
        w = kk <= KMT
        for kk_sub in (ktp, kbt):
            for f in (ieast, iwest):
                SF_SLX[f, kk_sub, kk - 1] = np.where(
                    w, KAPPA_THIC[kk_sub, kk - 1]
                    * SLX[f, kk_sub, kk - 1] * dz[kk - 1], c0)
            for f in (jnorth, jsouth):
                SF_SLY[f, kk_sub, kk - 1] = np.where(
                    w, KAPPA_THIC[kk_sub, kk - 1]
                    * SLY[f, kk_sub, kk - 1] * dz[kk - 1], c0)

    # ---- per-level flux assembly with the FZTOP carry (:1710-2078) ----
    GTK = np.zeros((nt, km, nyg, nxg))
    VDC_GM = np.zeros((km, nyg, nxg))
    FZTOP = np.zeros((nt, nyg, nxg))

    for k in range(1, km + 1):
        KMASK = np.where(k < KMT, c1, c0)

        if k < km:
            WORK1 = dzw[k] * KMASK * g.TAREA_R * (
                dz[k - 1] * p25 * KAPPA_ISOP[kbt, k - 1] * (
                    HYX * SLX[ieast, kbt, k - 1] ** 2
                    + HYXW * SLX[iwest, kbt, k - 1] ** 2
                    + HXY * SLY[jnorth, kbt, k - 1] ** 2
                    + HXYS * SLY[jsouth, kbt, k - 1] ** 2)
                + dz[k] * p25 * KAPPA_ISOP[ktp, k] * (
                    HYX * SLX[ieast, ktp, k] ** 2
                    + HYXW * SLX[iwest, ktp, k] ** 2
                    + HXY * SLY[jnorth, ktp, k] ** 2
                    + HXYS * SLY[jsouth, ktp, k] ** 2))
            VDC_GM[k - 1] = WORK1

        CX = np.where((k <= KMT) & (k <= g.KMTE), HYX * p25, c0)
        CY = np.where((k <= KMT) & (k <= g.KMTN), HXY * p25, c0)

        # combined isopycnal+horizontal diffusivities (:1769-1793)
        WK = (KAPPA_ISOP[ktp, k - 1] + HOR_DIFF[ktp, k - 1]
              + KAPPA_ISOP[kbt, k - 1] + HOR_DIFF[kbt, k - 1])
        WORK3 = WK + eoshift(WK, 1, 1)
        WORK4 = WK + eoshift(WK, 2, 1)

        kp1 = min(k + 1, km)
        if k < km:
            dz_bottom, factor = dz[kp1 - 1], c1
        else:
            dz_bottom, factor = c0, c0

        FX = np.zeros((nt, nyg, nxg))
        FY = np.zeros((nt, nyg, nxg))
        for n in range(nt):
            FX[n] = dz[k - 1] * CX * TX[n, k - 1] * WORK3
            FY[n] = dz[k - 1] * CY * TY[n, k - 1] * WORK4

        if not cancellation_occurs:
            W1 = (KAPPA_ISOP[ktp, k - 1] * SLX[ieast, ktp, k - 1]
                  * dz[k - 1] - SF_SLX[ieast, ktp, k - 1])
            W2 = (KAPPA_ISOP[kbt, k - 1] * SLX[ieast, kbt, k - 1]
                  * dz[k - 1] - SF_SLX[ieast, kbt, k - 1])
            W3 = eoshift(KAPPA_ISOP[ktp, k - 1] * SLX[iwest, ktp, k - 1]
                         * dz[k - 1] - SF_SLX[iwest, ktp, k - 1], 1, 1)
            W4 = eoshift(KAPPA_ISOP[kbt, k - 1] * SLX[iwest, kbt, k - 1]
                         * dz[k - 1] - SF_SLX[iwest, kbt, k - 1], 1, 1)
            for n in range(nt):
                FX[n] = FX[n] - CX * (
                    W1 * TZ[n, k - 1] + W2 * TZ[n, kp1 - 1]
                    + W3 * eoshift(TZ[n, k - 1], 1, 1)
                    + W4 * eoshift(TZ[n, kp1 - 1], 1, 1))
            W1 = (KAPPA_ISOP[ktp, k - 1] * SLY[jnorth, ktp, k - 1]
                  * dz[k - 1] - SF_SLY[jnorth, ktp, k - 1])
            W2 = (KAPPA_ISOP[kbt, k - 1] * SLY[jnorth, kbt, k - 1]
                  * dz[k - 1] - SF_SLY[jnorth, kbt, k - 1])
            W3 = eoshift(KAPPA_ISOP[ktp, k - 1] * SLY[jsouth, ktp, k - 1]
                         * dz[k - 1] - SF_SLY[jsouth, ktp, k - 1], 2, 1)
            W4 = eoshift(KAPPA_ISOP[kbt, k - 1] * SLY[jsouth, kbt, k - 1]
                         * dz[k - 1] - SF_SLY[jsouth, kbt, k - 1], 2, 1)
            for n in range(nt):
                FY[n] = FY[n] - CY * (
                    W1 * TZ[n, k - 1] + W2 * TZ[n, kp1 - 1]
                    + W3 * eoshift(TZ[n, k - 1], 2, 1)
                    + W4 * eoshift(TZ[n, kp1 - 1], 2, 1))

        for n in range(nt):
            if k < km:
                if not cancellation_occurs:
                    W = (dz[k - 1] * KAPPA_ISOP[kbt, k - 1] * (
                        SLX[ieast, kbt, k - 1] * HYX * TX[n, k - 1]
                        + SLY[jnorth, kbt, k - 1] * HXY * TY[n, k - 1]
                        + SLX[iwest, kbt, k - 1] * HYXW
                        * eoshift(TX[n, k - 1], 1, -1)
                        + SLY[jsouth, kbt, k - 1] * HXYS
                        * eoshift(TY[n, k - 1], 2, -1)))
                    W = W + (SF_SLX[ieast, kbt, k - 1] * HYX * TX[n, k - 1]
                             + SF_SLY[jnorth, kbt, k - 1] * HXY
                             * TY[n, k - 1]
                             + SF_SLX[iwest, kbt, k - 1] * HYXW
                             * eoshift(TX[n, k - 1], 1, -1)
                             + SF_SLY[jsouth, kbt, k - 1] * HXYS
                             * eoshift(TY[n, k - 1], 2, -1))
                    W = W + (dz_bottom * KAPPA_ISOP[ktp, kp1 - 1] * (
                        SLX[ieast, ktp, kp1 - 1] * HYX * TX[n, kp1 - 1]
                        + SLY[jnorth, ktp, kp1 - 1] * HXY * TY[n, kp1 - 1]
                        + SLX[iwest, ktp, kp1 - 1] * HYXW
                        * eoshift(TX[n, kp1 - 1], 1, -1)
                        + SLY[jsouth, ktp, kp1 - 1] * HXYS
                        * eoshift(TY[n, kp1 - 1], 2, -1)))
                    W = W + factor * (
                        SF_SLX[ieast, ktp, kp1 - 1] * HYX * TX[n, kp1 - 1]
                        + SF_SLY[jnorth, ktp, kp1 - 1] * HXY
                        * TY[n, kp1 - 1]
                        + SF_SLX[iwest, ktp, kp1 - 1] * HYXW
                        * eoshift(TX[n, kp1 - 1], 1, -1)
                        + SF_SLY[jsouth, ktp, kp1 - 1] * HXYS
                        * eoshift(TY[n, kp1 - 1], 2, -1))
                    fz = -KMASK * p25 * W
                else:
                    W = (dz[k - 1] * KAPPA_ISOP[kbt, k - 1] * (
                        SLX[ieast, kbt, k - 1] * HYX * TX[n, k - 1]
                        + SLY[jnorth, kbt, k - 1] * HXY * TY[n, k - 1]
                        + SLX[iwest, kbt, k - 1] * HYXW
                        * eoshift(TX[n, k - 1], 1, -1)
                        + SLY[jsouth, kbt, k - 1] * HXYS
                        * eoshift(TY[n, k - 1], 2, -1)))
                    W = W + (dz_bottom * KAPPA_ISOP[ktp, kp1 - 1] * (
                        SLX[ieast, ktp, kp1 - 1] * HYX * TX[n, kp1 - 1]
                        + SLY[jnorth, ktp, kp1 - 1] * HXY * TY[n, kp1 - 1]
                        + SLX[iwest, ktp, kp1 - 1] * HYXW
                        * eoshift(TX[n, kp1 - 1], 1, -1)
                        + SLY[jsouth, ktp, kp1 - 1] * HXYS
                        * eoshift(TY[n, kp1 - 1], 2, -1)))
                    fz = -KMASK * p5 * W
                GTK[n, k - 1] = ((FX[n] - eoshift(FX[n], 1, -1)
                                  + FY[n] - eoshift(FY[n], 2, -1)
                                  + FZTOP[n] - fz)
                                 * dzr[k - 1] * g.TAREA_R)
                FZTOP[n] = fz
            else:
                GTK[n, k - 1] = ((FX[n] - eoshift(FX[n], 1, -1)
                                  + FY[n] - eoshift(FY[n], 2, -1)
                                  + FZTOP[n]) * dzr[k - 1] * g.TAREA_R)
                FZTOP[n] = c0

    return GTK, VDC_GM
