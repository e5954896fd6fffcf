"""NumPy transliteration of the reference submesoscale mixed-layer-eddy
parameterization (Fox-Kemper et al.).

Routine-by-routine port of:
  - submeso_sf   (source/mix_submeso.F90:341-772)
  - submeso_flux (source/mix_submeso.F90:779-1008)
with RX/RY/RZ_SAVE from tracer_diffs_and_isopyc_slopes
(hmix_gm_submeso_share.F90:149-434, via ogm.tracer_slopes(full=True)).
Follows the Fortran's masked CONTINUE_INTEGRAL k-sweeps and the FZTOP
level carry — deliberately NOT the closed-form whole-column jnp
formulation of pop2_tpu/submeso.py, so agreement is evidence of
independent correctness.

Same conventions as ogm.py: ghosted (nyg, nxg) arrays from OGrid,
1-based k in comments, eoshift for neighbor access.
"""

import numpy as np

from tests.reference_oracle import ogm
from tests.reference_oracle.ogrid import eoshift

c0, c1, c2, p5, p25 = 0.0, 1.0, 2.0, 0.5, 0.25
ieast, iwest = 0, 1
jnorth, jsouth = 0, 1
ktp, kbt = 0, 1

grav = 980.6  # cm/s^2 (constants.F90)


def submeso_sf(g, TMIX, HMXL, efficiency_factor, time_scale_constant,
               hor_length_scale, max_hor_grid_scale,
               luse_const_horiz_len_scale=False):
    """submeso_sf: returns (SF_SUBM_X, SF_SUBM_Y, HLS) with SF shapes
    (2 faces, 2 halves, km, nyg, nxg)."""
    nt, km, nyg, nxg = TMIX.shape
    KMT = g.KMT

    _, _, _, _, _, RX, RY, RZ_SAVE = ogm.tracer_slopes(g, TMIX, full=True)

    TIME_SCALE = c1 / np.sqrt(g.FCORT ** 2 + c1 / time_scale_constant ** 2)

    ML_DEPTH = np.full((nyg, nxg), g.zw1[0])
    ML_DEPTH = np.where(KMT > 0, HMXL, ML_DEPTH)

    # vertical averages of horizontal buoyancy differences in the ML
    # (:435-485)
    BX_VERT_AVG = np.zeros((2, nyg, nxg))
    BY_VERT_AVG = np.zeros((2, nyg, nxg))
    CONTINUE_INTEGRAL = KMT > 0
    for k in range(1, km + 1):
        zw_top = c0 if k == 1 else g.zw1[k - 2]
        zwk = g.zw1[k - 1]
        WORK3 = np.where(CONTINUE_INTEGRAL & (ML_DEPTH > zwk),
                         g.dz[k - 1], c0)
        part = CONTINUE_INTEGRAL & (ML_DEPTH <= zwk) & (ML_DEPTH > zw_top)
        WORK3 = np.where(part, ML_DEPTH - zw_top, WORK3)
        for f in (0, 1):
            BX_VERT_AVG[f] = np.where(
                CONTINUE_INTEGRAL, BX_VERT_AVG[f] + RX[f, k - 1] * WORK3,
                BX_VERT_AVG[f])
            BY_VERT_AVG[f] = np.where(
                CONTINUE_INTEGRAL, BY_VERT_AVG[f] + RY[f, k - 1] * WORK3,
                BY_VERT_AVG[f])
        CONTINUE_INTEGRAL = CONTINUE_INTEGRAL & ~part

    ocean = KMT > 0
    for f in (0, 1):
        BX_VERT_AVG[f] = np.where(
            ocean, -grav * BX_VERT_AVG[f] / ML_DEPTH, BX_VERT_AVG[f])
        BY_VERT_AVG[f] = np.where(
            ocean, -grav * BY_VERT_AVG[f] / ML_DEPTH, BY_VERT_AVG[f])

    # horizontal length scale (:491-556)
    HLS = np.zeros((nyg, nxg))
    if luse_const_horiz_len_scale:
        HLS = np.where(ocean, hor_length_scale, HLS)
    else:
        WORK1 = np.where(ocean, np.sqrt(p5 * (
            (BX_VERT_AVG[0] ** 2 + BX_VERT_AVG[1] ** 2) / g.DXT ** 2
            + (BY_VERT_AVG[0] ** 2 + BY_VERT_AVG[1] ** 2) / g.DYT ** 2)),
            c0)
        WORK1 = np.where(ocean,
                         WORK1 * ML_DEPTH * TIME_SCALE ** 2, WORK1)

        CONTINUE_INTEGRAL = KMT > 0
        WORK2 = np.zeros((nyg, nxg))
        for k in range(2, km + 1):
            ztk, ztkm1 = g.zt1[k - 1], g.zt1[k - 2]
            WORK3 = np.where(CONTINUE_INTEGRAL & (ML_DEPTH > ztk),
                             g.dzw[k - 1], c0)
            part = (CONTINUE_INTEGRAL & (ML_DEPTH <= ztk)
                    & (ML_DEPTH >= ztkm1))
            WORK3 = np.where(
                part, (ML_DEPTH - ztkm1) ** 2 * g.dzwr[k - 1], WORK3)
            WORK2 = np.where(
                CONTINUE_INTEGRAL,
                WORK2 + np.sqrt(-RZ_SAVE[k - 1] * WORK3), WORK2)
            CONTINUE_INTEGRAL = CONTINUE_INTEGRAL & ~part

        WORK2w = np.sqrt(grav) * WORK2 * TIME_SCALE
        HLS = np.where(ocean,
                       np.maximum(np.maximum(WORK1, WORK2w),
                                  hor_length_scale), HLS)

    # streamfunction (:562-596)
    SF_X = np.zeros((2, 2, km, nyg, nxg))
    SF_Y = np.zeros((2, 2, km, nyg, nxg))
    cdx = np.minimum(g.DXT, max_hor_grid_scale)
    cdy = np.minimum(g.DYT, max_hor_grid_scale)
    for k in range(1, km + 1):
        ref_depth = [g.zt1[k - 1] - p25 * g.dz[k - 1],
                     g.zt1[k - 1] + p25 * g.dz[k - 1]]
        for kk in (ktp, kbt):
            act = (ref_depth[kk] < ML_DEPTH) & (KMT >= k)
            WORK3 = (c1 - (c2 * ref_depth[kk] / ML_DEPTH)) ** 2
            WORK2 = (c1 - WORK3) * (c1 + (5.0 / 21.0) * WORK3)
            WORK1 = (efficiency_factor * ML_DEPTH ** 2 * WORK2
                     * TIME_SCALE / np.where(HLS > 0, HLS, c1))
            for f in (0, 1):
                SF_X[f, kk, k - 1] = np.where(
                    act, WORK1 * BX_VERT_AVG[f] * cdx, SF_X[f, kk, k - 1])
                SF_Y[f, kk, k - 1] = np.where(
                    act, WORK1 * BY_VERT_AVG[f] * cdy, SF_Y[f, kk, k - 1])

    return SF_X, SF_Y, HLS


def submeso_flux_all(g, TMIX, SF_X, SF_Y):
    """submeso_flux for every level with the FZTOP_SUBM carry
    (:779-1008); returns GTK (nt, km, nyg, nxg)."""
    nt, km, nyg, nxg = TMIX.shape
    KMT = g.KMT
    TX, TY, TZ, _, _ = ogm.tracer_slopes(g, TMIX)
    HYX = g.HTE / g.HUS
    HXY = g.HTN / g.HUW

    GTK = np.zeros((nt, km, nyg, nxg))
    FZTOP = np.zeros((nt, nyg, nxg))
    for k in range(1, km + 1):
        CX = np.where((k <= KMT) & (k <= g.KMTE), HYX * p25, c0)
        CY = np.where((k <= KMT) & (k <= g.KMTN), HXY * p25, c0)
        KMASK = np.where(k < KMT, c1, c0)
        kp1 = k + 1 if k < km else k
        factor = c1 if k < km else c0

        for n in range(nt):
            FX = CX * (SF_X[ieast, ktp, k - 1] * TZ[n, k - 1]
                       + SF_X[ieast, kbt, k - 1] * TZ[n, kp1 - 1]
                       + eoshift(SF_X[iwest, ktp, k - 1], 1, 1)
                       * eoshift(TZ[n, k - 1], 1, 1)
                       + eoshift(SF_X[iwest, kbt, k - 1], 1, 1)
                       * eoshift(TZ[n, kp1 - 1], 1, 1))
            FY = CY * (SF_Y[jnorth, ktp, k - 1] * TZ[n, k - 1]
                       + SF_Y[jnorth, kbt, k - 1] * TZ[n, kp1 - 1]
                       + eoshift(SF_Y[jsouth, ktp, k - 1], 2, 1)
                       * eoshift(TZ[n, k - 1], 2, 1)
                       + eoshift(SF_Y[jsouth, kbt, k - 1], 2, 1)
                       * eoshift(TZ[n, kp1 - 1], 2, 1))

            if k < km:
                WORK1 = (SF_X[ieast, kbt, k - 1] * HYX * TX[n, k - 1]
                         + SF_Y[jnorth, kbt, k - 1] * HXY * TY[n, k - 1]
                         + SF_X[iwest, kbt, k - 1]
                         * eoshift(HYX, 1, -1) * eoshift(TX[n, k - 1], 1, -1)
                         + SF_Y[jsouth, kbt, k - 1]
                         * eoshift(HXY, 2, -1)
                         * eoshift(TY[n, k - 1], 2, -1))
                WORK2 = factor * (
                    SF_X[ieast, ktp, kp1 - 1] * HYX * TX[n, kp1 - 1]
                    + SF_Y[jnorth, ktp, kp1 - 1] * HXY * TY[n, kp1 - 1]
                    + SF_X[iwest, ktp, kp1 - 1]
                    * eoshift(HYX, 1, -1) * eoshift(TX[n, kp1 - 1], 1, -1)
                    + SF_Y[jsouth, ktp, kp1 - 1]
                    * eoshift(HXY, 2, -1) * eoshift(TY[n, kp1 - 1], 2, -1))
                fz = -KMASK * p25 * (WORK1 + WORK2)
                GTK[n, k - 1] = ((FX - eoshift(FX, 1, -1)
                                  + FY - eoshift(FY, 2, -1)
                                  + FZTOP[n] - fz)
                                 * g.dzr[k - 1] * g.TAREA_R)
                FZTOP[n] = fz
            else:
                GTK[n, k - 1] = ((FX - eoshift(FX, 1, -1)
                                  + FY - eoshift(FY, 2, -1)
                                  + FZTOP[n])
                                 * g.dzr[k - 1] * g.TAREA_R)
                FZTOP[n] = c0
    return GTK
