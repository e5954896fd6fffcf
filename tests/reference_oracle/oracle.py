"""POP2 reference dynamics on the `test` grid, transliterated to NumPy.

Configuration (matched subset of input_templates/test_pop2_in):
  sfc_layer=varthick, centered advection, del2 (lauto: am=ah=1e7*720/nx),
  Richardson vmix (implicit, aidif=1, convection_type='diffusion'),
  mwjf EOS (range enforce), lpressure_avg + lbouss_correct, impcor,
  reset_to_freezing, analytic zonal wind stress, zero heat/freshwater
  forcing, pcg solver w/ diagonal preconditioner, time_mix_opt='avg'.

Every routine cites the reference file:line it reproduces. Arrays are the
serial one-big-block equivalent: (ny+4, nx+4) with 2 ghost cells, EW
cyclic / NS closed halo semantics (see ogrid.halo_update).
"""

import dataclasses

import numpy as np

from tests.reference_oracle import ogrid as G
from tests.reference_oracle.ogrid import (
    NG, c0, c1, c2, c3, p5, p25, p125, eps, grav, eoshift, halo_update,
    state_mwjf, pressure_bars, levitus_profile, ppt_to_salt, mpercm)


@dataclasses.dataclass
class OracleConfig:
    nx: int = 192
    ny: int = 128
    km: int = 20
    nt: int = 2
    dtt: float = 3375.0          # auto_dt recipe: 3600*(180/nx) sec
    time_mix_freq: int = 17      # test_pop2_in time_manager_nml
    alpha: float = c1 / c3       # time_management.F90:437
    theta: float = p5            # :438
    impcor: bool = True
    # vmix_rich_nml (test_pop2_in)
    bckgrnd_vvc: float = 1.0
    bckgrnd_vdc: float = 0.1
    rich_mix: float = 50.0
    # vertical_mix_nml
    aidif: float = 1.0
    bottom_drag: float = 1.225e-3
    convect_diff: float = 1000.0
    convect_visc: float = 1000.0
    # solvers
    solv_tol: float = 1.0e-12
    solv_maxit: int = 1000
    solv_ncheck: int = 10
    reset_to_freezing: bool = True

    @property
    def gamma(self):
        return c1 - c2 * self.alpha   # time_management.F90:439

    @property
    def am(self):
        return 1.0e7 * (720.0 / float(self.nx))  # hmix_del2.F90:181

    @property
    def ah(self):
        return 1.0e7 * (720.0 / float(self.nx))  # hmix_del2.F90:418


class OracleModel:
    def __init__(self, cfg: OracleConfig = OracleConfig()):
        self.cfg = cfg
        g = G.OGrid(cfg.nx, cfg.ny, cfg.km)
        self.g = g
        km, nyg, nxg, nt = cfg.km, g.nyg, g.nxg, cfg.nt
        self.km, self.nt = km, nt

        # reference pressure per level (state_mod.F90:1041)
        self.pressz = np.array(
            [pressure_bars(g.zt1[k] * mpercm) for k in range(km)])
        # boussinesq correction (pressure_grad.F90:168-175)
        self.bouss = c1 / (1.02819 + 4.4004e-5 * self.pressz
                           - 2.93161e-4 * np.exp(-0.05 * self.pressz))

        self._init_del2()
        self._init_solver()
        self._init_checkerboard()

        # --- prognostic state (source/prognostic.F90:38-68), 3 slots ---
        z2 = lambda: np.zeros((3, nyg, nxg))
        z3 = lambda: np.zeros((3, km, nyg, nxg))
        self.UVEL, self.VVEL, self.RHO = z3(), z3(), z3()
        self.TRACER = np.zeros((3, nt, km, nyg, nxg))
        self.PSURF, self.GRADPX, self.GRADPY = z2(), z2(), z2()
        self.UBTROP, self.VBTROP = z2(), z2()
        self.PGUESS = np.zeros((nyg, nxg))
        self.FW = np.zeros((nyg, nxg))
        self.FW_OLD = np.zeros((nyg, nxg))
        self.oldtime, self.curtime, self.newtime = 0, 1, 2

        # --- init_ts 'internal' (initial.F90:1389-1428) ---
        tinit, sinit = levitus_profile(g.zt1)
        for k in range(km):
            m = (k + 1) <= g.KMT
            self.TRACER[1, 0, k][m] = tinit[k]
            self.TRACER[1, 1, k][m] = sinit[k] * ppt_to_salt
        self.TRACER[0] = self.TRACER[1]
        self.TRACER[2] = self.TRACER[1]
        for t in (0, 1):
            for k in range(km):
                self.RHO[t, k] = state_mwjf(self.TRACER[t, 0, k],
                                            self.TRACER[t, 1, k],
                                            self.pressz[k])

        # --- analytic wind stress (forcing_ws.F90:266-300, ANGLE=0) ---
        self.SMF = np.zeros((2, nyg, nxg))
        self.SMFT = np.zeros((2, nyg, nxg))
        self.SMF[0] = -np.cos(3.0 * g.ULAT)
        self.SMFT[0] = -np.cos(3.0 * g.TLAT)
        self.STF = np.zeros((nt, nyg, nxg))
        self.TFW = np.zeros((nt, nyg, nxg))

        self.nsteps_total = 0
        self.first_step = True

    # ------------------------------------------------------------------
    # del2 operator coefficients (hmix_del2.F90 init_del2u :97-410,
    # init_del2t :428-663), AMF=AHF=1 (lvariable_hmix=.false.)
    # ------------------------------------------------------------------
    def _init_del2(self):
        g = self.g
        one = np.ones_like(g.HTN)
        # tracer coefficients (init_del2t :607-627)
        W1 = (g.HTN / g.HUW) * p5 * (one + eoshift(one, 2, 1))
        self.DTN = W1 * g.TAREA_R
        self.DTS = eoshift(W1, 2, -1) * g.TAREA_R
        W1 = (g.HTE / g.HUS) * p5 * (one + eoshift(one, 1, 1))
        self.DTE = W1 * g.TAREA_R
        self.DTW = eoshift(W1, 1, -1) * g.TAREA_R

        # momentum coefficients (init_del2u :271-402)
        W1 = (g.HUS / g.HTE) * p5 * (one + eoshift(one, 2, -1))
        DUS = W1 * g.UAREA_R
        DUN = eoshift(W1, 2, 1) * g.UAREA_R
        W1 = (g.HUW / g.HTN) * p5 * (one + eoshift(one, 1, -1))
        DUW = W1 * g.UAREA_R
        DUE = eoshift(W1, 1, 1) * g.UAREA_R
        KXU = (eoshift(g.HUW, 1, 1) - g.HUW) * g.UAREA_R
        KYU = (eoshift(g.HUS, 2, 1) - g.HUS) * g.UAREA_R
        W1 = (g.HTE - eoshift(g.HTE, 1, -1)) * g.TAREA_R      # KXT
        W2 = p5 * (W1 + eoshift(W1, 2, 1)) * p5 * (eoshift(one, 1, -1) + one)
        DXKX = (eoshift(W2, 1, 1) - W2) * g.DXUR
        W2 = p5 * (W1 + eoshift(W1, 1, 1)) * p5 * (eoshift(one, 2, -1) + one)
        DYKX = (eoshift(W2, 2, 1) - W2) * g.DYUR
        W1 = (g.HTN - eoshift(g.HTN, 2, -1)) * g.TAREA_R      # KYT
        W2 = p5 * (W1 + eoshift(W1, 1, 1)) * p5 * (eoshift(one, 2, -1) + one)
        DYKY = (eoshift(W2, 2, 1) - W2) * g.DYUR
        W2 = p5 * (W1 + eoshift(W1, 2, 1)) * p5 * (eoshift(one, 1, -1) + one)
        DXKY = (eoshift(W2, 1, 1) - W2) * g.DXUR
        DUM = -(DXKX + DYKY + c2 * one * (KXU**2 + KYU**2))
        DMC = DXKY - DYKX
        W1 = ((eoshift(one, 2, 1) - eoshift(one, 2, -1)) /
              (g.HTE + eoshift(g.HTE, 2, 1)))
        DME = ((c2 * one * KYU + W1) /
               (g.HTN + eoshift(g.HTN, 1, 1)))
        W1 = ((eoshift(one, 1, 1) - eoshift(one, 1, -1)) /
              (g.HTN + eoshift(g.HTN, 1, 1)))
        DMN = -((c2 * one * KXU + W1) /
                (g.HTE + eoshift(g.HTE, 2, 1)))
        DUC = -(DUN + DUS + DUE + DUW)
        DMW = -DME
        DMS = -DMN
        (self.DUC, self.DUN, self.DUS, self.DUE, self.DUW, self.DMC,
         self.DMN, self.DMS, self.DME, self.DMW, self.DUM) = (
            DUC, DUN, DUS, DUE, DUW, DMC, DMN, DMS, DME, DMW, DUM)

    # ------------------------------------------------------------------
    # barotropic solver weights (POP_SolversMod.F90:747-906)
    # ------------------------------------------------------------------
    def _init_solver(self):
        g = self.g
        nyg, nxg = g.nyg, g.nxg
        HU, DXUR, DYUR, DXU, DYU = g.HU, g.DXUR, g.DYUR, g.DXU, g.DYU
        wNE = np.zeros((nyg, nxg))
        wE = np.zeros((nyg, nxg))
        wN = np.zeros((nyg, nxg))
        c0ind = np.zeros((nyg, nxg))
        # loop j=2..ny_block, i=2..nx_block (1-based) -> 0-based 1..end
        s = np.s_[1:, 1:]
        sw_ = np.s_[:-1, :-1]   # (i-1,j-1)
        se_ = np.s_[:-1, 1:]    # (i, j-1)
        nw_ = np.s_[1:, :-1]    # (i-1, j)
        xne = 0.25 * HU[s] * DXUR[s] * DYU[s]
        xse = 0.25 * HU[se_] * DXUR[se_] * DYU[se_]
        xnw = 0.25 * HU[nw_] * DXUR[nw_] * DYU[nw_]
        xsw = 0.25 * HU[sw_] * DXUR[sw_] * DYU[sw_]
        yne = 0.25 * HU[s] * DYUR[s] * DXU[s]
        yse = 0.25 * HU[se_] * DYUR[se_] * DXU[se_]
        ynw = 0.25 * HU[nw_] * DYUR[nw_] * DXU[nw_]
        ysw = 0.25 * HU[sw_] * DYUR[sw_] * DXU[sw_]
        wNE[s] = xne + yne
        ase = xse + yse
        anw = xnw + ynw
        asw = xsw + ysw
        wE[s] = xne + xse - yne - yse
        wN[s] = yne + ynw - xne - xnw
        c0ind[s] = -(wNE[s] + ase + anw + asw)
        self.wgtNE, self.wgtE, self.wgtN = wNE, wE, wN
        self.centerWgtIndep = c0ind
        self.wgtCenter = c0ind.copy()
        # residualNorm & scaled criterion (:895-906)
        P = g.P
        self.residualNorm = c1 / np.sum((g.TAREA[P]**2) * g.RCALCT[P])
        self.solv_criterion = (self.cfg.solv_tol**2 / self.residualNorm)

    def _init_checkerboard(self):
        """null-space removal setup (barotropic.F90:150-212)."""
        g = self.g
        IG = np.broadcast_to(g.ig[None, :], (g.nyg, g.nxg))
        JG = np.broadcast_to(g.jg[:, None], (g.nyg, g.nxg))
        n = IG + np.abs(JG)
        CHECKER = (2 * np.mod(n, 2) - 1).astype(np.float64)
        CONSTNT = np.where(g.KMT > 0, c1, c0)
        CHECKER = np.where(g.KMT > 0, CHECKER, c0)
        P = g.P
        sum_check = np.sum(CHECKER[P])
        sum_const = np.sum(CONSTNT[P])
        acheck = (np.sum(CHECKER[P] * g.TAREA[P]) /
                  np.sum(CONSTNT[P] * g.TAREA[P]))
        self.rcheck = acheck / (sum_const - acheck * sum_check)
        self.rconst = c1 / (sum_const - acheck * sum_check)
        self.CHECKER, self.CONSTNT = CHECKER, CONSTNT

    # ------------------------------------------------------------------
    # spatial operators (source/operators.F90:49-247)
    # ------------------------------------------------------------------
    def div(self, k1, UX, UY):
        """T-cell area * divergence; loop j=2..ny_block (0-based 1..)."""
        g = self.g
        out = np.zeros_like(UX)
        s = np.s_[1:, 1:]
        # (i,j) gathers: +UX(i,j) +UX(i,j-1) -UX(i-1,j) -UX(i-1,j-1)
        #                +UY(i,j) +UY(i-1,j) -UY(i,j-1) -UY(i-1,j-1)
        out[s] = p5 * (UX[1:, 1:] * g.DYU[1:, 1:] +
                       UX[:-1, 1:] * g.DYU[:-1, 1:] -
                       UX[1:, :-1] * g.DYU[1:, :-1] -
                       UX[:-1, :-1] * g.DYU[:-1, :-1] +
                       UY[1:, 1:] * g.DXU[1:, 1:] +
                       UY[1:, :-1] * g.DXU[1:, :-1] -
                       UY[:-1, 1:] * g.DXU[:-1, 1:] -
                       UY[:-1, :-1] * g.DXU[:-1, :-1])
        out[s] = np.where(k1 <= g.KMT[s], out[s], c0)
        return out

    def grad(self, k1, F):
        """gradient at U pts; loop j=1..ny_block-1 (operators.F90:173-181)."""
        g = self.g
        GX = np.zeros_like(F)
        GY = np.zeros_like(F)
        s = np.s_[:-1, :-1]
        GX[s] = g.DXUR[s] * p5 * (F[1:, 1:] - F[:-1, :-1] -
                                  F[1:, :-1] + F[:-1, 1:])
        GY[s] = g.DYUR[s] * p5 * (F[1:, 1:] - F[:-1, :-1] +
                                  F[1:, :-1] - F[:-1, 1:])
        GX[s] = np.where(k1 <= g.KMU[s], GX[s], c0)
        GY[s] = np.where(k1 <= g.KMU[s], GY[s], c0)
        return GX, GY

    # ------------------------------------------------------------------
    # surface height change (source/surface_hgt.F90:131-290)
    # ------------------------------------------------------------------
    def dhdt(self):
        g = self.g
        DH = ((self.PSURF[self.curtime] - self.PSURF[self.oldtime]) /
              (grav * self.dtp) - self.FW_OLD)
        DHU = g.tgrid_to_ugrid(DH)
        DHU = np.where(g.CALCU, DHU, c0)
        return DH, DHU

    # ------------------------------------------------------------------
    # Richardson vmix coefficients (source/vmix_rich.F90:179-410),
    # implicit + convection_type='diffusion'
    # ------------------------------------------------------------------
    def vmix_coeffs_rich(self, TMIX, UMIX, VMIX, RHOMIX):
        cfg, g, km = self.cfg, self.g, self.km
        VDC = np.zeros((km,) + g.KMT.shape)
        VVC = np.zeros((km,) + g.KMT.shape)
        UTK = VTK = None
        for k1 in range(1, km + 1):
            kp1 = min(k1 + 1, km)
            if k1 == 1:
                UTK = g.ugrid_to_tgrid(UMIX[0])
                VTK = g.ugrid_to_tgrid(VMIX[0])
            UTKP = g.ugrid_to_tgrid(UMIX[kp1 - 1])
            VTKP = g.ugrid_to_tgrid(VMIX[kp1 - 1])
            RHOK = state_mwjf(TMIX[0, k1 - 1], TMIX[1, k1 - 1],
                              self.pressz[kp1 - 1])
            critnu = cfg.convect_diff
            below = k1 < g.KMT
            RICH = np.where(
                below,
                -grav * g.dzw[k1] * (RHOK - RHOMIX[kp1 - 1]) /
                ((UTK - UTKP)**2 + (VTK - VTKP)**2 + eps), c0)
            VDC[k1 - 1] = np.where(
                below,
                np.minimum(critnu, cfg.bckgrnd_vdc + (cfg.bckgrnd_vvc +
                           cfg.rich_mix / (c1 + 5.0 * RICH)**2) /
                           (c1 + 5.0 * RICH)), c0)
            VDC[k1 - 1] = np.where(RICH < c0, critnu, VDC[k1 - 1])
            RICHU = g.tgrid_to_ugrid(RICH)
            critnu = cfg.convect_visc
            belowu = k1 < g.KMU
            VVC[k1 - 1] = np.where(
                belowu,
                np.minimum(critnu, cfg.bckgrnd_vvc +
                           cfg.rich_mix / (c1 + 5.0 * RICHU)**2), c0)
            RICHU = np.where(belowu, RICHU, c0)
            VVC[k1 - 1] = np.where(RICHU < c0, critnu, VVC[k1 - 1])
            UTK, VTK = UTKP, VTKP
        return VDC, VVC

    # ------------------------------------------------------------------
    # explicit vertical diffusion (vertical_mix.F90 vdifft :691-850,
    # vdiffu :853-1040)
    # ------------------------------------------------------------------
    def vdifft(self, k1, TOLD, VDC, VTF):
        g = self.g
        kp1 = min(k1 + 1, self.km)
        out = np.zeros((self.nt,) + g.KMT.shape)
        for n in range(self.nt):
            if k1 == 1:
                VTF[n] = np.where(g.KMT >= 1, self.STF[n], c0)
            VTFB = np.where(g.KMT > k1,
                            VDC[k1 - 1] * (TOLD[n, k1 - 1] - TOLD[n, kp1 - 1])
                            * g.dzwr[k1], c0)
            out[n] = np.where(k1 <= g.KMT,
                              (VTF[n] - VTFB) * g.dzr[k1 - 1], c0)
            VTF[n] = VTFB
        return out

    def vdiffu(self, k1, UOLD, VOLD, VVC, VUF, VVF):
        g, cfg = self.g, self.cfg
        kp1 = min(k1 + 1, self.km)
        if k1 == 1:
            VUF[...] = np.where(g.KMU >= 1, self.SMF[0], c0)
            VVF[...] = np.where(g.KMU >= 1, self.SMF[1], c0)
        VUFB = VVC[k1 - 1] * (UOLD[k1 - 1] - UOLD[kp1 - 1]) * g.dzwr[k1]
        VVFB = VVC[k1 - 1] * (VOLD[k1 - 1] - VOLD[kp1 - 1]) * g.dzwr[k1]
        # bottom drag, physical domain only (vertical_mix.F90:990-999)
        P = g.P
        botm = (g.KMU[P] == k1)
        vmag = cfg.bottom_drag * np.sqrt(UOLD[k1 - 1][P]**2 +
                                         VOLD[k1 - 1][P]**2)
        VUFB[P] = np.where(botm, vmag * UOLD[k1 - 1][P], VUFB[P])
        VVFB[P] = np.where(botm, vmag * VOLD[k1 - 1][P], VVFB[P])
        VDUK = np.where(k1 <= g.KMU, (VUF - VUFB) * g.dzr[k1 - 1], c0)
        VDVK = np.where(k1 <= g.KMU, (VVF - VVFB) * g.dzr[k1 - 1], c0)
        VUF[...] = VUFB
        VVF[...] = VVFB
        return VDUK, VDVK

    # ------------------------------------------------------------------
    # del2 horizontal mixing (hmix_del2.F90 hdifft_del2 :970-1120,
    # hdiffu_del2 :670-960)
    # ------------------------------------------------------------------
    def hdifft_del2(self, k1, TMIX):
        g = self.g
        CN = np.where((k1 <= g.KMTN) & (k1 <= g.KMT), self.DTN, c0)
        CS = np.where((k1 <= g.KMTS) & (k1 <= g.KMT), self.DTS, c0)
        CE = np.where((k1 <= g.KMTE) & (k1 <= g.KMT), self.DTE, c0)
        CW = np.where((k1 <= g.KMTW) & (k1 <= g.KMT), self.DTW, c0)
        CC = -(CN + CS + CE + CW)
        out = np.zeros((self.nt,) + g.KMT.shape)
        P = g.P
        jP, iP = np.s_[NG:NG + self.cfg.ny], np.s_[NG:NG + self.cfg.nx]
        jN, jS = np.s_[NG + 1:NG + self.cfg.ny + 1], np.s_[NG - 1:NG + self.cfg.ny - 1]
        iE, iW = np.s_[NG + 1:NG + self.cfg.nx + 1], np.s_[NG - 1:NG + self.cfg.nx - 1]
        for n in range(self.nt):
            T = TMIX[n, k1 - 1]
            out[n][P] = self.cfg.ah * (
                CC[P] * T[jP, iP] + CN[P] * T[jN, iP] + CS[P] * T[jS, iP] +
                CE[P] * T[jP, iE] + CW[P] * T[jP, iW])
        return out

    def hdiffu_del2(self, k1, UMIXK, VMIXK):
        g = self.g
        cc = self.DUC + self.DUM
        out_u = np.zeros_like(UMIXK)
        out_v = np.zeros_like(UMIXK)
        P = g.P
        ny, nx = self.cfg.ny, self.cfg.nx
        jP, iP = np.s_[NG:NG + ny], np.s_[NG:NG + nx]
        jN, jS = np.s_[NG + 1:NG + ny + 1], np.s_[NG - 1:NG + ny - 1]
        iE, iW = np.s_[NG + 1:NG + nx + 1], np.s_[NG - 1:NG + nx - 1]

        def five(C0, CN_, CS_, CE_, CW_, F):
            return (C0[P] * F[jP, iP] + CN_[P] * F[jN, iP] +
                    CS_[P] * F[jS, iP] + CE_[P] * F[jP, iE] +
                    CW_[P] * F[jP, iW])

        out_u[P] = self.cfg.am * (
            five(cc, self.DUN, self.DUS, self.DUE, self.DUW, UMIXK) +
            five(self.DMC, self.DMN, self.DMS, self.DME, self.DMW, VMIXK))
        out_v[P] = self.cfg.am * (
            five(cc, self.DUN, self.DUS, self.DUE, self.DUW, VMIXK) -
            five(self.DMC, self.DMN, self.DMS, self.DME, self.DMW, UMIXK))
        out_u = np.where(k1 > g.KMU, c0, out_u)
        out_v = np.where(k1 > g.KMU, c0, out_v)
        return out_u, out_v

    # ------------------------------------------------------------------
    # advection (source/advection.F90)
    # ------------------------------------------------------------------
    def comp_flux_vel(self, k1, UUU, VVV, WTK):
        """advection.F90:1970-2130 (no pbc, no lw_lim)."""
        g = self.g
        ny, nx = self.cfg.ny, self.cfg.nx
        UTE = np.zeros_like(WTK)
        UTW = np.zeros_like(WTK)
        VTN = np.zeros_like(WTK)
        VTS = np.zeros_like(WTK)
        if k1 > self.km:
            return UTE, UTW, VTN, VTS, np.zeros_like(WTK)
        U = UUU[k1 - 1]
        V = VVV[k1 - 1]
        # loop jbeg-1..jend+1 = 0-based NG-1..NG+ny (incl), same for i
        jj = np.s_[NG - 1:NG + ny + 1]
        ii = np.s_[NG - 1:NG + nx + 1]
        jm = np.s_[NG - 2:NG + ny]
        im = np.s_[NG - 2:NG + nx]
        UTE[jj, ii] = p5 * (U[jj, ii] * g.DYU[jj, ii] +
                            U[jm, ii] * g.DYU[jm, ii])
        UTW[jj, ii] = p5 * (U[jj, im] * g.DYU[jj, im] +
                            U[jm, im] * g.DYU[jm, im])
        VTN[jj, ii] = p5 * (V[jj, ii] * g.DXU[jj, ii] +
                            V[jj, im] * g.DXU[jj, im])
        VTS[jj, ii] = p5 * (V[jm, ii] * g.DXU[jm, ii] +
                            V[jm, im] * g.DXU[jm, im])
        if k1 < self.km:
            FC = (VTN - VTS + UTE - UTW) * g.TAREA_R
            WTKB = np.where(k1 < g.KMT, WTK + g.dz[k1 - 1] * FC, c0)
        else:
            WTKB = np.zeros_like(WTK)
        return UTE, UTW, VTN, VTS, WTKB

    def advt_centered(self, k1, TRCR, WTK, WTKB, UTE, VTN):
        """advection.F90:2139-2305 (varthick: no surface vert term)."""
        g = self.g
        ny, nx = self.cfg.ny, self.cfg.nx
        LTK = np.zeros((self.nt,) + WTK.shape)
        jP, iP = np.s_[NG:NG + ny], np.s_[NG:NG + nx]
        jN, jS = np.s_[NG + 1:NG + ny + 1], np.s_[NG - 1:NG + ny - 1]
        iE, iW = np.s_[NG + 1:NG + nx + 1], np.s_[NG - 1:NG + nx - 1]
        for n in range(self.nt):
            T = TRCR[n, k1 - 1]
            LTK[n][jP, iP] = p5 * (
                (VTN[jP, iP] - VTN[jS, iP] + UTE[jP, iP] - UTE[jP, iW])
                * T[jP, iP] +
                VTN[jP, iP] * T[jN, iP] - VTN[jS, iP] * T[jS, iP] +
                UTE[jP, iP] * T[jP, iE] - UTE[jP, iW] * T[jP, iW]
            ) * g.TAREA_R[jP, iP]
            # vertical, whole-array statements
            if k1 > 1:
                LTK[n] += g.dz2r[k1 - 1] * WTK * (TRCR[n, k1 - 2] +
                                                  TRCR[n, k1 - 1])
            # k1==1 varthick: no surface advection term (advection.F90:2271)
            if k1 < self.km:
                LTK[n] -= g.dz2r[k1 - 1] * WTKB * (TRCR[n, k1 - 1] +
                                                   TRCR[n, k1])
        return LTK

    def advu(self, k1, UUU, VVV, WUK):
        """advection.F90:1127-1560 (no pbc). Returns LUK, LVK, WUKB."""
        g = self.g
        ny, nx = self.cfg.ny, self.cfg.nx
        U = UUU[k1 - 1]
        V = VVV[k1 - 1]
        UUW = np.zeros_like(U)
        UUE = np.zeros_like(U)
        VUN = np.zeros_like(U)
        VUS = np.zeros_like(U)
        jj = np.s_[NG - 1:NG + ny + 1]
        ii = np.s_[NG - 1:NG + nx + 1]

        def at(F, dj, di):
            return F[NG - 1 + dj:NG + ny + 1 + dj,
                     NG - 1 + di:NG + nx + 1 + di]

        UD = U * g.DYU
        VD = V * g.DXU
        UUW[jj, ii] = (p25 * (at(UD, 0, 0) + at(UD, 0, -1)) +
                       p125 * (at(UD, -1, 0) + at(UD, -1, -1) +
                               at(UD, 1, 0) + at(UD, 1, -1)))
        UUE[jj, ii] = (p25 * (at(UD, 0, 1) + at(UD, 0, 0)) +
                       p125 * (at(UD, -1, 1) + at(UD, -1, 0) +
                               at(UD, 1, 1) + at(UD, 1, 0)))
        VUS[jj, ii] = (p25 * (at(VD, 0, 0) + at(VD, -1, 0)) +
                       p125 * (at(VD, 0, -1) + at(VD, -1, -1) +
                               at(VD, 0, 1) + at(VD, -1, 1)))
        VUN[jj, ii] = (p25 * (at(VD, 1, 0) + at(VD, 0, 0)) +
                       p125 * (at(VD, 1, -1) + at(VD, 0, -1) +
                               at(VD, 1, 1) + at(VD, 0, 1)))
        WUKB = WUK + g.c2dz[k1 - 1] * p5 * (VUN - VUS + UUE - UUW) \
            * g.UAREA_R
        LUK = np.zeros_like(U)
        LVK = np.zeros_like(U)
        jP, iP = np.s_[NG:NG + ny], np.s_[NG:NG + nx]
        jN, jS = np.s_[NG + 1:NG + ny + 1], np.s_[NG - 1:NG + ny - 1]
        iE, iW = np.s_[NG + 1:NG + nx + 1], np.s_[NG - 1:NG + nx - 1]
        ccv = (VUS[jN, iP] - VUS[jP, iP] + UUW[jP, iE] - UUW[jP, iP])
        LUK[jP, iP] = p5 * (ccv * U[jP, iP] +
                            VUS[jN, iP] * U[jN, iP] -
                            VUS[jP, iP] * U[jS, iP] +
                            UUW[jP, iE] * U[jP, iE] -
                            UUW[jP, iP] * U[jP, iW]) * g.UAREA_R[jP, iP]
        LVK[jP, iP] = p5 * (ccv * V[jP, iP] +
                            VUS[jN, iP] * V[jN, iP] -
                            VUS[jP, iP] * V[jS, iP] +
                            UUW[jP, iE] * V[jP, iE] -
                            UUW[jP, iP] * V[jP, iW]) * g.UAREA_R[jP, iP]
        # vertical advection (whole-array)
        if k1 == 1:
            LUK += g.dzr[0] * WUK * U
            LVK += g.dzr[0] * WUK * V
        else:
            LUK += g.dz2r[k1 - 1] * WUK * (UUU[k1 - 2] + U)
            LVK += g.dz2r[k1 - 1] * WUK * (VVV[k1 - 2] + V)
        if k1 < self.km:
            LUK -= g.dz2r[k1 - 1] * WUKB * (U + UUU[k1])
            LVK -= g.dz2r[k1 - 1] * WUKB * (V + VVV[k1])
        # metric terms + land mask (physical loop, advection.F90:1477-1490)
        P = g.P
        ink = k1 <= g.KMU[P]
        LUK[P] = np.where(ink, LUK[P] + U[P] * V[P] * g.KYU[P]
                          - V[P]**2 * g.KXU[P], c0)
        LVK[P] = np.where(ink, LVK[P] + U[P] * V[P] * g.KXU[P]
                          - U[P]**2 * g.KYU[P], c0)
        return LUK, LVK, WUKB

    # ------------------------------------------------------------------
    # pressure gradient (source/pressure_grad.F90:187-300)
    # ------------------------------------------------------------------
    def gradp(self, k1, RHOK_OLD, RHOK_CUR, RHOK_NEW, leapfrogts, pg):
        if leapfrogts:   # lpressure_avg always true here
            RHOAVG = p25 * (RHOK_NEW + c2 * RHOK_CUR + RHOK_OLD) \
                * self.bouss[k1 - 1]
        else:
            RHOAVG = RHOK_CUR * self.bouss[k1 - 1]
        RHOKX, RHOKY = self.grad(k1, RHOAVG)
        if k1 == 1:
            pg['RHOKMX'] = RHOKX
            pg['RHOKMY'] = RHOKY
            pg['SUMX'] = np.zeros_like(RHOKX)
            pg['SUMY'] = np.zeros_like(RHOKX)
        factor = self.g.dzw[k1 - 1] * grav * p5
        pg['SUMX'] = pg['SUMX'] + factor * (RHOKX + pg['RHOKMX'])
        pg['SUMY'] = pg['SUMY'] + factor * (RHOKY + pg['RHOKMY'])
        pg['RHOKMX'] = RHOKX
        pg['RHOKMY'] = RHOKY
        return pg['SUMX'].copy(), pg['SUMY'].copy()

    # ------------------------------------------------------------------
    # implicit vertical mixing solves (vertical_mix.F90)
    # ------------------------------------------------------------------
    def impvmixt(self, TNEW, TOLD, PSFC, nfirst, nlast, VDC, c2dtt):
        """vertical_mix.F90:1164-1390. TNEW holds RHS in, solution out.
        nfirst/nlast 1-based inclusive. Operates on physical region."""
        g, km = self.g, self.km
        P = g.P
        aidif = self.cfg.aidif
        hfac = g.dz / c2dtt                     # hfac_t(k)
        H1 = hfac[0] + PSFC[P] / (grav * c2dtt)  # varthick
        KMT = g.KMT[P]
        for n in range(nfirst - 1, nlast):
            E = np.zeros((km,) + H1.shape)
            F = np.zeros((km,) + H1.shape)
            A = aidif * g.dzwr[1] * VDC[0][P]
            D = H1 + A
            E[0] = A / D
            B = H1 * E[0]
            F[0] = hfac[0] * TNEW[n, 0][P] / D
            for k1 in range(2, km + 1):
                C = A
                A = aidif * g.dzwr[k1] * VDC[k1 - 1][P]
                land = k1 > KMT
                bot = k1 == KMT
                D = np.where(bot, hfac[k1 - 1] + B,
                             hfac[k1 - 1] + A + B)
                E[k1 - 1] = A / D
                B = np.where(land, B, (hfac[k1 - 1] + B) * E[k1 - 1])
                F[k1 - 1] = np.where(
                    land, c0,
                    (hfac[k1 - 1] * TNEW[n, k1 - 1][P] + C * F[k1 - 2]) / D)
            for k1 in range(km - 1, 0, -1):
                F[k1 - 1] = np.where(k1 < KMT,
                                     F[k1 - 1] + E[k1 - 1] * F[k1], F[k1 - 1])
            for k1 in range(1, km + 1):
                TNEW[n, k1 - 1][P] = TOLD[n, k1 - 1][P] + F[k1 - 1]

    def impvmixt_correct(self, TNEW, PSFC, RHS, nfirst, nlast, VDC, c2dtt):
        """vertical_mix.F90:1460-1675: same matrix, RHS only at k=1,
        TNEW incremented by the solution."""
        g, km = self.g, self.km
        P = g.P
        aidif = self.cfg.aidif
        hfac = g.dz / c2dtt
        H1 = hfac[0] + PSFC[P] / (grav * c2dtt)
        KMT = g.KMT[P]
        for n in range(nfirst - 1, nlast):
            E = np.zeros((km,) + H1.shape)
            F = np.zeros((km,) + H1.shape)
            A = aidif * g.dzwr[1] * VDC[0][P]
            D = H1 + A
            E[0] = A / D
            B = H1 * E[0]
            F[0] = hfac[0] * RHS[n][P] / D
            for k1 in range(2, km + 1):
                C = A
                A = aidif * g.dzwr[k1] * VDC[k1 - 1][P]
                land = k1 > KMT
                bot = k1 == KMT
                D = np.where(bot, hfac[k1 - 1] + B,
                             hfac[k1 - 1] + A + B)
                E[k1 - 1] = A / D
                B = np.where(land, B, (hfac[k1 - 1] + B) * E[k1 - 1])
                F[k1 - 1] = np.where(land, c0, C * F[k1 - 2] / D)
            for k1 in range(km - 1, 0, -1):
                F[k1 - 1] = np.where(k1 < KMT,
                                     F[k1 - 1] + E[k1 - 1] * F[k1], F[k1 - 1])
            for k1 in range(1, km + 1):
                TNEW[n, k1 - 1][P] = TNEW[n, k1 - 1][P] + F[k1 - 1]

    def impvmixu(self, UNEW, VNEW, VVC, c2dtu):
        """vertical_mix.F90:1679-1888. UNEW/VNEW hold RHS in, sol out."""
        g, km = self.g, self.km
        P = g.P
        aidif = self.cfg.aidif
        hfac = g.dz / c2dtu
        KMU = g.KMU[P]
        E = np.zeros((km,) + KMU.shape)
        F1 = np.zeros((km,) + KMU.shape)
        F2 = np.zeros((km,) + KMU.shape)
        A = aidif * g.dzwr[1] * VVC[0][P]
        D = hfac[0] + A
        E[0] = A / D
        B = hfac[0] * E[0]
        F1[0] = hfac[0] * UNEW[0][P] / D
        F2[0] = hfac[0] * VNEW[0][P] / D
        for k1 in range(2, km + 1):
            C = A
            A = aidif * g.dzwr[k1] * VVC[k1 - 1][P]
            interior = k1 < KMU
            bot = k1 == KMU
            D = np.where(bot, hfac[k1 - 1] + B, hfac[k1 - 1] + A + B)
            E[k1 - 1] = A / D
            Bn = (hfac[k1 - 1] + B) * E[k1 - 1]
            F1n = (hfac[k1 - 1] * UNEW[k1 - 1][P] + C * F1[k1 - 2]) / D
            F2n = (hfac[k1 - 1] * VNEW[k1 - 1][P] + C * F2[k1 - 2]) / D
            valid = interior | bot
            B = np.where(valid, Bn, B)
            F1[k1 - 1] = np.where(valid, F1n, c0)
            F2[k1 - 1] = np.where(valid, F2n, c0)
        for k1 in range(km - 1, 0, -1):
            below = k1 < KMU
            F1[k1 - 1] = np.where(below, F1[k1 - 1] + E[k1 - 1] * F1[k1],
                                  F1[k1 - 1])
            F2[k1 - 1] = np.where(below, F2[k1 - 1] + E[k1 - 1] * F2[k1],
                                  F2[k1 - 1])
        for k1 in range(1, km + 1):
            UNEW[k1 - 1][P] = F1[k1 - 1]
            VNEW[k1 - 1][P] = F2[k1 - 1]

    # ------------------------------------------------------------------
    # barotropic elliptic solve: pcg w/ diagonal preconditioner
    # (POP_SolversMod.F90 pcg :1200-1506, btropOperator :2376-2427)
    # ------------------------------------------------------------------
    def btrop_operator(self, X):
        AX = np.zeros_like(X)
        s = np.s_[1:-1, 1:-1]
        C = self.wgtCenter
        N = self.wgtN
        E = self.wgtE
        NE = self.wgtNE
        AX[s] = (C[1:-1, 1:-1] * X[1:-1, 1:-1] +
                 N[1:-1, 1:-1] * X[2:, 1:-1] +
                 N[:-2, 1:-1] * X[:-2, 1:-1] +
                 E[1:-1, 1:-1] * X[1:-1, 2:] +
                 E[1:-1, :-2] * X[1:-1, :-2] +
                 NE[1:-1, 1:-1] * X[2:, 2:] +
                 NE[:-2, 1:-1] * X[:-2, 2:] +
                 NE[1:-1, :-2] * X[2:, :-2] +
                 NE[:-2, :-2] * X[:-2, :-2])
        return AX

    def _gsum(self, W):
        """POP_GlobalSum over physical cells with RCALCT mask."""
        P = self.g.P
        return np.sum(W[P] * self.g.RCALCT[P])

    def pcg(self, X, B):
        g = self.g
        S = np.zeros_like(X)
        AX = self.btrop_operator(X)
        R = B - AX
        halo_update(R)
        eta0 = c1
        cw = self.wgtCenter
        for m in range(1, self.cfg.solv_maxit + 1):
            work1 = np.divide(R, cw, out=np.zeros_like(R), where=cw != c0)
            work0 = R * work1
            eta1 = self._gsum(work0)
            S = work1 + S * (eta1 / eta0)
            Q = self.btrop_operator(S)
            work0 = Q * S
            halo_update(Q)
            eta0 = eta1
            eta1 = eta0 / self._gsum(work0)
            X = X + eta1 * S
            R = R - eta1 * Q
            if m % self.cfg.solv_ncheck == 0:
                R = self.btrop_operator(X)
                R = B - R
                work0 = R * R
                halo_update(R)
                rr = self._gsum(work0)
                if rr < self.solv_criterion:
                    break
        return X

    # ------------------------------------------------------------------
    # baroclinic driver (source/baroclinic.F90:578-1200)
    # ------------------------------------------------------------------
    def baroclinic_driver(self, DH, DHU, leapfrogts):
        g, cfg, km, nt = self.g, self.cfg, self.km, self.nt
        old, cur, new = self.oldtime, self.curtime, self.newtime
        mix = self.mixtime
        TOLD = self.TRACER[old]
        TCUR = self.TRACER[cur]
        TMIX = self.TRACER[mix]
        TNEW = self.TRACER[new]

        # vmix coefficients, all levels (rich fills VDC/VVC per k inside
        # the k loop; order-independent so computed in one sweep)
        VDC, VVC = self.vmix_coeffs_rich(TMIX, self.UVEL[mix],
                                         self.VVEL[mix], self.RHO[mix])
        self.VDC, self.VVC = VDC, VVC

        # ---- block loop 1: tracers ----
        WTK = None
        VTF = np.zeros((nt,) + g.KMT.shape)
        for k1 in range(1, km + 1):
            # hdifft on mix-time tracers (horizontal_mix.F90:486)
            FT = self.hdifft_del2(k1, TMIX)
            # advection (tracer_update baroclinic.F90:2029-2068)
            if k1 == 1:
                WTK = DH.copy()
            UTE, UTW, VTN, VTS, WTKB = self.comp_flux_vel(
                k1, self.UVEL[cur], self.VVEL[cur], WTK)
            LTK = self.advt_centered(k1, TCUR, WTK, WTKB, UTE, VTN)
            FT = FT - LTK
            WTK = WTKB
            # explicit vertical diffusion of old-time tracers
            FT = FT + self.vdifft(k1, TOLD, VDC, VTF)
            # freshwater tracer flux (TFW=0) and sources (=0) omitted:
            # zero in this configuration (forcing 'none')
            # store RHS (baroclinic.F90:2211-2235), implicit_vertical_mix
            if k1 == 1 and leapfrogts:   # varthick & lpressure_avg
                PCUR = self.PSURF[cur]
                POLD = self.PSURF[old]
                for n in range(2):
                    rhs = (self.c2dtt * FT[n] - c2 * TCUR[n, 0] *
                           (PCUR - POLD) / (grav * g.dz[0]))
                    TNEW[n, 0] = np.where(g.KMT > 0, rhs, TNEW[n, 0])
                for n in range(2, nt):
                    TNEW[n, 0] = np.where(k1 <= g.KMT,
                                          self.c2dtt * FT[n], c0)
            else:
                for n in range(nt):
                    TNEW[n, k1 - 1] = np.where(k1 <= g.KMT,
                                               self.c2dtt * FT[n], c0)

        # predictor impvmixt for T,S (baroclinic.F90:878-895)
        if leapfrogts:   # varthick & lpressure_avg & implicit
            self.impvmixt(TNEW, TOLD, self.PSURF[cur], 1, 2,
                          VDC, self.c2dtt)
        # halo updates of predicted T,S (baroclinic.F90:919-941)
        if leapfrogts:
            halo_update(TNEW[0])
            halo_update(TNEW[1])

        # ---- block loop 2: momentum ----
        ZX = np.zeros_like(DH)
        ZY = np.zeros_like(DH)
        pg = {}
        WUK = None
        VUF = np.zeros_like(DH)
        VVF = np.zeros_like(DH)
        UNEW = self.UVEL[new]
        VNEW = self.VVEL[new]
        for k1 in range(1, km + 1):
            if leapfrogts:   # pressure averaging needs new density
                self.RHO[new, k1 - 1] = state_mwjf(
                    TNEW[0, k1 - 1], TNEW[1, k1 - 1], self.pressz[k1 - 1])
            # clinic (baroclinic.F90:1635-1890)
            if k1 == 1:
                WUK = DHU.copy()
            LUK, LVK, WUKB = self.advu(k1, self.UVEL[cur], self.VVEL[cur],
                                       WUK)
            FX = -LUK
            FY = -LVK
            WUK = WUKB
            # coriolis (baroclinic.F90:1760-1778)
            if cfg.impcor and leapfrogts:
                FX = FX + g.FCOR * (cfg.gamma * self.VVEL[cur, k1 - 1] +
                                    (c1 - cfg.gamma) * self.VVEL[old, k1 - 1])
                FY = FY - g.FCOR * (cfg.gamma * self.UVEL[cur, k1 - 1] +
                                    (c1 - cfg.gamma) * self.UVEL[old, k1 - 1])
            else:   # forward euler (impcor, not leapfrog)
                FX = FX + g.FCOR * self.VVEL[old, k1 - 1]
                FY = FY - g.FCOR * self.UVEL[old, k1 - 1]
            # pressure gradient
            PKX, PKY = self.gradp(k1, self.RHO[old, k1 - 1],
                                  self.RHO[cur, k1 - 1],
                                  self.RHO[new, k1 - 1], leapfrogts, pg)
            FX = FX - PKX
            FY = FY - PKY
            # horizontal diffusion of mix-time velocity
            HDUK, HDVK = self.hdiffu_del2(k1, self.UVEL[mix, k1 - 1],
                                          self.VVEL[mix, k1 - 1])
            FX = FX + HDUK
            FY = FY + HDVK
            # explicit vertical diffusion of old-time velocity
            VDUK, VDVK = self.vdiffu(k1, self.UVEL[old], self.VVEL[old],
                                     VVC, VUF, VVF)
            FX = FX + VDUK
            FY = FY + VDVK
            # zero forces at land points (baroclinic.F90:1884-1887)
            FX = np.where(k1 > g.KMU, c0, FX)
            FY = np.where(k1 > g.KMU, c0, FY)
            # store forces (baroclinic.F90:1013-1027)
            if cfg.impcor:
                W1 = self.c2dtu * self.beta * g.FCOR
                W2 = self.c2dtu / (c1 + W1**2)
                UNEW[k1 - 1] = (FX + W1 * FY) * W2
                VNEW[k1 - 1] = (FY - W1 * FX) * W2
            else:
                UNEW[k1 - 1] = self.c2dtu * FX
                VNEW[k1 - 1] = self.c2dtu * FY
            # vertical integral of forcing (baroclinic.F90:1043-1051)
            ZX = ZX + FX * g.dz[k1 - 1]
            ZY = ZY + FY * g.dz[k1 - 1]
        ZX = ZX * g.HUR
        ZY = ZY * g.HUR
        # implicit momentum solve (baroclinic.F90:1066-1069)
        self.impvmixu(UNEW, VNEW, VVC, self.c2dtu)
        # unnormalized baroclinic velocities (baroclinic.F90:1077-1082)
        UNEW += self.UVEL[old]
        VNEW += self.VVEL[old]
        # vertical means and normalization (baroclinic.F90:1092-1140)
        W1 = np.tensordot(g.dz, UNEW, axes=(0, 0)) * g.HUR
        W2 = np.tensordot(g.dz, VNEW, axes=(0, 0)) * g.HUR
        for k1 in range(1, km + 1):
            m = k1 <= g.KMU
            UNEW[k1 - 1] = np.where(m, UNEW[k1 - 1] - W1, c0)
            VNEW[k1 - 1] = np.where(m, VNEW[k1 - 1] - W2, c0)
        return ZX, ZY

    # ------------------------------------------------------------------
    # barotropic driver (source/barotropic.F90:267-741), leapfrog or
    # forward-euler branch, implicit coriolis, varthick
    # ------------------------------------------------------------------
    def barotropic_driver(self, ZX, ZY, leapfrogts):
        g, cfg = self.g, self.cfg
        old, cur, new = self.oldtime, self.curtime, self.newtime
        c2dtp = self.c2dtp
        beta = self.beta
        if leapfrogts:
            W3 = c2dtp * (ZX - cfg.gamma * self.GRADPX[cur] -
                          (c1 - cfg.gamma) * self.GRADPX[old])
            W4 = c2dtp * (ZY - cfg.gamma * self.GRADPY[cur] -
                          (c1 - cfg.gamma) * self.GRADPY[old])
        else:   # f_euler_ts
            W3 = c2dtp * (ZX - self.GRADPX[cur])
            W4 = c2dtp * (ZY - self.GRADPY[cur])
        if cfg.impcor:
            W1 = c2dtp * beta * g.FCOR
            W2 = c1 / (c1 + W1**2)
            UH = W2 * (W3 + W1 * W4) + self.UBTROP[old]
            VH = W2 * (W4 - W1 * W3) + self.VBTROP[old]
        else:
            UH = W3 + self.UBTROP[old]
            VH = W4 + self.VBTROP[old]
        gp = cur if not leapfrogts else old
        W3 = g.HU * (UH + beta * c2dtp * self.GRADPX[gp])
        W4 = g.HU * (VH + beta * c2dtp * self.GRADPY[gp])
        RHS = self.div(1, W3, W4)
        RHS = RHS / (beta * c2dtp)
        # varthick diagonal correction (barotropic.F90:532-552)
        diagCorr = np.where(g.CALCT,
                            g.TAREA / (beta * c2dtp * self.dtp * grav), c0)
        RHS = (RHS - diagCorr * self.PSURF[cur]
               - self.FW * g.TAREA / (beta * c2dtp))
        self.wgtCenter = self.centerWgtIndep - diagCorr
        # initial guess (barotropic.F90:564)
        X = self.PGUESS.copy()
        halo_update(RHS)
        X = self.pcg(X, RHS)
        # checkerboard null-space removal (barotropic.F90:606-634)
        xcheck = np.sum((X * self.CHECKER)[g.P])
        X = (X + self.CONSTNT * self.rcheck * xcheck
             - self.CHECKER * self.rconst * xcheck)
        self.PSURF[new] = X
        GX, GY = self.grad(1, X)
        self.GRADPX[new] = GX
        self.GRADPY[new] = GY
        if leapfrogts:
            self.UBTROP[new] = UH - beta * c2dtp * (GX - self.GRADPX[old])
            self.VBTROP[new] = VH - beta * c2dtp * (GY - self.GRADPY[old])
        else:
            self.UBTROP[new] = UH - beta * c2dtp * (GX - self.GRADPX[cur])
            self.VBTROP[new] = VH - beta * c2dtp * (GY - self.GRADPY[cur])
        halo_update(self.PSURF[new])
        halo_update(self.GRADPX[new])
        halo_update(self.GRADPY[new])

    # ------------------------------------------------------------------
    # corrector / adjustment (source/baroclinic.F90:1217-1500)
    # ------------------------------------------------------------------
    def baroclinic_correct_adjust(self, leapfrogts):
        g, cfg, nt = self.g, self.cfg, self.nt
        old, cur, new, mix = (self.oldtime, self.curtime, self.newtime,
                              self.mixtime)
        TNEW = self.TRACER[new]
        TOLD = self.TRACER[old]
        TCUR = self.TRACER[cur]
        if leapfrogts:    # implicit + pressure avg: corrector for T,S
            RHS1 = np.zeros((nt,) + g.KMT.shape)
            for n in range(2):
                r = ((c2 * TCUR[n, 0] - TOLD[n, 0]) *
                     (self.PSURF[cur] - self.PSURF[old]) -
                     TNEW[n, 0] * (self.PSURF[new] - self.PSURF[cur])) / \
                    (grav * g.dz[0])
                RHS1[n] = np.where(g.KMT > 0, r, c0)
            self.impvmixt_correct(TNEW, self.PSURF[new], RHS1, 1, 2,
                                  self.VDC, self.c2dtt)
            for n in range(2, nt):
                TNEW[n, 0] = np.where(
                    g.KMT > 0,
                    TNEW[n, 0] - TOLD[n, 0] *
                    (self.PSURF[new] - self.PSURF[old]) / (grav * g.dz[0]),
                    TNEW[n, 0])
            if nt > 2:
                self.impvmixt(TNEW, TOLD, self.PSURF[new], 3, nt,
                              self.VDC, self.c2dtt)
        else:             # no leapfrog: standard update all tracers
            for n in range(nt):
                TNEW[n, 0] = np.where(
                    g.KMT > 0,
                    TNEW[n, 0] - TOLD[n, 0] *
                    (self.PSURF[new] - self.PSURF[mix]) / (grav * g.dz[0]),
                    TNEW[n, 0])
            self.impvmixt(TNEW, TOLD, self.PSURF[new], 1, nt,
                          self.VDC, self.c2dtt)
        # reset_to_freezing (baroclinic.F90:1418-1421, liceform=false)
        if cfg.reset_to_freezing:
            TNEW[0, 0] = np.maximum(TNEW[0, 0], -c2)
        # convad: no-op for convection_type='diffusion'
        # (vertical_mix.F90:1941)
        # recompute new density (baroclinic.F90:1470-1478)
        for k1 in range(1, self.km + 1):
            self.RHO[new, k1 - 1] = state_mwjf(
                TNEW[0, k1 - 1], TNEW[1, k1 - 1], self.pressz[k1 - 1])

    # ------------------------------------------------------------------
    # one full timestep (source/step_mod.F90:126-894)
    # ------------------------------------------------------------------
    def step(self):
        g, cfg = self.g, self.cfg
        # time_manager (time_management.F90:1833, set_switches :2139-2230)
        self.nsteps_total += 1
        f_euler = False
        if self.first_step:
            f_euler = True
            self.first_step = False
        avg_ts = (not f_euler and
                  self.nsteps_total % cfg.time_mix_freq == 0)
        leapfrogts = not f_euler
        # timestep coefficients (step_mod.F90:300-323); dt(k)=dtt, no accel
        self.dtp = cfg.dtt
        if leapfrogts:
            self.beta = cfg.alpha
            self.c2dtt = c2 * cfg.dtt
            self.c2dtu = c2 * cfg.dtt
            self.c2dtp = c2 * cfg.dtt
        else:
            self.beta = cfg.theta
            self.c2dtt = cfg.dtt
            self.c2dtu = cfg.dtt
            self.c2dtp = cfg.dtt
        self.mixtime = self.curtime if f_euler else self.oldtime

        old, cur, new = self.oldtime, self.curtime, self.newtime

        DH, DHU = self.dhdt()
        ZX, ZY = self.baroclinic_driver(DH, DHU, leapfrogts)
        halo_update(ZX)
        halo_update(ZY)
        self.barotropic_driver(ZX, ZY, leapfrogts)
        self.baroclinic_correct_adjust(leapfrogts)
        # halo updates of all new-time fields (step_mod.F90:467-560)
        halo_update(self.UBTROP[new])
        halo_update(self.VBTROP[new])
        halo_update(self.UVEL[new])
        halo_update(self.VVEL[new])
        halo_update(self.RHO[new])
        halo_update(self.TRACER[new])
        # add barotropic to baroclinic velocity (step_mod.F90:572-592)
        for k1 in range(1, self.km + 1):
            m = k1 <= g.KMU
            self.UVEL[new, k1 - 1] = np.where(
                m, self.UVEL[new, k1 - 1] + self.UBTROP[new], 
                self.UVEL[new, k1 - 1])
            self.VVEL[new, k1 - 1] = np.where(
                m, self.VVEL[new, k1 - 1] + self.VBTROP[new],
                self.VVEL[new, k1 - 1])
        # PGUESS extrapolation (step_mod.F90:634-640)
        self.PGUESS = (c3 * (self.PSURF[new] - self.PSURF[cur])
                       + self.PSURF[old])
        if avg_ts:
            self._avg_filter()
        else:
            self.FW_OLD = self.FW.copy()
            # rotate time indices (step_mod.F90:827-831)
            self.oldtime, self.curtime, self.newtime = cur, new, old

    def _avg_filter(self):
        """averaging timestep (step_mod.F90:663-796), varthick branch."""
        g = self.g
        old, cur, new = self.oldtime, self.curtime, self.newtime
        for A in (self.UBTROP, self.VBTROP, self.GRADPX, self.GRADPY,
                  self.UVEL, self.VVEL):
            A[old] = p5 * (A[old] + A[cur])
            A[cur] = p5 * (A[cur] + A[new])
        self.FW_OLD = p5 * (self.FW + self.FW_OLD)
        T = self.TRACER
        # k >= 2 plain averaging
        T[old, :, 1:] = p5 * (T[old, :, 1:] + T[cur, :, 1:])
        T[cur, :, 1:] = p5 * (T[cur, :, 1:] + T[new, :, 1:])
        # surface layer: thickness-weighted w/ min/max bounds
        PS = self.PSURF
        PS_FILT_OLD = p5 * (PS[old] + PS[cur])
        PS_FILT_CUR = p5 * (PS[cur] + PS[new])
        for n in range(self.nt):
            wmin = np.minimum(T[old, n, 0], T[cur, n, 0])
            wmax = np.maximum(T[old, n, 0], T[cur, n, 0])
            t = p5 * ((g.dz[0] + PS[old] / grav) * T[old, n, 0] +
                      (g.dz[0] + PS[cur] / grav) * T[cur, n, 0])
            t = t / (g.dz[0] + PS_FILT_OLD / grav)
            T[old, n, 0] = np.clip(t, wmin, wmax)
            wmin = np.minimum(T[cur, n, 0], T[new, n, 0])
            wmax = np.maximum(T[cur, n, 0], T[new, n, 0])
            t = p5 * ((g.dz[0] + PS[cur] / grav) * T[cur, n, 0] +
                      (g.dz[0] + PS[new] / grav) * T[new, n, 0])
            t = t / (g.dz[0] + PS_FILT_CUR / grav)
            T[cur, n, 0] = np.clip(t, wmin, wmax)
        PS[old] = PS_FILT_OLD
        PS[cur] = PS_FILT_CUR
        for k1 in range(1, self.km + 1):
            self.RHO[old, k1 - 1] = state_mwjf(
                T[old, 0, k1 - 1], T[old, 1, k1 - 1], self.pressz[k1 - 1])
            self.RHO[cur, k1 - 1] = state_mwjf(
                T[cur, 0, k1 - 1], T[cur, 1, k1 - 1], self.pressz[k1 - 1])
        self.PGUESS = p5 * (self.PGUESS + PS[new])

    # ------------------------------------------------------------------
    def run(self, nsteps, snap_at=()):
        """Run nsteps; return dict of physical-domain snapshots at the
        requested step numbers (1-based, state AFTER that step), fields
        at curtime (the completed step's new time level after rotation /
        averaging)."""
        snaps = {}
        for n in range(1, nsteps + 1):
            self.step()
            if n in snap_at or n == nsteps:
                snaps[n] = self.snapshot()
        return snaps

    def snapshot(self):
        P = self.g.P
        cur = self.curtime
        return {
            "UVEL": self.UVEL[cur][:, P[0], P[1]].copy(),
            "VVEL": self.VVEL[cur][:, P[0], P[1]].copy(),
            "TEMP": self.TRACER[cur, 0][:, P[0], P[1]].copy(),
            "SALT": self.TRACER[cur, 1][:, P[0], P[1]].copy(),
            "PSURF": self.PSURF[cur][P].copy(),
            "UBTROP": self.UBTROP[cur][P].copy(),
            "VBTROP": self.VBTROP[cur][P].copy(),
        }
