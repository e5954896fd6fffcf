"""Grid, constants, EOS and initial state of the POP2 reference `test`
configuration, transliterated from /root/reference (file:line cited per
routine). NumPy fp64, arrays shaped (ny+2*NG, nx+2*NG) = Fortran
(nx_block, ny_block) single-big-block equivalent with NG=2 ghost cells
(source/blocks.F90:50-56). Index [j, i], j south->north, i west->east.
EW boundary cyclic, NS closed (input_templates/test_pop2_in domain_nml).
"""

import numpy as np

NG = 2

# --- constants (source/pop_constants.F90, non-CCSMCOUPLED branch) ---
c0, c1, c2, c3, c4, c5 = 0.0, 1.0, 2.0, 3.0, 4.0, 5.0
p5, p25, p125 = 0.5, 0.25, 0.125
eps = 1.0e-10           # pop_constants.F90:55
pi = 4.0 * np.arctan(1.0)   # pop_constants.F90:207
pi2 = 2.0 * pi
radian = 180.0 / pi
grav = 980.6            # cm/s^2   pop_constants.F90:235
omega = 7.292123625e-5  # 1/s      pop_constants.F90:236
radius = 6370.0e5       # cm       pop_constants.F90:237
mpercm, cmperm = 0.01, 100.0
ppt_to_salt, salt_to_ppt = 1.0e-3, 1000.0


def halo_update(f, fill=0.0):
    """Ghost-cell update, EW cyclic / NS closed (serial/POP_HaloMod.F90:
    cyclic east-west, closed north-south fills with fillValue). In-place."""
    nx = f.shape[-1] - 2 * NG
    f[..., :, :NG] = f[..., :, nx:nx + NG]
    f[..., :, NG + nx:] = f[..., :, NG:2 * NG]
    f[..., :NG, :] = fill
    f[..., NG + ny_from(f):, :] = fill
    return f


def ny_from(f):
    return f.shape[-2] - 2 * NG


def eoshift(f, dim, shift):
    """Fortran eoshift on the padded block array, zero boundary fill.
    dim=1 -> i (last axis), dim=2 -> j (second-to-last)."""
    out = np.zeros_like(f)
    ax = -1 if dim == 1 else -2
    n = f.shape[ax]
    s = shift
    if s > 0:
        src = [slice(None)] * f.ndim
        dst = [slice(None)] * f.ndim
        src[ax] = slice(s, n)
        dst[ax] = slice(0, n - s)
        out[tuple(dst)] = f[tuple(src)]
    elif s < 0:
        src = [slice(None)] * f.ndim
        dst = [slice(None)] * f.ndim
        src[ax] = slice(0, n + s)
        dst[ax] = slice(-s, n)
        out[tuple(dst)] = f[tuple(src)]
    else:
        out[...] = f
    return out


class OGrid:
    """Internal horizontal/vertical grid + topography of the `test` grid.

    horiz_grid_internal  source/grid.F90:1187-1302
    vert_grid_internal   source/grid.F90:1549-1658, compute_dz :1666-1709
    topography_internal  source/grid.F90:1921-2021 (+flat_bottom :877-884)
    init_grid2 derived   source/grid.F90:493-1186
    """

    def __init__(self, nx=192, ny=128, km=20):
        self.nx, self.ny, self.km = nx, ny, km
        nxg, nyg = nx + 2 * NG, ny + 2 * NG
        self.nxg, self.nyg = nxg, nyg
        self.P = np.s_[NG:NG + ny, NG:NG + nx]   # physical region

        # global index maps (1-based, cyclic EW, closed NS -> 0)
        ig = np.zeros(nxg, dtype=np.int64)
        ig[:] = (np.arange(nxg) - NG) % nx + 1   # cyclic: always valid
        jg = np.zeros(nyg, dtype=np.int64)
        jj = np.arange(nyg) - NG + 1
        jg[:] = np.where((jj >= 1) & (jj <= ny), jj, 0)
        self.ig, self.jg = ig, jg
        IG = np.broadcast_to(ig[None, :], (nyg, nxg))
        JG = np.broadcast_to(jg[:, None], (nyg, nxg))

        # --- horiz_grid_internal (grid.F90:1225-1295) ---
        dlon = 360.0 / nx
        dlat = 180.0 / ny
        # global U-point coords (1-based index arrays, grid.F90:1233-1242)
        xdeg = np.arange(1, nx + 1) * dlon
        xdeg = np.where(xdeg > 180.0, xdeg - 360.0, xdeg)
        ULON_G = xdeg / radian                       # (nx,)
        ULAT_G = (-90.0 + np.arange(1, ny + 1) * dlat) / radian  # (ny,)

        HTN = np.full((nyg, nxg), dlon * radius / radian)
        HTE = np.full((nyg, nxg), dlat * radius / radian)
        HUS = np.full((nyg, nxg), dlon * radius / radian)
        HUW = np.full((nyg, nxg), dlat * radius / radian)
        DYT = np.full((nyg, nxg), dlat * radius / radian)
        DYU = np.full((nyg, nxg), dlat * radius / radian)
        ANGLE = np.zeros((nyg, nxg))
        ULON = np.zeros((nyg, nxg))
        ULAT = np.zeros((nyg, nxg))
        DXU = np.ones((nyg, nxg))
        DXT = np.ones((nyg, nxg))

        valid = (IG > 0) & (JG > 0)
        # ULAT/ULON per global index (grid.F90:1276-1287)
        ULON = np.where(valid, ULON_G[(IG - 1) % nx], 0.0)
        ULAT = np.where(valid, ULAT_G[np.clip(JG - 1, 0, ny - 1)], 0.0)
        HTN = np.where(valid, HTN * np.cos(ULAT), 1.0)
        DXU = np.where(valid, HTN, 1.0)
        lathalf = (-90.0 + (JG - p5) * dlat) / radian
        HUS = np.where(valid, HUS * np.cos(lathalf), 1.0)
        jm1 = JG - 1
        jm1 = np.where(jm1 < 1, ny, jm1)             # grid.F90:1257-1259
        DXT = np.where(valid,
                       dlon * radius / radian * p5 *
                       (np.cos(ULAT_G[np.clip(JG, 1, ny) - 1]) +
                        np.cos(ULAT_G[jm1 - 1])), 1.0)

        # --- closed-boundary extension of DX*/DY* into NS ghost rows
        # (grid.F90:592-633; EW is cyclic so no extension needed there)
        for f in (DXU, DYU, DXT, DYT):
            f[:NG, :] = f[NG, :]
            f[NG + ny:, :] = f[NG + ny - 1, :]

        DXUR, DYUR = c1 / DXU, c1 / DYU
        UAREA = DXU * DYU
        UAREA_R = c1 / UAREA
        DXTR, DYTR = c1 / DXT, c1 / DYT
        TAREA = DXT * DYT
        TAREA_R = c1 / TAREA

        # --- cf_area_avg (grid.F90:2882-2932) ---
        AT0 = ATS = ATW = ATSW = p25
        AU0 = TAREA * p25 * UAREA_R
        AUN = eoshift(TAREA, 2, 1) * p25 * UAREA_R
        AUE = eoshift(TAREA, 1, 1) * p25 * UAREA_R
        AUNE = eoshift(eoshift(TAREA, 1, 1), 2, 1) * p25 * UAREA_R
        self.AU0, self.AUN, self.AUE, self.AUNE = AU0, AUN, AUE, AUNE
        self.AT0 = self.ATS = self.ATW = self.ATSW = p25

        # --- calc_tpoints (grid.F90:2939-3104) ---
        TLAT = np.zeros((nyg, nxg))
        TLON = np.zeros((nyg, nxg))

        def cart(lat, lon):
            cz = np.cos(lat)
            return np.cos(lon) * cz, np.sin(lon) * cz, np.sin(lat)

        xc, yc, zc = cart(ULAT, ULON)
        # 4-pt sw average, loop j=2..ny_block, i=2..nx_block (1-based)
        sl = np.s_[1:, 1:]
        tx = p25 * (xc[1:, 1:] + xc[:-1, 1:] + xc[1:, :-1] + xc[:-1, :-1])
        ty = p25 * (yc[1:, 1:] + yc[:-1, 1:] + yc[1:, :-1] + yc[:-1, :-1])
        tz = p25 * (zc[1:, 1:] + zc[:-1, 1:] + zc[1:, :-1] + zc[:-1, :-1])
        da = np.sqrt(tx**2 + ty**2 + tz**2)
        TLAT[sl] = np.arcsin(tz / da)
        TLON[sl] = np.where((tx != c0) | (ty != c0), np.arctan2(ty, tx), c0)
        # bottom physical row extrapolation (grid.F90:3052-3063)
        jb = NG
        TLON[jb, NG:NG + nx] = TLON[jb + 1, NG:NG + nx]
        TLAT[jb, NG:NG + nx] = (c2 * TLAT[jb + 1, NG:NG + nx]
                                - TLAT[jb + 2, NG:NG + nx])
        TLON = np.where(TLON > pi2, TLON - pi2, TLON)
        TLON = np.where(TLON < c0, TLON + pi2, TLON)
        halo_update(TLAT)
        halo_update(TLON)

        # --- vert_grid_internal (grid.F90:1549-1658) ---
        dz = self._vert_grid_internal(km)           # cm
        dzw = np.zeros(km + 1)                      # dzw(0:km)
        dzwr = np.zeros(km + 1)
        zw = np.zeros(km + 1)                       # zw(1:km) stored [1..]
        zt = np.zeros(km + 1)
        dzw[0] = p5 * dz[1 - 1]
        dzw[km] = p5 * dz[km - 1]
        dzwr[0] = c1 / dzw[0]
        zw[1] = dz[0]
        zt[1] = dzw[0]
        for k in range(1, km):                       # k=1..km-1 (1-based)
            dzw[k] = p5 * (dz[k - 1] + dz[k])
            zw[k + 1] = zw[k] + dz[k]
            zt[k + 1] = zt[k] + dzw[k]
        c2dz = c2 * dz
        dzr = c1 / dz
        dz2r = c1 / c2dz
        for k in range(1, km + 1):
            dzwr[k] = c1 / dzw[k]
        self.dz, self.dzw, self.dzwr = dz, dzw, dzwr
        self.zw1 = zw[1:]    # zw(k), k=1..km
        self.zt1 = zt[1:]    # zt(k)
        self.c2dz, self.dzr, self.dz2r = c2dz, dzr, dz2r

        # --- topography_internal (grid.F90:1957-1988), via global coords
        latd_g = ULAT_G * radian                     # (ny,)
        lond_g = ULON_G * radian                     # (nx,)
        lond_g = np.where(lond_g < c0, lond_g + 360.0, lond_g)
        LATD = np.broadcast_to(latd_g[:, None], (ny, nx))
        LOND = np.broadcast_to(lond_g[None, :], (ny, nx))
        KMT_G = np.full((ny, nx), km, dtype=np.int64)
        KMT_G[(LATD > -35.0) & (LOND > 210.0) & (LOND < 250.0)] = 0
        KMT_G[(LATD > 25.0) & (LOND > 210.0) & (LOND < 330.0)] = 0
        # grid.F90:1975-1977: lond>210 & lond<150 is unsatisfiable (kept
        # faithfully as a no-op)
        KMT_G[(LATD > -60.0) & (LOND > 110.0) & (LOND < 150.0)] = 0
        KMT_G[np.abs(LATD) > 75.0] = 0
        # flat_bottom set true for internal topo (grid.F90:830): KMT=km kept
        KMT = np.zeros((nyg, nxg), dtype=np.int64)
        KMT[self.P] = KMT_G
        halo_update(KMT, fill=0)

        # --- KMU = min of 4 surrounding KMT (grid.F90:973-987) ---
        KMU = np.zeros_like(KMT)
        KMU[:-1, :-1] = np.minimum(
            np.minimum(KMT[:-1, :-1], KMT[:-1, 1:]),
            np.minimum(KMT[1:, :-1], KMT[1:, 1:]))
        halo_update(KMU, fill=0)

        # --- HT, HU, HUR (grid.F90:1023-1042, no pbc) ---
        HT = np.where(KMT >= 1, self.zw1[np.clip(KMT, 1, km) - 1], c0)
        HU = np.where(KMU >= 1, self.zw1[np.clip(KMU, 1, km) - 1], c0)
        HUR = np.where(KMU >= 1, c1 / np.where(HU == 0, 1, HU), c0)

        # --- landmasks (grid.F90:2537-2596) ---
        CALCT = KMT >= 1
        CALCU = KMU >= 1
        RCALCT = np.where(CALCT, c1, c0)
        RCALCU = np.where(CALCU, c1, c0)
        KMTN = eoshift(KMT, 2, 1)
        KMTS = eoshift(KMT, 2, -1)
        KMTE = eoshift(KMT, 1, 1)
        KMTW = eoshift(KMT, 1, -1)

        # --- Coriolis (grid.F90:1150-1172, lconst_Coriolis=.false.) ---
        FCOR = c2 * omega * np.sin(ULAT)
        FCORT = c2 * omega * np.sin(TLAT)

        # --- area/volume sums (grid.F90:1056-1076) over physical cells
        P = self.P
        self.area_t = np.sum(TAREA[P] * RCALCT[P])

        # metric advection coefficients KXU,KYU (source/advection.F90:391-394)
        KXU = (eoshift(HUW, 1, 1) - HUW) * UAREA_R
        KYU = (eoshift(HUS, 2, 1) - HUS) * UAREA_R

        for name, val in dict(
                HTN=HTN, HTE=HTE, HUS=HUS, HUW=HUW, DXU=DXU, DYU=DYU,
                DXT=DXT, DYT=DYT, DXUR=DXUR, DYUR=DYUR, DXTR=DXTR,
                DYTR=DYTR, UAREA=UAREA, UAREA_R=UAREA_R, TAREA=TAREA,
                TAREA_R=TAREA_R, ULAT=ULAT, ULON=ULON, TLAT=TLAT,
                TLON=TLON, ANGLE=ANGLE, KMT=KMT, KMU=KMU, HT=HT, HU=HU,
                HUR=HUR, CALCT=CALCT, CALCU=CALCU, RCALCT=RCALCT,
                RCALCU=RCALCU, KMTN=KMTN, KMTS=KMTS, KMTE=KMTE, KMTW=KMTW,
                FCOR=FCOR, FCORT=FCORT, KXU=KXU, KYU=KYU).items():
            setattr(self, name, val)

        # 3-D level masks (k 1-based): k <= KMT
        ks = np.arange(1, km + 1)[:, None, None]
        self.MASKT = ks <= KMT[None, :, :]           # (km, nyg, nxg)
        self.MASKU = ks <= KMU[None, :, :]

    @staticmethod
    def _vert_grid_internal(km, zmax=5500.0, dz_sfc=25.0, dz_deep=400.0):
        """grid.F90:1549-1658 bisection + compute_dz :1666-1709 (meters in,
        cm out)."""
        def compute_dz(zlength):
            dz = np.zeros(km)
            depth = c0
            for k in range(km):
                dz[k] = dz_deep - (dz_deep - dz_sfc) * np.exp(
                    -(depth / zlength) ** 2)
                depth += dz[k]
            return depth, dz

        zl0, zl1 = eps, zmax
        dzl = zl1 - zl0
        d0, dz = compute_dz(zl0)
        d1, dz = compute_dz(zl1)
        if (d0 - zmax) * (d1 - zmax) > c0:
            raise RuntimeError("vert_grid: zero point not in interval")
        while (dzl / zmax) > eps:
            zlength = zl0 + p5 * dzl
            depth, dz = compute_dz(zlength)
            if (d0 - zmax) * (depth - zmax) < c0:
                d1, zl1 = depth, zlength
            elif (d1 - zmax) * (depth - zmax) < c0:
                d0, zl0 = depth, zlength
            else:
                raise RuntimeError("vert_grid: zero point not in interval")
            dzl = zl1 - zl0
        return dz * cmperm

    # --- grid-staggering averages (grid.F90:3297-3420) ---
    def ugrid_to_tgrid(self, U):
        out = np.zeros_like(U)
        out[..., 1:, 1:] = p25 * (U[..., 1:, 1:] + U[..., :-1, 1:] +
                                  U[..., 1:, :-1] + U[..., :-1, :-1])
        out[..., 0, :] = c0
        out[..., :, 0] = c0
        return out

    def tgrid_to_ugrid(self, T):
        out = np.zeros_like(T)
        out[..., :-1, :-1] = (self.AU0[:-1, :-1] * T[..., :-1, :-1] +
                              self.AUN[:-1, :-1] * T[..., 1:, :-1] +
                              self.AUE[:-1, :-1] * T[..., :-1, 1:] +
                              self.AUNE[:-1, :-1] * T[..., 1:, 1:])
        out[..., -1, :] = c0
        out[..., :, -1] = c0
        return out


# ---------------------------------------------------------------------------
# EOS: MWJF (source/state_mod.F90:160-186 coeffs, :258-460 state routine)
# ---------------------------------------------------------------------------
p001 = 0.001
mwjfnp0s0t0 = 9.99843699e+2 * p001
mwjfnp0s0t1 = 7.35212840e+0 * p001
mwjfnp0s0t2 = -5.45928211e-2 * p001
mwjfnp0s0t3 = 3.98476704e-4 * p001
mwjfnp0s1t0 = 2.96938239e+0 * p001
mwjfnp0s1t1 = -7.23268813e-3 * p001
mwjfnp0s2t0 = 2.12382341e-3 * p001
mwjfnp1s0t0 = 1.04004591e-2 * p001
mwjfnp1s0t2 = 1.03970529e-7 * p001
mwjfnp1s1t0 = 5.18761880e-6 * p001
mwjfnp2s0t0 = -3.24041825e-8 * p001
mwjfnp2s0t2 = -1.23869360e-11 * p001
mwjfdp0s0t0 = 1.0e+0
mwjfdp0s0t1 = 7.28606739e-3
mwjfdp0s0t2 = -4.60835542e-5
mwjfdp0s0t3 = 3.68390573e-7
mwjfdp0s0t4 = 1.80809186e-10
mwjfdp0s1t0 = 2.14691708e-3
mwjfdp0s1t1 = -9.27062484e-6
mwjfdp0s1t3 = -1.78343643e-10
mwjfdp0sqt0 = 4.76534122e-6
mwjfdp0sqt2 = 1.63410736e-9
mwjfdp1s0t0 = 5.30848875e-6
mwjfdp2s0t3 = -3.03175128e-16
mwjfdp3s0t1 = -1.27934137e-17

# valid ranges, mwjf (state_mod.F90:1060-1063)
TMIN, TMAX, SMIN, SMAX = -2.0, 999.0, 0.0, 0.999


def pressure_bars(depth_m):
    """state_mod.F90:1724-1771 (depth meters -> bars)."""
    return (0.059808 * (np.exp(-0.025 * depth_m) - c1)
            + 0.100766 * depth_m + 2.28405e-7 * depth_m ** 2)


def state_mwjf(TEMPK, SALTK, pressz_kk):
    """state(k,kk,...) mwjf branch with range enforcement
    (state_mod.F90:393-398 enforce, :419-445 mwjf)."""
    TQ = np.maximum(np.minimum(TEMPK, TMAX), TMIN)
    SQ = np.maximum(np.minimum(SALTK, SMAX), SMIN)
    p = 10.0 * pressz_kk
    SQ = 1000.0 * SQ
    SQR = np.sqrt(SQ)
    n0 = mwjfnp0s0t0 + p * (mwjfnp1s0t0 + p * mwjfnp2s0t0)
    n1 = mwjfnp0s0t1
    n2 = mwjfnp0s0t2 + p * (mwjfnp1s0t2 + p * mwjfnp2s0t2)
    n3 = mwjfnp0s0t3
    ns1t0 = mwjfnp0s1t0 + p * mwjfnp1s1t0
    ns1t1 = mwjfnp0s1t1
    ns2t0 = mwjfnp0s2t0
    WORK1 = (n0 + TQ * (n1 + TQ * (n2 + n3 * TQ))
             + SQ * (ns1t0 + ns1t1 * TQ + ns2t0 * SQ))
    d0 = mwjfdp0s0t0 + p * mwjfdp1s0t0
    d1 = mwjfdp0s0t1 + p ** 3 * mwjfdp3s0t1
    d2 = mwjfdp0s0t2
    d3 = mwjfdp0s0t3 + p ** 2 * mwjfdp2s0t3
    d4 = mwjfdp0s0t4
    ds1t0 = mwjfdp0s1t0
    ds1t1 = mwjfdp0s1t1
    ds1t3 = mwjfdp0s1t3
    dsqt0 = mwjfdp0sqt0
    dsqt2 = mwjfdp0sqt2
    WORK2 = (d0 + TQ * (d1 + TQ * (d2 + TQ * (d3 + d4 * TQ)))
             + SQ * (ds1t0 + TQ * (ds1t1 + TQ * TQ * ds1t3)
                     + SQR * (dsqt0 + TQ * TQ * dsqt2)))
    return WORK1 / WORK2


# ---------------------------------------------------------------------------
# 1992 Levitus internal T/S profile (source/initial.F90:960-1005, 1389-1428)
# ---------------------------------------------------------------------------
depth_levitus = np.array([
    0.0, 10.0, 20.0, 30.0, 50.0, 75.0, 100.0, 125.0, 150.0, 200.0, 250.0,
    300.0, 400.0, 500.0, 600.0, 700.0, 800.0, 900.0, 1000.0, 1100.0,
    1200.0, 1300.0, 1400.0, 1500.0, 1750.0, 2000.0, 2500.0, 3000.0,
    3500.0, 4000.0, 4500.0, 5000.0, 5500.0])
tmean_levitus = np.array([
    18.27, 18.22, 18.09, 17.87, 17.17, 16.11, 15.07, 14.12, 13.29, 11.87,
    10.78, 9.94, 8.53, 7.35, 6.38, 5.65, 5.06, 4.57, 4.13, 3.80, 3.51,
    3.26, 3.05, 2.86, 2.47, 2.19, 1.78, 1.49, 1.26, 1.05, 0.91, 0.87,
    1.00])
smean_levitus = np.array([
    34.57, 34.67, 34.73, 34.79, 34.89, 34.97, 35.01, 35.03, 35.03, 34.98,
    34.92, 34.86, 34.76, 34.68, 34.63, 34.60, 34.59, 34.60, 34.61, 34.63,
    34.65, 34.66, 34.68, 34.70, 34.72, 34.74, 34.75, 34.74, 34.74, 34.73,
    34.73, 34.72, 34.72])


def levitus_profile(zt_cm):
    """initial.F90:1400-1417: piecewise-linear interp at zt (cm -> m)."""
    km = zt_cm.shape[0]
    tinit = np.zeros(km)
    sinit = np.zeros(km)
    for k in range(km):
        d = zt_cm[k] * mpercm
        kk = 0
        for kkk in range(32):               # intrp_loop (1..32)
            kk = kkk
            if (d >= depth_levitus[kkk]) and (d < depth_levitus[kkk + 1]):
                break
        s = ((d - depth_levitus[kk]) /
             (depth_levitus[kk + 1] - depth_levitus[kk]))
        tinit[k] = (c1 - s) * tmean_levitus[kk] + s * tmean_levitus[kk + 1]
        sinit[k] = (c1 - s) * smean_levitus[kk] + s * smean_levitus[kk + 1]
    return tinit, sinit
