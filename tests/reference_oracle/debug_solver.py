"""Compare elliptic operator weights, RHS, and pcg solutions."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from tests.reference_oracle.compare import matched_config
    from tests.reference_oracle.oracle import OracleModel, OracleConfig
    from tests.reference_oracle.ogrid import halo_update, c1
    from pop2_tpu.model import Model
    from pop2_tpu import barotropic, solvers, step as step_mod, baroclinic

    om = OracleModel(OracleConfig())
    P = om.g.P
    cfg = matched_config()
    fm = Model(cfg)
    st = fm.initial_state()

    def cmp(name, f, o):
        f = np.asarray(f)
        d = np.abs(f - o)
        print(f"{name:12s} maxabs={d.max():.3e} rel="
              f"{d.max() / (np.abs(o).max() + 1e-300):.3e}")

    om.nsteps_total = 1
    om.first_step = False
    leap = False
    om.dtp = om.cfg.dtt
    om.beta = om.cfg.theta
    om.c2dtt = om.c2dtu = om.c2dtp = om.cfg.dtt
    om.mixtime = om.curtime

    diag = barotropic.diagonal_correction(cfg, fm.grid, False)
    op = solvers.make_operator(fm.grid, diag)
    # oracle weights with same diagonal correction
    g = om.g
    from tests.reference_oracle.ogrid import grav
    diagCorr_o = np.where(g.CALCT, g.TAREA / (om.beta * om.c2dtp *
                                              om.dtp * grav), 0.0)
    wgtC_o = om.centerWgtIndep - diagCorr_o
    cmp("wgtCenter", op.center, wgtC_o[P])
    cmp("wgtN", op.north, om.wgtN[P])
    cmp("wgtE", op.east, om.wgtE[P])
    cmp("wgtNE", op.ne, om.wgtNE[P])

    # operator application on a smooth test field
    X = np.zeros((g.nyg, g.nxg))
    yy, xx = np.mgrid[0:g.nyg, 0:g.nxg]
    X[:, :] = np.sin(xx / 7.0) * np.cos(yy / 5.0) * 100.0
    halo_update(X)
    om.wgtCenter = wgtC_o
    AXo = om.btrop_operator(X)
    AXf = solvers.apply_op(op, jnp.asarray(X[P]), fm.bc)
    cmp("A*x", AXf, AXo[P])

    # full RHS comparison
    DH, DHU = om.dhdt()
    ZXo, ZYo = om.baroclinic_driver(DH, DHU, leap)
    halo_update(ZXo)
    halo_update(ZYo)
    dh, dhu = step_mod.dhdt(cfg, fm.grid, fm.bc, st)
    bout = baroclinic.driver(cfg, fm.grid, fm.bc, fm.ts_range, st,
                             fm.forcing, dh, dhu, False)
    # oracle RHS (replicate barotropic_driver up to the solve)
    cfg_o = om.cfg
    c2dtp = om.c2dtp
    beta = om.beta
    W3 = c2dtp * (ZXo - om.GRADPX[om.curtime])
    W4 = c2dtp * (ZYo - om.GRADPY[om.curtime])
    W1 = c2dtp * beta * g.FCOR
    W2 = c1 / (c1 + W1 ** 2)
    UH = W2 * (W3 + W1 * W4) + om.UBTROP[om.oldtime]
    VH = W2 * (W4 - W1 * W3) + om.VBTROP[om.oldtime]
    W3 = g.HU * (UH + beta * c2dtp * om.GRADPX[om.curtime])
    W4 = g.HU * (VH + beta * c2dtp * om.GRADPY[om.curtime])
    RHSo = om.div(1, W3, W4) / (beta * c2dtp)
    RHSo = RHSo - diagCorr_o * om.PSURF[om.curtime] \
        - om.FW * g.TAREA / (beta * c2dtp)
    halo_update(RHSo)

    # framework RHS: reproduce the barotropic.driver internals
    import pop2_tpu.constants as const
    from pop2_tpu.stencil import div as fdiv
    dtp = cfg.time.dtp
    fbeta = cfg.time.theta
    fc2dtp = dtp
    work3 = fc2dtp * (bout.zx - st.gradpx_cur)
    work4 = fc2dtp * (bout.zy - st.gradpy_cur)
    w1 = fc2dtp * fbeta * fm.grid.FCOR
    w2 = 1.0 / (1.0 + w1 ** 2)
    uh = w2 * (work3 + w1 * work4) + st.ubtrop_old
    vh = w2 * (work4 - w1 * work3) + st.vbtrop_old
    w3 = fm.grid.HU * (uh + fbeta * fc2dtp * st.gradpx_cur)
    w4 = fm.grid.HU * (vh + fbeta * fc2dtp * st.gradpy_cur)
    rhs = fdiv(w3, w4, fm.grid.DXU, fm.grid.DYU, fm.grid.kmask_t[0],
               fm.bc) / (fbeta * fc2dtp)
    rhs = rhs - diag * st.psurf_cur - fm.forcing.fw * fm.grid.TAREA / \
        (fbeta * fc2dtp)
    cmp("UH", uh, UH[P])
    cmp("RHS", rhs, RHSo[P])

    # pcg from the same RHS/guess
    Xo = om.pcg(om.PGUESS.copy(), RHSo)
    xf, iters, rr = solvers.solve(cfg, op, fm.bc, st.pguess,
                                  jnp.asarray(RHSo[P]))
    print("framework iters/rr:", int(iters), float(rr))
    cmp("pcg_X", xf, Xo[P])
    # checkerboard removal
    xcheck_o = np.sum((Xo * om.CHECKER)[P])
    xcheck_f = float(np.sum(np.asarray(xf) * np.asarray(fm.grid.checker)))
    print("xcheck oracle/framework:", xcheck_o, xcheck_f)


if __name__ == "__main__":
    main()
