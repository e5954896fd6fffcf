"""Stage-by-stage intermediate-field comparison for step 1 (Euler)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    from tests.reference_oracle.compare import matched_config
    from tests.reference_oracle.oracle import OracleModel, OracleConfig
    from tests.reference_oracle.ogrid import halo_update
    from pop2_tpu.model import Model
    from pop2_tpu import baroclinic, barotropic, solvers

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

    # ---- oracle step-1 internals ----
    om.nsteps_total = 1
    om.first_step = False  # emulate manager state
    leap = False
    om.dtp = om.cfg.dtt
    om.beta = om.cfg.theta
    om.c2dtt = om.c2dtu = om.c2dtp = om.cfg.dtt
    om.mixtime = om.curtime
    DH, DHU = om.dhdt()
    ZXo, ZYo = om.baroclinic_driver(DH, DHU, leap)
    UNEWo = om.UVEL[om.newtime].copy()
    VNEWo = om.VVEL[om.newtime].copy()
    TNEWo = om.TRACER[om.newtime].copy()
    VDCo, VVCo = om.VDC, om.VVC
    halo_update(ZXo)
    halo_update(ZYo)
    om.barotropic_driver(ZXo, ZYo, leap)
    PSo = om.PSURF[om.newtime].copy()

    # ---- framework step-1 internals ----
    from pop2_tpu import step as step_mod
    dh, dhu = step_mod.dhdt(cfg, fm.grid, fm.bc, st)
    bout = baroclinic.driver(cfg, fm.grid, fm.bc, fm.ts_range, st,
                             fm.forcing, dh, dhu, False)
    tout = barotropic.driver(cfg, fm.grid, fm.bc, st, fm.forcing,
                             bout.zx, bout.zy, False, None, None)

    cmp("DH", dh, DH[P])
    cmp("DHU", dhu, DHU[P])
    cmp("VDC", bout.vdc[0], VDCo[:, P[0], P[1]])
    cmp("ZX", bout.zx, ZXo[P])
    cmp("ZY", bout.zy, ZYo[P])
    cmp("Uprime", bout.u_new, UNEWo[:, P[0], P[1]])
    cmp("Vprime", bout.v_new, VNEWo[:, P[0], P[1]])
    cmp("T_rhs", bout.tracer_new[0], TNEWo[0][:, P[0], P[1]])
    cmp("S_rhs", bout.tracer_new[1], TNEWo[1][:, P[0], P[1]])
    cmp("PSURF_new", tout.psurf_new, PSo[P])
    cmp("UBTROP_new", tout.ubtrop_new, om.UBTROP[om.newtime][P])

    # operator cross-check: apply both 9-pt operators to the oracle PSURF
    X = PSo.copy()
    AXo = om.btrop_operator(X)
    op = solvers.make_operator(fm.grid, barotropic.diagonal_correction(
        cfg, fm.grid, False))
    AXf = solvers.apply_op(op, jax.numpy.asarray(X[P]), fm.bc)
    cmp("A*x", AXf, AXo[P])


if __name__ == "__main__":
    main()
