"""Run the pop2_tpu framework and the reference oracle side by side on the
matched test-grid configuration and report per-field max-abs differences.

Usage: python -m tests.reference_oracle.compare [nsteps] [snap,snap,...]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def matched_config():
    import jax
    jax.config.update("jax_enable_x64", True)
    from pop2_tpu.config import get_config, SolverConfig, TimeConfig
    return get_config(
        "test", vmix="rich", lbouss_correct=True, bottom_drag=1.225e-3,
        solver=SolverConfig(choice="pcg", convergence_criterion=1.0e-12,
                            max_iterations=1000, convergence_check_freq=10),
        time=TimeConfig(dt_option="seconds", dt_count=3375.0,
                        time_mix_opt="avg", time_mix_freq=17))


def run_framework(nsteps, snap_at):
    from pop2_tpu.model import Model
    m = Model(matched_config())
    state = m.initial_state()
    snaps = {}
    for n in range(1, nsteps + 1):
        state, _ = m.advance(state)
        if n in snap_at or n == nsteps:
            snaps[n] = {
                "UVEL": np.asarray(state.u_cur),
                "VVEL": np.asarray(state.v_cur),
                "TEMP": np.asarray(state.tracer_cur[0]),
                "SALT": np.asarray(state.tracer_cur[1]),
                "PSURF": np.asarray(state.psurf_cur),
                "UBTROP": np.asarray(state.ubtrop_cur),
                "VBTROP": np.asarray(state.vbtrop_cur),
            }
    return snaps


def run_oracle(nsteps, snap_at):
    from tests.reference_oracle.oracle import OracleModel, OracleConfig
    m = OracleModel(OracleConfig())
    return m.run(nsteps, snap_at=snap_at)


def report(fs, os_, n):
    print(f"--- step {n} ---")
    for k in ("UVEL", "VVEL", "TEMP", "SALT", "PSURF", "UBTROP", "VBTROP"):
        f, o = fs[k], os_[k]
        d = np.abs(f - o)
        scale = np.abs(o).max() + 1e-300
        print(f"  {k:7s} maxabs={d.max():.3e}  rel={d.max() / scale:.3e}  "
              f"(field max {np.abs(o).max():.3e})")


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    snap_at = (tuple(int(x) for x in sys.argv[2].split(","))
               if len(sys.argv) > 2 else (1,))
    snap_at = tuple(s for s in snap_at if s <= nsteps)
    o = run_oracle(nsteps, snap_at)
    f = run_framework(nsteps, snap_at)
    for n in sorted(o):
        report(f[n], o[n], n)


if __name__ == "__main__":
    main()


# ---- dimension-parameterized variants (fp64-grade-mode validation) ----

def matched_config_at(nx, ny, km, dtype="float64", production_solver=False):
    """The matched physics configuration at arbitrary dims (the auto_dt
    and lauto_hmix recipes scale with nx). ``production_solver`` swaps in
    the production fp64-grade solve: PCSI tol 1e-13 + generated SPAI +
    mixed-precision iterative refinement (solve_dtype='float64' under an
    fp32 model selects solvers.solve_refined)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from pop2_tpu.config import get_config, SolverConfig, TimeConfig
    if production_solver:
        solver = SolverConfig(choice="PCSI", convergence_criterion=1.0e-13,
                              max_iterations=1000, convergence_check_freq=10,
                              convergence_check_start=60,
                              preconditioner="spai", solve_dtype="float64")
    else:
        solver = SolverConfig(choice="pcg", convergence_criterion=1.0e-12,
                              max_iterations=1000, convergence_check_freq=10)
    return get_config(
        "test", nx=nx, ny=ny, km=km, dtype=dtype,
        vmix="rich", lbouss_correct=True, bottom_drag=1.225e-3,
        solver=solver,
        time=TimeConfig(dt_option="seconds", dt_count=3600.0 * 180 / nx,
                        time_mix_opt="avg", time_mix_freq=17))


def run_framework_at(cfg, nsteps, snap_at):
    from pop2_tpu.model import Model
    m = Model(cfg)
    state = m.initial_state()
    snaps = {}
    for n in range(1, nsteps + 1):
        state, _ = m.advance(state)
        if n in snap_at or n == nsteps:
            snaps[n] = {
                "UVEL": np.asarray(state.u_cur),
                "VVEL": np.asarray(state.v_cur),
                "TEMP": np.asarray(state.tracer_cur[0]),
                "SALT": np.asarray(state.tracer_cur[1]),
                "PSURF": np.asarray(state.psurf_cur),
                "UBTROP": np.asarray(state.ubtrop_cur),
                "VBTROP": np.asarray(state.vbtrop_cur),
            }
    return snaps


def run_oracle_at(nx, ny, km, nsteps, snap_at):
    from tests.reference_oracle.oracle import OracleModel, OracleConfig
    m = OracleModel(OracleConfig(nx=nx, ny=ny, km=km,
                                 dtt=3600.0 * 180 / nx))
    return m.run(nsteps, snap_at=snap_at)
