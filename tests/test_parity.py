"""Reference-parity tests: pop2_tpu vs the NumPy transliteration of the
POP2 reference (tests/reference_oracle/) on the matched `test`-grid
configuration (centered advection, del2 auto coefficients, Richardson
implicit vmix, mwjf enforce, varthick, pressure averaging + bouss
correction, impcor, pcg diagonal, 'avg' time mixing).

The image ships no Fortran compiler, so the oracle — a routine-by-routine
transliteration of the reference's math with file:line citations — stands in
for the reference serial binary. See PARITY.md for the 100-step table.

Tolerances: step 1 agrees to machine precision; later steps accumulate
solver-stopping-point noise amplified by the leapfrog mode, bounded by the
averaging filter (measured ≤1e-9 relative on every field at step 100).
"""

import numpy as np
import pytest

from tests.reference_oracle.compare import (matched_config, run_framework,
                                            run_oracle)

FIELDS = ("UVEL", "VVEL", "TEMP", "SALT", "PSURF", "UBTROP", "VBTROP")


def _rel(f, o):
    return np.abs(f - o).max() / (np.abs(o).max() + 1e-300)


@pytest.fixture(scope="module")
def five_step_runs():
    nsteps, snaps = 5, (1, 5)
    return run_oracle(nsteps, snaps), run_framework(nsteps, snaps)


def test_step1_machine_precision(five_step_runs):
    """The full Euler first step — dhdt, rich vmix, del2, centered
    advection, implicit solves, barotropic pcg, corrector — matches the
    reference transliteration to roundoff."""
    o, f = five_step_runs
    for k in FIELDS:
        assert _rel(f[1][k], o[1][k]) < 1.0e-11, k


def test_step5_leapfrog_parity(five_step_runs):
    """Leapfrog + averaging-filter sequence stays within solver-noise
    bounds of the reference math."""
    o, f = five_step_runs
    for k in FIELDS:
        assert _rel(f[5][k], o[5][k]) < 1.0e-7, k


@pytest.mark.slow
def test_step100_parity():
    """The BASELINE.json north star: UVEL/VVEL/TEMP/SALT/PSURF allclose
    (fp64) vs the reference after 100 steps on the test grid."""
    nsteps, snaps = 100, (100,)
    o = run_oracle(nsteps, snaps)
    f = run_framework(nsteps, snaps)
    for k, tol in [("UVEL", 1e-7), ("VVEL", 1e-7), ("TEMP", 1e-9),
                   ("SALT", 1e-9), ("PSURF", 1e-7)]:
        assert _rel(f[100][k], o[100][k]) < tol, k


@pytest.mark.slow
def test_fp64_grade_mode_gx3v7_dims():
    """The declared production fp64-grade mode (round-4 verdict item 5a):
    an fp32 model with the mixed-precision refined barotropic solve
    (PCSI tol 1e-13 + generated SPAI + double-single refinement).

    Two claims, validated against the fp64 oracle at gx3v7 dims
    (100x116x60, the production-like serial grid):
      (1) the discretization is equation-exact at these dims — the fp64
          framework tracks the oracle at solver-noise level;
      (2) the fp32+refined run's deviation is BOUNDED at the fp32
          state-storage level over an averaging window (the leapfrog
          amplifies per-step rounding until the time filter caps it) —
          i.e. the refined solve (residual 1e-13) is never the limiting
          error term; fp32 state storage is.
    """
    from tests.reference_oracle.compare import (matched_config_at,
                                                run_framework_at,
                                                run_oracle_at)
    nx, ny, km = 100, 116, 60
    oc = run_oracle_at(nx, ny, km, 24, (10, 24))

    f64 = run_framework_at(matched_config_at(nx, ny, km, dtype="float64"),
                           10, (10,))
    for k in FIELDS:
        assert _rel(f64[10][k], oc[10][k]) < 1e-9, (k, "fp64")

    f32 = run_framework_at(
        matched_config_at(nx, ny, km, dtype="float32",
                          production_solver=True), 24, (10, 24))
    bands = {"UVEL": 5e-3, "VVEL": 5e-3, "TEMP": 2e-4, "SALT": 2e-4,
             "PSURF": 5e-2, "UBTROP": 8e-2, "VBTROP": 8e-2}
    for step in (10, 24):
        for k in FIELDS:
            assert _rel(f32[step][k], oc[step][k]) < bands[k], (k, step)
