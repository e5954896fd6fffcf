"""Reference-parity oracle: a faithful NumPy transliteration of the
POP2 reference (``/root/reference``) on its ``test`` grid configuration.

This package is a TEST ARTIFACT, not part of the pop2_tpu framework. The
image ships no Fortran compiler (gfortran/flang absent, installs forbidden),
so the reference serial binary cannot be built; instead the reference's
*math* is transliterated here routine-by-routine (every function cites the
``file:line`` it reproduces) and executed in fp64 NumPy to produce golden
fields for the parity tests in ``tests/test_parity.py``. The transliteration
deliberately mirrors the Fortran — per-block ghost-cell semantics, loop
bounds, merge/where masking, order of operations — and is therefore an
*independent* implementation from the JAX framework under test.
"""

from tests.reference_oracle.oracle import OracleModel, OracleConfig  # noqa: F401
