"""In-scan tavg accumulation and the expanded field registry.

The reference accumulates ~630 fields from inside the physics routines
(source/tavg.F90); here the accumulators ride the lax.scan carry so output
streams never break the fused-run executable (SURVEY.md §5.5).
"""

import glob
import os

import numpy as np
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.model import Model
from pop2_tpu.tavg import FIELDS


def test_registry_breadth():
    """At least the standard dynamics/forcing fields are registered
    (gx1v7_tavg_contents stream-1 core set)."""
    expected = [
        "SSH", "SSH2", "SST", "SSS", "SU", "SV", "BSF",
        "TEMP", "SALT", "TEMP2", "SALT2", "UVEL", "VVEL", "UVEL2", "VVEL2",
        "KE", "UV", "RHO", "PD", "Q", "PV", "RHO_VINT",
        "WVEL", "WVEL2", "UET", "UES", "VNT", "VNS", "WTT", "WTS",
        "SHF", "SHF_QSW", "SFWF", "TAUX", "TAUY", "TAUX2", "TAUY2",
        "FW", "TFW_T", "TFW_S", "QICE",
        "HBLT", "XBLT", "TBLT", "HMXL", "XMXL", "TMXL",
        "VDC_T", "VDC_S", "VVC",
    ]
    missing = [n for n in expected if n not in FIELDS]
    assert not missing, f"missing tavg fields: {missing}"
    assert len(FIELDS) >= 50


def test_scan_accumulation_matches_per_step(tmp_path):
    """run_compiled with a tavg stream must produce the same averages as the
    per-step path — and must NOT fall back to per-step dispatch."""
    contents = ["SSH", "TEMP", "WVEL", "UET", "SHF", "TAUX"]
    nsteps = 12

    cfg = get_config("mini")
    m1 = Model(cfg)
    s1 = m1.initial_state()
    m1.enable_tavg(contents, freq_steps=nsteps, outdir=str(tmp_path),
                   prefix="per_step")
    for _ in range(nsteps):
        s1, _ = m1.advance(s1)

    m2 = Model(cfg)
    m2.scan_chunk = 4
    s2 = m2.initial_state()
    m2.enable_tavg(contents, freq_steps=nsteps, outdir=str(tmp_path),
                   prefix="scanned")
    s2, _ = m2.run_compiled(s2, nsteps)

    f1 = glob.glob(str(tmp_path / "per_step.*.nc"))
    f2 = glob.glob(str(tmp_path / "scanned.*.nc"))
    assert len(f1) == 1 and len(f2) == 1

    from scipy.io import netcdf_file
    with netcdf_file(f1[0], mmap=False) as a, \
            netcdf_file(f2[0], mmap=False) as b:
        for n in contents:
            va, vb = a.variables[n][:], b.variables[n][:]
            np.testing.assert_allclose(
                vb, va, rtol=0, atol=1e-12 * max(1.0, np.abs(va).max()),
                err_msg=n)
    # the state itself must also agree (scan path == per-step path)
    np.testing.assert_allclose(np.asarray(s2.tracer_cur),
                               np.asarray(s1.tracer_cur), rtol=0, atol=1e-12)


def test_minmax_methods(tmp_path):
    """XMXL/TMXL accumulate max/min of the mixed-layer depth
    (tavg_method_max/min, source/tavg.F90:353-360) — needs KPP."""
    cfg = get_config("mini").with_(vmix="kpp")
    m = Model(cfg)
    s = m.initial_state()
    st = m.enable_tavg(["HMXL", "XMXL", "TMXL"], freq_steps=100,
                       outdir=str(tmp_path))
    for _ in range(5):
        s, _ = m.advance(s)
    avg = np.asarray(st.sums["HMXL"]) / st.nsamples
    mx = np.asarray(st.sums["XMXL"])
    mn = np.asarray(st.sums["TMXL"])
    assert np.all(mx >= avg - 1e-9)
    assert np.all(mn <= avg + 1e-9)
    assert np.isfinite(avg).all()


def test_extras_fields_require_model_path():
    """Requesting HBLT without step extras raises a clear error."""
    from pop2_tpu.grid import build_grid
    from pop2_tpu.tavg import TavgStream, TavgAux
    cfg = get_config("mini")
    grid = build_grid(cfg)
    stream = TavgStream(cfg, grid, ["HBLT"], 10)
    m = Model(cfg)
    s = m.initial_state()
    with pytest.raises(ValueError, match="HBLT"):
        stream.accumulate(s, TavgAux())
