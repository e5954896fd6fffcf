"""netCDF-4/HDF5 output backend (pop2_tpu/io/netcdf4.py): round-trip,
dimension-scale wiring, and the tavg stream writer's 'nc4' format."""

import numpy as np
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.io.netcdf4 import read_netcdf4, write_netcdf4

h5py = pytest.importorskip("h5py")


def test_roundtrip(tmp_path):
    fname = str(tmp_path / "out.nc")
    rng = np.random.RandomState(0)
    data3 = rng.randn(1, 5, 8, 16).astype(np.float32)
    data2 = rng.randn(1, 8, 16).astype(np.float32)
    zt = np.linspace(500.0, 5000.0, 5)
    write_netcdf4(
        fname,
        dims={"time": 1, "z_t": 5, "nlat": 8, "nlon": 16},
        variables={
            "z_t": (("z_t",), zt, {"units": "centimeters"}),
            "TEMP": (("time", "z_t", "nlat", "nlon"), data3,
                     {"units": "degC", "long_name": "Potential T"}),
            "SSH": (("time", "nlat", "nlon"), data2,
                    {"units": "cm"}),
        },
        global_attrs={"title": "test"})

    dims, variables, gattrs = read_netcdf4(fname)
    assert dims == {"time": 1, "z_t": 5, "nlat": 8, "nlon": 16}
    assert gattrs["title"] == "test"
    vdims, arr, attrs = variables["TEMP"]
    assert vdims == ("time", "z_t", "nlat", "nlon")
    np.testing.assert_array_equal(arr, data3)
    assert attrs["units"] == "degC"
    np.testing.assert_allclose(variables["z_t"][1], zt)

    # netCDF-4 conventions: dimension datasets are HDF5 dimension
    # scales, variables carry DIMENSION_LIST, the file has _NCProperties
    with h5py.File(fname, "r") as f:
        assert "_NCProperties" in f.attrs
        assert f["z_t"].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert "DIMENSION_LIST" in f["TEMP"].attrs
        d1 = f["TEMP"].dims[1]
        assert len(d1) and d1[0].name == "/z_t"
        # pure dims (no coordinate variable) are marked non-variables
        assert f["nlat"].attrs["NAME"].startswith(
            b"This is a netCDF dimension but not a netCDF variable")


def test_compression_applied(tmp_path):
    fname = str(tmp_path / "big.nc")
    data = np.zeros((1, 4, 64, 64), np.float32)  # compresses well
    write_netcdf4(fname, {"time": 1, "z": 4, "y": 64, "x": 64},
                  {"F": (("time", "z", "y", "x"), data, {})})
    with h5py.File(fname, "r") as f:
        assert f["F"].compression == "gzip"


def test_tavg_stream_nc4(tmp_path):
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(tavg_fmt_out="nc4")
    m = Model(cfg)
    m.enable_tavg(["TEMP", "SSH"], freq_steps=2, outdir=str(tmp_path))
    st = m.initial_state()
    st = m.run(st, nsteps=2)
    files = m.tavg_files
    assert files, "no tavg file written"
    dims, variables, _ = read_netcdf4(files[-1])
    assert dims["nlat"] == cfg.ny and dims["nlon"] == cfg.nx
    vdims, arr, attrs = variables["TEMP"]
    assert arr.shape == (1, cfg.km, cfg.ny, cfg.nx)
    assert np.isfinite(arr).all()
    assert attrs["units"]
