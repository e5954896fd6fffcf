"""Golden-value validation of the submesoscale mixed-layer-eddy scheme
against an independent NumPy transliteration of the reference
(tests/reference_oracle/osubmeso.py <- source/mix_submeso.F90:341-1008).

The seam is the submeso_tendency call boundary: both sides receive the
same mixing-time tracers and mixed-layer depth; each computes its own
buoyancy-gradient vertical averages, horizontal length scale,
streamfunction, and skew-flux divergence (whole-column jnp vs the
Fortran-shaped level sweep with the FZTOP carry)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import eos, submeso
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from tests.reference_oracle import osubmeso
from tests.reference_oracle.ogrid import OGrid
from tests.test_gm_oracle import _ghosted, _inputs


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test").with_(hmix_tracer="gm", nt=3,
                                   passive_tracers=("iage",),
                                   lsubmeso=True,
                                   state_range_opt="ignore")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    og = OGrid(nx=cfg.nx, ny=cfg.ny, km=cfg.km)
    return cfg, grid, bc, og


@pytest.mark.parametrize("const_hls", [False, True])
def test_submeso_matches_reference_transliteration(setup, const_hls):
    """GTK and HLS match the transliteration at near-machine precision
    for both the variable and constant horizontal-length-scale paths."""
    cfg, grid, bc, og = setup
    cfg = cfg.with_(submeso_const_hls=const_hls)
    trcr, hmxl = _inputs(cfg, grid)
    # keep the ML depth above zw(1) everywhere so neither side's
    # first-layer floor binds (the reference takes HMXL as-is)
    hmxl = np.maximum(hmxl, float(np.asarray(grid.vgrid.zw)[1]))

    ts_range = eos.build_ts_range(np.asarray(grid.vgrid.zt), cfg.jnp_dtype)
    gtk_f, hls_f = submeso.submeso_tendency(cfg, grid, bc, ts_range,
                                            jnp.asarray(trcr),
                                            hmxl=jnp.asarray(hmxl))
    gtk_f, hls_f = np.asarray(gtk_f), np.asarray(hls_f)

    nt, km = trcr.shape[0], trcr.shape[1]
    TMIX = np.zeros((nt, km, og.nyg, og.nxg))
    for n in range(nt):
        for k in range(km):
            TMIX[n, k] = _ghosted(og, trcr[n, k])
    HMXL = _ghosted(og, hmxl)

    SF_X, SF_Y, HLS = osubmeso.submeso_sf(
        og, TMIX, HMXL, cfg.submeso_efficiency, cfg.submeso_timescale,
        cfg.submeso_hor_length_scale, cfg.submeso_max_grid_scale,
        luse_const_horiz_len_scale=const_hls)
    GTK = osubmeso.submeso_flux_all(og, TMIX, SF_X, SF_Y)

    P = og.P
    mask2 = np.asarray(grid.KMT) > 0
    mask = np.asarray(grid.kmask_t)

    hls_o = HLS[P]
    scale = np.abs(hls_o[mask2]).max()
    np.testing.assert_allclose(hls_f[mask2], hls_o[mask2], rtol=0,
                               atol=1e-11 * scale, err_msg="HLS")

    gtk_o = GTK[:, :, P[0], P[1]]
    for n in range(nt):
        a, b = gtk_f[n][mask], gtk_o[n][mask]
        scale = np.abs(b).max() + 1e-30
        tight = np.abs(a - b) <= 1e-9 * scale
        assert tight.mean() > 0.998, (
            f"GTK tracer {n}: only {tight.mean():.4%} near-machine")
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-9 * scale,
                                   err_msg=f"GTK tracer {n}")
