"""Golden-value validation of the GM/Redi tracer mixing against an
independent NumPy transliteration of the reference
(tests/reference_oracle/ogm.py <- source/hmix_gm.F90:1102-2219 +
hmix_gm_submeso_share.F90:149-434).

The seam is the hdifft_gm call boundary: both sides receive the same
mixing-time tracers and boundary-layer depth; each computes its own
slopes (independent MWJF derivative implementations), tapers, merged
streamfunction, and flux assembly. The whole-column jnp formulation of
pop2_tpu/gm.py is checked value-level against the Fortran-shaped
level-sweep with the FZTOP carry."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import eos, gm
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid, grid_bc
from tests.reference_oracle import ogm
from tests.reference_oracle.ogrid import NG, OGrid, halo_update


@pytest.fixture(scope="module")
def setup():
    # state_range_opt='ignore' so both sides run the pure MWJF rational
    # (the transliteration clamps at the constant -2/999 bounds, ours at
    # the per-level Levitus bins; with in-range inputs neither binds and
    # the two independent implementations agree at machine precision —
    # the enforcement seam itself is covered by test_kpp_oracle's EOS
    # tests and tests/test_eos.py)
    cfg = get_config("test").with_(hmix_tracer="gm", nt=3,
                                   passive_tracers=("iage",),
                                   state_range_opt="ignore")
    grid = build_grid(cfg)
    bc = grid_bc(cfg)
    og = OGrid(nx=cfg.nx, ny=cfg.ny, km=cfg.km)
    return cfg, grid, bc, og


def _inputs(cfg, grid, seed=5):
    rng = np.random.RandomState(seed)
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    mask_t = np.asarray(grid.kmask_t)
    zt = np.asarray(grid.vgrid.zt)

    tprof = 2.0 + 16.0 * np.exp(-zt / 8.0e4)
    sprof = 0.0347 - 0.0005 * np.exp(-zt / 5.0e4)
    # smooth horizontal structure + small noise: realistic slopes that
    # exercise all three notanh taper branches
    lat = np.asarray(grid.TLAT)
    T = (tprof[:, None, None] + 1.5 * np.cos(2 * lat)[None]
         + 0.1 * rng.randn(km, ny, nx)) * mask_t
    S = (sprof[:, None, None] + 5.0e-5 * np.sin(3 * lat)[None]
         + 2.0e-5 * rng.randn(km, ny, nx)) * mask_t
    A = (1.0 + 0.2 * rng.randn(km, ny, nx)) * mask_t   # passive tracer
    trcr = np.stack([T, S, A])
    hblt = (zt[2] + (zt[6] - zt[2])
            * (0.5 + 0.5 * np.cos(2 * lat))) * (np.asarray(grid.KMT) > 0)
    return trcr, hblt


def _ghosted(og, f2):
    """Embed a global (ny, nx) field into the oracle's ghosted block."""
    out = np.zeros((og.nyg, og.nxg), dtype=np.float64)
    out[og.P] = f2
    halo_update(out)
    return out


def _run_oracle(cfg, og, trcr, hblt, ah, ah_bolus, ah_bkg):
    nt, km = trcr.shape[0], trcr.shape[1]
    TMIX = np.zeros((nt, km, og.nyg, og.nxg))
    for n in range(nt):
        for k in range(km):
            TMIX[n, k] = _ghosted(og, trcr[n, k])
    BL = _ghosted(og, hblt)
    return ogm.hdifft_gm(og, TMIX, BL, ah, ah_bolus, ah_bkg)


@pytest.mark.parametrize("ah_bolus", [0.6e7, 0.8e7])
def test_hdifft_gm_matches_reference_transliteration(setup, ah_bolus):
    """GTK and VDC_GM match the transliteration at near-machine precision
    for both the cancellation (ah == ah_bolus) and the full skew-flux
    (ah != ah_bolus) paths."""
    cfg, grid, bc, og = setup
    ah, ah_bkg = 0.8e7, 0.8e7
    cfg = cfg.with_(gm_ah=ah, gm_ah_bolus=ah_bolus,
                    gm_ah_bkg_srfbl=ah_bkg)
    trcr, hblt = _inputs(cfg, grid)

    ts_range = eos.build_ts_range(np.asarray(grid.vgrid.zt), cfg.jnp_dtype)
    out = gm.hdifft_gm(cfg, grid, bc, ts_range, jnp.asarray(trcr),
                       hblt=jnp.asarray(hblt))
    gtk_f = np.asarray(out.gtk)
    vdc_f = np.asarray(out.vdc_gm)

    GTK_O, VDC_O = _run_oracle(cfg, og, trcr, hblt, ah, ah_bolus, ah_bkg)
    gtk_o = GTK_O[:, :, og.P[0], og.P[1]]
    vdc_o = VDC_O[:, og.P[0], og.P[1]]

    mask = np.asarray(grid.kmask_t)

    def check(a, b, name):
        """Near-machine agreement for essentially all cells, with a loose
        relative bound on the remainder: the slope SLX = RX/RZ with the
        RZ -> -eps2 clamp amplifies last-bit differences between the two
        independent MWJF-derivative implementations at weakly-stratified
        cells (the same seam-conditioning as the KPP oracle's branch
        decisions, but continuous)."""
        scale = np.abs(b).max()
        tight = np.abs(a - b) <= 1e-9 * scale
        frac = tight.mean()
        assert frac > 0.998, f"{name}: only {frac:.4%} near-machine"
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-9 * scale,
                                   err_msg=name)

    check(vdc_f[mask], vdc_o[mask], "VDC_GM")
    for n in range(trcr.shape[0]):
        check(gtk_f[n][mask], gtk_o[n][mask], f"GTK tracer {n}")


def test_slopes_match_reference_transliteration(setup):
    """The quarter-cell isopycnal slopes themselves agree (the shared
    input of GM and the submesoscale scheme)."""
    cfg, grid, bc, og = setup
    trcr, hblt = _inputs(cfg, grid)
    ts_range = eos.build_ts_range(np.asarray(grid.vgrid.zt), cfg.jnp_dtype)
    tx, ty, tz, slx, sly = gm._slopes(cfg, grid, bc, ts_range,
                                      jnp.asarray(trcr))

    nt, km = trcr.shape[0], trcr.shape[1]
    TMIX = np.zeros((nt, km, og.nyg, og.nxg))
    for n in range(nt):
        for k in range(km):
            TMIX[n, k] = _ghosted(og, trcr[n, k])
    TX, TY, TZ, SLX, SLY = ogm.tracer_slopes(og, TMIX)

    P = og.P
    mask = np.asarray(grid.kmask_t)
    # faces: ours (0=east,1=west) == oracle (ieast, iwest)
    for face in (0, 1):
        for half in (0, 1):
            a = np.asarray(slx)[face, half][mask]
            b = SLX[face, half][:, P[0], P[1]][mask]
            scale = np.abs(b).max() + 1e-30
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-11 * scale,
                                       err_msg=f"slx f{face} h{half}")
            a = np.asarray(sly)[face, half][mask]
            b = SLY[face, half][:, P[0], P[1]][mask]
            scale = np.abs(b).max() + 1e-30
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-11 * scale,
                                       err_msg=f"sly f{face} h{half}")
