"""Tripole fold end-to-end validation via the doubled-grid oracle.

A tripole half grid represents the same ocean as a 'doubled' grid of
2*ny-1 rows built by mirroring every array across the fold with the
location/kind mappings of mpi/POP_HaloMod.F90:1961-2050. Running the
doubled grid with an ordinary closed northern boundary and the half grid
with ns_boundary='tripole' must produce identical grids (rows 0..ny-1)
and identical model evolution — this exercises every fold annotation in
grid construction and in the runtime stencils at once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu.config import ModelConfig, TimeConfig
from pop2_tpu.grid import build_grid
from pop2_tpu.io import grid_files
from pop2_tpu.model import Model

NX, NY, KM = 32, 12, 6


def _rev_center(r):
    return r[..., ::-1]


def _rev_corner(r):
    return np.roll(r[..., ::-1], -1, axis=-1)


def _half_raw():
    """Raw grid arrays for the tripole half grid. Degenerate-row
    constraints (top row on the fold) are met by row-constant metrics."""
    j = np.arange(NY)[:, None]
    i = np.arange(NX)[None, :]
    htn = 2.0e7 * (1.0 + 0.1 * np.cos(np.pi * j / NY)) * np.ones((NY, NX))
    hte = 2.2e7 * (1.0 + 0.05 * np.sin(np.pi * j / NY)) * np.ones((NY, NX))
    ulat = np.deg2rad(20.0 + 50.0 * j / (NY - 1)) * np.ones((NY, NX))
    ulon = 2 * np.pi * (i + 1) / NX * np.ones((NY, NX))
    kmt = np.full((NY, NX), KM, dtype=np.int32)
    kmt[:2, :] = 0                       # southern land cap
    kmt[4:6, 5:9] = 0                    # island
    kmt[6, 20:23] = 3                    # shelf
    kmt[3, :] = np.where((np.arange(NX) % 7) == 0, 2, KM)  # rough topo
    return {"ULAT": ulat, "ULON": ulon, "HTN": htn, "HTE": hte,
            "HUS": hte.copy(), "HUW": htn.copy(), "ANGLE": np.zeros((NY, NX)),
            "KMT": kmt}


def _mirror(raw):
    """Doubled-grid arrays: rows 0..NY-1 plus fold images of rows NY-n /
    NY-1-n per field location."""
    nyd = 2 * NY - 1
    out = {}
    spec = {"ULAT": ("necorner", 1), "ULON": ("necorner", 1),
            "HTN": ("nface", 1), "HUW": ("nface", 1),
            "HTE": ("eface", 1), "HUS": ("eface", 1),
            "ANGLE": ("necorner", 1), "KMT": ("center", 1)}
    for name, arr in raw.items():
        loc, sign = spec[name]
        d = np.zeros((nyd, NX), dtype=arr.dtype)
        d[:NY] = arr
        for n in range(1, NY):
            jd = NY - 1 + n
            if loc == "center":
                d[jd] = sign * _rev_center(arr[NY - n])
            elif loc == "necorner":
                d[jd] = sign * _rev_corner(arr[NY - 1 - n])
            elif loc == "eface":
                d[jd] = sign * _rev_corner(arr[NY - n])
            elif loc == "nface":
                d[jd] = sign * _rev_center(arr[NY - 1 - n])
        out[name] = d
    return out


def _write(tmp_path, tag, raw):
    hg = str(tmp_path / f"hg_{tag}")
    tp = str(tmp_path / f"topo_{tag}")
    vg = str(tmp_path / f"vg_{tag}")
    grid_files.write_horiz_grid(hg, raw)
    grid_files.write_topography(tp, raw["KMT"])
    grid_files.write_vert_grid(vg, np.full(KM, 5.0e4))
    return hg, vg, tp


def _cfg(ny, ns, files, **kw):
    hg, vg, tp = files
    base = dict(nx=NX, ny=ny, km=KM, ns_boundary=ns,
                horiz_grid="file", horiz_grid_file=hg,
                vert_grid="file", vert_grid_file=vg,
                topography="file", topography_file=tp,
                time=TimeConfig(dt_option="seconds", dt_count=1800.0,
                                time_mix_opt="robert"))
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def grids(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tripole")
    raw = _half_raw()
    half_files = _write(tmp, "half", raw)
    dbl_files = _write(tmp, "dbl", _mirror(raw))
    return half_files, dbl_files


def _compare_grid_fields(gh, gd, fields, atol=1e-9):
    for name in fields:
        a = np.asarray(getattr(gh, name))[..., :NY, :]
        b = np.asarray(getattr(gd, name))[..., :NY, :]
        np.testing.assert_allclose(
            a, b, rtol=1e-12, atol=atol * max(1.0, np.abs(b).max()),
            err_msg=name)


def test_grid_construction_matches(grids):
    half_files, dbl_files = grids
    gh = build_grid(_cfg(NY, "tripole", half_files))
    gd = build_grid(_cfg(2 * NY - 1, "closed", dbl_files))
    _compare_grid_fields(gh, gd, [
        "DXU", "DYU", "DXT", "DYT", "HTN", "HTE", "UAREA", "TAREA",
        "KMT", "KMU", "KMTN", "KMTE", "AUN", "AUNE",
        "DTN", "DTS", "DTE", "DTW", "DUN", "DUS", "DUE", "DUW", "DUC",
        "DMN", "DMS", "DME", "DMW", "DMC", "DUM", "KXU", "KYU",
        "HT", "HU", "kmask_t", "kmask_u",
        "btrop_ne", "btrop_n", "btrop_e", "btrop_c_indep",
    ], atol=1e-12)


def _perturbed_models(grids, **phys):
    half_files, dbl_files = grids
    ch = _cfg(NY, "tripole", half_files, **phys)
    cd = _cfg(2 * NY - 1, "closed", dbl_files, **phys)
    mh, md = Model(ch), Model(cd)
    # zero wind so forcing is trivially fold-consistent
    zf = jnp.zeros_like(mh.forcing.smf)
    fh = mh.forcing.replace(smf=zf, smft=zf)
    zfd = jnp.zeros_like(md.forcing.smf)
    fd = md.forcing.replace(smf=zfd, smft=zfd)

    rng = np.random.default_rng(7)
    pert = 0.5 * rng.standard_normal((KM, NY, NX))
    pert_d = np.zeros((KM, 2 * NY - 1, NX))
    pert_d[:, :NY] = pert
    for n in range(1, NY):
        pert_d[:, NY - 1 + n] = pert[:, NY - n, ::-1]

    sh = mh.initial_state()
    sd = md.initial_state()

    def add_pert(st, grid, p):
        t = st.tracer_cur.at[0].add(jnp.where(grid.kmask_t, p, 0.0))
        return st.replace(tracer_cur=t, tracer_old=t,
                          rho_cur=st.rho_cur, rho_old=st.rho_old)

    sh = add_pert(sh, mh.grid, jnp.asarray(pert))
    sd = add_pert(sd, md.grid, jnp.asarray(pert_d))
    return mh, md, sh, sd, fh, fd


def _run_compare(grids, nsteps=4, tol=1e-8, **phys):
    mh, md, sh, sd, fh, fd = _perturbed_models(grids, **phys)
    for _ in range(nsteps):
        sh, _ = mh.advance(sh, forcing=fh)
        sd, _ = md.advance(sd, forcing=fd)
    for name in ("tracer_cur", "u_cur", "v_cur", "psurf_cur",
                 "ubtrop_cur", "rho_cur"):
        a = np.asarray(getattr(sh, name))
        b = np.asarray(getattr(sd, name))[..., :NY, :]
        scale = np.abs(b).max() + 1e-30
        np.testing.assert_allclose(a, b, rtol=0, atol=tol * scale,
                                   err_msg=name)
    # the doubled run itself must stay fold-symmetric (sanity)
    td = np.asarray(sd.tracer_cur[0])
    for n in range(1, NY - 1):
        np.testing.assert_allclose(td[:, NY - 1 + n], td[:, NY - n, ::-1],
                                   atol=1e-9 * (np.abs(td).max() + 1))


def test_model_evolution_matches_basic(grids):
    """del2 + centered advection + constant vmix."""
    _run_compare(grids)


def test_model_evolution_matches_upwind3(grids):
    _run_compare(grids, tadvect="upwind3")


def test_model_evolution_matches_gm_kpp(grids):
    _run_compare(grids, hmix_tracer="gm", vmix="kpp", nsteps=3, tol=1e-7)


def test_model_evolution_matches_aniso(grids):
    _run_compare(grids, hmix_momentum="aniso", lvariable_hmix_aniso=False,
                 visc_para=5.0e6, visc_perp=1.0e6, aniso_alignment="east",
                 nsteps=3, tol=1e-7)
