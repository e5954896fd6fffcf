"""tx0.1v3 feasibility smoke (SURVEY.md section 7.2 step 5, round-3
verdict item 9): build the full 3600x2400x62 grid through the file-grid
readers, check its invariants, exercise a surface-level compute at full
size, and assert the per-chip memory plan for the production meshes."""

import numpy as np
import pytest

from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.gridgen import generate_gx_files

NX, NY, KM = 3600, 2400, 62


@pytest.mark.slow
def test_tx01_grid_builds_and_memory_plan(tmp_path):
    import os
    ref_vert = "/root/reference/input_templates/tx0.1v3_vert_grid"
    files = generate_gx_files(str(tmp_path), nx=NX, ny=NY, km=KM)
    cfg = get_config("tx0.1v3").with_(
        horiz_grid_file=files["horiz"],
        topography_file=files["topo"],
        vert_grid="file",
        vert_grid_file=(ref_vert if os.path.exists(ref_vert)
                        else files["vert"]),
        dtype="float32")
    grid = build_grid(cfg)

    kmt = np.asarray(grid.KMT)
    assert kmt.shape == (NY, NX)
    frac = (kmt > 0).mean()
    assert 0.4 < frac < 0.9, f"ocean fraction {frac}"
    assert kmt.max() == KM
    zw = np.asarray(grid.vgrid.zw)
    assert 5.0e5 < zw[-1] < 7.0e5

    # full-size surface-level compute: MWJF EOS over the 8.6M-point
    # surface (the per-level building block of the 3-D step)
    import jax.numpy as jnp
    from pop2_tpu import eos
    T = jnp.asarray(28.0 * np.cos(np.asarray(grid.TLAT)) ** 2
                    * (kmt > 0), jnp.float32)
    S = jnp.full_like(T, 0.0347)
    rho = eos.mwjf_rho(T, S, float(grid.vgrid.pressz[0]))
    rho = np.asarray(rho)
    ocean = kmt > 0
    assert np.isfinite(rho[ocean]).all()
    assert 0.99 < rho[ocean].min() < rho[ocean].max() < 1.05

    # ---- per-chip memory plan (BASELINE.md tx0.1 note) -------------------
    # prognostic state: 2-level tracers (nt>=2) + u/v/rho pairs (3-D) +
    # 2-D surface-pressure family; working set ~ 3x state for the fused
    # step (operands + tendencies + solver scratch)
    nt = 2
    bytes_per = 4  # fp32 fast mode
    f3d = NX * NY * KM * bytes_per
    state_3d = (2 * nt + 6) * f3d              # tracer/u/v/rho x 2 levels
    grid_3d = 2 * f3d                          # kmask_t/u (as bytes upper bd)
    total = 3 * state_3d + grid_3d
    for mesh, hbm_gb in (((8, 4), 16), ((16, 8), 16)):
        per_chip = total / (mesh[0] * mesh[1])
        assert per_chip < hbm_gb * 1e9 * 0.8, (
            f"mesh {mesh}: {per_chip/1e9:.1f} GB/chip exceeds 80% of "
            f"{hbm_gb} GB HBM")
    # single chip does NOT fit - the scale-out mesh is required
    assert total > 16e9


@pytest.mark.slow
def test_tx01_steps_on_sharded_mesh(tmp_path):
    """tx0.1 STEPPING smoke (round-4 verdict item 8): step the model at
    the full tx0.1 horizontal dims (3600x2400) with reduced km on the
    8-device CPU mesh — partial bottom cells, del4 mixing, KPP, tripole,
    the preset's own physics — and require finite, land-masked results.
    Reduced km keeps the working set ~5 GB; the horizontal dims, the
    sharding, and the PBC code paths are the things being smoked."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    from pop2_tpu.model import Model
    from pop2_tpu.parallel import mesh as pmesh

    km = 5
    files = generate_gx_files(str(tmp_path), nx=NX, ny=NY, km=km)
    cfg = get_config("tx0.1v3").with_(
        km=km,
        horiz_grid_file=files["horiz"],
        topography_file=files["topo"],
        vert_grid="file", vert_grid_file=files["vert"],
        dtype="float32", mesh_shape=(8, 1))
    m, mesh = pmesh.sharded_model(cfg)
    assert m.grid.DZT is not None          # PBC active (tx0.1 mandatory)
    st = pmesh.shard_pytree(m.initial_state(), mesh)
    for _ in range(2):
        st, d = m.advance(st)
    ke = m.diagnostics(st)["KE"]
    assert np.isfinite(ke)
    sample = np.asarray(st.tracer_cur[0, 0, ::100, ::100])
    assert np.isfinite(sample).all()
    kmt = np.asarray(m.grid.KMT[::100, ::100])
    assert (np.asarray(st.u_cur[0, ::100, ::100])[kmt == 0] == 0.0).all()
