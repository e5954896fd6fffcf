"""Ecosystem (BGC) package tests: stoichiometric conservation of the
interior sources, light/nutrient limitation behavior, particle-remin
closure, and an end-to-end coupled run."""

import numpy as np
import jax.numpy as jnp
import pytest

from pop2_tpu import ecosys
from pop2_tpu.config import get_config
from pop2_tpu.grid import build_grid
from pop2_tpu.ecosys import IDX, Ecosystem, Q_N_C, Q_P_C, Q_SI_C
from pop2_tpu import constants as const
from pop2_tpu.forcing import analytic_forcing


@pytest.fixture(scope="module")
def ecfg():
    # the mini grid's uniform 687-m layers extinguish the light field in the
    # surface cell; use the stretched internal vertical grid (25-m surface
    # layer) so the photic zone is resolved
    names = ecosys.TRACER_NAMES
    return get_config("mini").with_(nt=2 + len(names), km=20,
                                    vert_grid="internal",
                                    passive_tracers=("ecosys",))


@pytest.fixture(scope="module")
def egrid(ecfg):
    return build_grid(ecfg)


def _setup(ecfg, egrid, lburial=False):
    # lburial=False keeps the strict conservation assertions; the burial
    # partition has its own test below
    pkg = Ecosystem(lburial=lburial)
    pkg.slot0 = 2
    vals = pkg.init_values(ecfg, egrid)
    km, ny, nx = ecfg.km, ecfg.ny, ecfg.nx
    ts = np.zeros((ecfg.nt, km, ny, nx))
    zt = np.asarray(egrid.vgrid.zt)[:, None, None] * 0.01
    ts[0] = (20.0 - 15.0 * zt / zt[-1]) * np.asarray(egrid.kmask_t)
    ts[1] = 0.0347
    ts[2:] = vals
    forcing = analytic_forcing(ecfg, egrid)
    return pkg, jnp.asarray(ts), forcing


def _col_integral(egrid, field):
    dz = np.asarray(egrid.vgrid.dz)[:, None, None]
    kmask = np.asarray(egrid.kmask_t)
    area = np.asarray(egrid.TAREA)
    return float((np.asarray(field) * dz * kmask * area[None]).sum())


def test_interior_conserves_elements(ecfg, egrid):
    """Interior sources must conserve N, P, Si and C (up to the documented
    Fe scavenging loss): the stacked tendencies' volume integrals vanish
    for each conserved element."""
    pkg, ts, forcing = _setup(ecfg, egrid)
    src = pkg.set_interior(ecfg, egrid, ts, ts, forcing=forcing)
    src = np.asarray(src)
    assert np.isfinite(src).all()

    def tot(*terms):
        return sum(_col_integral(egrid, t) for t in terms)

    # phosphorus (no fixation path; N gains mass through diazotrophs):
    # explicit phyto P pools (variable quotas) + Redfield zooplankton
    p_total = tot(src[IDX["PO4"]]
                  + src[IDX["spP"]] + src[IDX["diatP"]] + src[IDX["diazP"]]
                  + Q_P_C * src[IDX["zooC"]]
                  + src[IDX["DOP"]] + src[IDX["DOPr"]])
    # P is conserved except the sinking-POC pool which remineralizes in
    # the column (closed) -> integral must vanish
    scale = tot(np.abs(src[IDX["PO4"]])) + 1e-30
    assert abs(p_total) < 1e-6 * scale

    # silicon: SiO3 + diatSi closed (sinking opal remineralizes in column)
    si_total = tot(src[IDX["SiO3"]] + src[IDX["diatSi"]])
    si_scale = tot(np.abs(src[IDX["SiO3"]])) + 1e-30
    assert abs(si_total) < 1e-6 * si_scale

    # carbon: DIC + DOC (+ refractory) + organic C + CaCO3 closed
    c_total = tot(src[IDX["DIC"]] + src[IDX["DOC"]] + src[IDX["DOCr"]]
                  + src[IDX["spC"]]
                  + src[IDX["diatC"]] + src[IDX["diazC"]]
                  + src[IDX["zooC"]] + src[IDX["spCaCO3"]])
    c_scale = tot(np.abs(src[IDX["DIC"]])) + 1e-30
    assert abs(c_total) < 1e-6 * c_scale
    # the ALT_CO2 pair mirrors DIC/ALK in the interior exactly
    np.testing.assert_array_equal(src[IDX["DIC_ALT_CO2"]], src[IDX["DIC"]])
    np.testing.assert_array_equal(src[IDX["ALK_ALT_CO2"]], src[IDX["ALK"]])


def test_denitrification_in_low_oxygen(ecfg, egrid):
    """Where O2 is depleted, remineralization consumes NO3 (denitrification,
    MARBL 136:16 C:N); in oxygenated water it does not."""
    pkg, ts, forcing = _setup(ecfg, egrid)
    kmask = np.asarray(egrid.kmask_t)
    # oxygenated control
    src_ox = np.asarray(pkg.set_interior(ecfg, egrid, ts, ts,
                                         forcing=forcing))
    # anoxic: strip O2 everywhere
    ts_anox = ts.at[2 + IDX["O2"]].set(0.0)
    src_ax = np.asarray(pkg.set_interior(ecfg, egrid, ts_anox, ts_anox,
                                         forcing=forcing))
    deep = kmask[5:] > 0  # below the photic zone: remin dominates
    # anoxia moves the NO3 tendency down (denitrification sink)
    assert (src_ax[IDX["NO3"]][5:][deep].mean()
            < src_ox[IDX["NO3"]][5:][deep].mean())
    # and O2 consumption shuts off
    assert src_ax[IDX["O2"]][5:][deep].min() >= -1e-20


def test_ligand_limits_fe_scavenging(ecfg, egrid):
    """Fe beyond the ligand capacity scavenges much faster than bound Fe
    (the point of carrying an explicit Lig tracer)."""
    pkg, ts, forcing = _setup(ecfg, egrid)
    kmask = np.asarray(egrid.kmask_t)
    fe_hi = 1.5
    # well-ligated: Lig > Fe
    ts_b = ts.at[2 + IDX["Fe"]].set(fe_hi * kmask)
    ts_b = ts_b.at[2 + IDX["Lig"]].set(10.0 * kmask)
    src_b = np.asarray(pkg.set_interior(ecfg, egrid, ts_b, ts_b,
                                        forcing=forcing))
    # ligand-starved: same Fe, no ligand
    ts_f = ts.at[2 + IDX["Fe"]].set(fe_hi * kmask)
    ts_f = ts_f.at[2 + IDX["Lig"]].set(0.0)
    src_f = np.asarray(pkg.set_interior(ecfg, egrid, ts_f, ts_f,
                                        forcing=forcing))
    deep = kmask[5:] > 0
    assert (src_f[IDX["Fe"]][5:][deep].mean()
            < src_b[IDX["Fe"]][5:][deep].mean())


def test_variable_p_quota_tracks_po4(ecfg, egrid):
    """P uptake per unit C growth rises with ambient PO4 (PquotaSlope
    model): the PO4 drawdown per fixed C fixation is larger in P-rich
    water."""
    from pop2_tpu.ecosys import PQ_INT, PQ_SLOPE, PQ_MIN, PQ_MAX
    lo = np.clip(PQ_INT + PQ_SLOPE * 0.05, PQ_MIN, PQ_MAX)
    hi = np.clip(PQ_INT + PQ_SLOPE * 2.0, PQ_MIN, PQ_MAX)
    assert hi > lo
    assert PQ_MIN <= lo <= PQ_MAX


def test_growth_in_light_only(ecfg, egrid):
    """Photosynthesis requires light: with zero shortwave, phytoplankton
    tendencies are non-positive everywhere (losses only)."""
    pkg, ts, forcing = _setup(ecfg, egrid)
    dark = forcing.replace(shf_qsw=jnp.zeros_like(forcing.shf_qsw))
    src = np.asarray(pkg.set_interior(ecfg, egrid, ts, ts, forcing=dark))
    for p in ("spC", "diatC", "diazC"):
        assert src[IDX[p]].max() <= 1e-20

    lit = forcing.replace(
        shf_qsw=jnp.full_like(forcing.shf_qsw, 200.0 * const.HFLUX_FACTOR))
    src_l = np.asarray(pkg.set_interior(ecfg, egrid, ts, ts, forcing=lit))
    kmask = np.asarray(egrid.kmask_t)
    assert (src_l[IDX["spC"]][0] * kmask[0]).max() > 0  # surface growth
    # growth consumes nutrients at the surface
    assert (src_l[IDX["NO3"]][0] * kmask[0]).min() < 0
    assert (src_l[IDX["PO4"]][0] * kmask[0]).min() < 0


def test_oxygen_tracks_carbon(ecfg, egrid):
    pkg, ts, forcing = _setup(ecfg, egrid)
    lit = forcing.replace(
        shf_qsw=jnp.full_like(forcing.shf_qsw, 200.0 * const.HFLUX_FACTOR))
    src = np.asarray(pkg.set_interior(ecfg, egrid, ts, ts, forcing=lit))
    kmask = np.asarray(egrid.kmask_t)
    surf = kmask[0]
    # surface: net production -> O2 source where DIC sink
    prod = (src[IDX["DIC"]][0] < 0) & surf
    assert (src[IDX["O2"]][0][prod] > 0).all()


def test_sink_remin_closure(ecfg, egrid):
    """The sinking-particle scan conserves the columnwise integral."""
    km, ny, nx = ecfg.km, ecfg.ny, ecfg.nx
    rng = np.random.RandomState(3)
    kmask = np.asarray(egrid.kmask_t)
    prod = jnp.asarray(np.abs(rng.randn(km, ny, nx)) * kmask / 86400.0)
    dz3 = jnp.reshape(egrid.vgrid.dz, (km, 1, 1))
    kidx = np.arange(1, km + 1)[:, None, None]
    at_bottom = jnp.asarray(kidx == np.asarray(egrid.KMT)[None])
    remin, burial = ecosys._sink_remin(prod, dz3, jnp.asarray(kmask),
                                       at_bottom, ecosys.POC_LENGTH)
    dz = np.asarray(egrid.vgrid.dz)[:, None, None]
    colp = (np.asarray(prod) * dz * kmask).sum(axis=0)
    colr = (np.asarray(remin) * dz * kmask).sum(axis=0)
    assert np.asarray(burial).max() == 0.0
    np.testing.assert_allclose(colr, colp, rtol=1e-12, atol=1e-25)

    # Dunne burial: column remin + burial flux still closes the budget,
    # burial is positive over ocean floors and bounded by the Dunne
    # efficiency ceiling
    remin_b, burial_b = ecosys._sink_remin(
        prod, dz3, jnp.asarray(kmask), at_bottom, ecosys.POC_LENGTH,
        bury="dunne")
    colr_b = (np.asarray(remin_b) * dz * kmask).sum(axis=0)
    np.testing.assert_allclose(colr_b + np.asarray(burial_b), colp,
                               rtol=1e-10, atol=1e-22)
    ocean = np.asarray(egrid.KMT) > 0
    assert (np.asarray(burial_b)[ocean] >= 0.0).all()
    assert np.asarray(burial_b)[ocean].max() > 0.0


def test_burial_reduces_column_carbon(ecfg, egrid):
    """With lburial=True (the MARBL-parity default) the interior carbon
    budget loses exactly the buried share: the total-C tendency integral
    is negative, small relative to gross rates, and turning burial off
    restores closure."""
    pkg, ts, forcing = _setup(ecfg, egrid, lburial=True)
    src = np.asarray(pkg.set_interior(ecfg, egrid, ts, ts,
                                      forcing=forcing))

    def tot(*terms):
        return sum(_col_integral(egrid, t) for t in terms)

    c_total = tot(src[IDX["DIC"]] + src[IDX["DOC"]] + src[IDX["DOCr"]]
                  + src[IDX["spC"]] + src[IDX["diatC"]]
                  + src[IDX["diazC"]] + src[IDX["zooC"]]
                  + src[IDX["spCaCO3"]])
    c_scale = tot(np.abs(src[IDX["DIC"]]))
    assert c_total < 0.0                       # burial removes carbon
    assert abs(c_total) < 0.5 * c_scale        # a minor share of turnover
    # silicon burial likewise
    si_total = tot(src[IDX["SiO3"]] + src[IDX["diatSi"]])
    assert si_total < 0.0


def test_surface_fluxes(ecfg, egrid):
    pkg, ts, forcing = _setup(ecfg, egrid)
    f = forcing.replace(
        u10_sqr=jnp.full((ecfg.ny, ecfg.nx), 64.0e4))  # (8 m/s)^2 cm^2/s^2
    flux = np.asarray(pkg.set_sflux(ecfg, egrid, ts, ts, forcing=f))
    assert np.isfinite(flux).all()
    mask = np.asarray(egrid.RCALCT) > 0
    assert (flux[IDX["Fe"]][mask] > 0).all()          # dust deposition
    # O2 near saturation initially -> small flux; push undersaturation
    ts2 = ts.at[2 + IDX["O2"], 0].set(100.0)
    flux2 = np.asarray(pkg.set_sflux(ecfg, egrid, ts2, ts2, forcing=f))
    assert (flux2[IDX["O2"]][mask] > 0).all()         # ingassing
    assert np.abs(flux2[IDX["DIC"]][mask]).max() > 0  # CO2 exchange active


def test_ecosys_model_end_to_end(ecfg):
    """Coupled run: 10 steps with the full ecosystem; everything finite,
    tracers stay non-negative (reset), phytoplankton survive."""
    from pop2_tpu.model import Model
    m = Model(ecfg)
    st = m.initial_state()
    st = m.run(st, nsteps=10)
    tr = np.asarray(st.tracer_cur)
    assert np.isfinite(tr).all()
    eco = tr[2:]
    assert eco.min() >= 0.0
    assert eco[IDX["spC"]].max() > 0.0
    m.check_ke(st)
