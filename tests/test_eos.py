"""EOS tests against the reference's published test value
(source/state_mod.F90:412-414)."""

import jax.numpy as jnp
import numpy as np

from pop2_tpu import eos


def test_mwjf_reference_value():
    # rho = 1.033213242 g/cm^3 at S=35 PSU, theta=20 C, pressz=200 bars
    rho = eos.mwjf_rho(jnp.array(20.0), jnp.array(0.035), jnp.array(200.0))
    # the reference quotes 1.033213242 (source/state_mod.F90:414) and
    # 1.033213387 (source/state_mod.F90:786) for the same inputs; accept the
    # half-ppm band spanning both
    np.testing.assert_allclose(float(rho), 1.033213242, atol=5e-7)


def test_mwjf_surface_fresh():
    # fresh water at 4C, p=0: density ~ 1.000 g/cm^3
    rho = eos.mwjf_rho(jnp.array(4.0), jnp.array(0.0), jnp.array(0.0))
    np.testing.assert_allclose(float(rho), 1.0000, atol=5e-4)


def test_mwjf_derivatives_match_finite_difference():
    T, S, p = 10.0, 0.034, 100.0
    rho, drdt, drds = eos.mwjf_rho(jnp.array(T), jnp.array(S), jnp.array(p),
                                   want_drhodt=True, want_drhods=True)
    import jax
    ad_t = float(jax.grad(lambda t: eos.mwjf_rho(t, jnp.array(S),
                                                 jnp.array(p)))(jnp.array(T)))
    ad_s = float(jax.grad(lambda s: eos.mwjf_rho(jnp.array(T), s,
                                                 jnp.array(p)))(jnp.array(S)))
    np.testing.assert_allclose(float(drdt), ad_t, rtol=1e-12)
    np.testing.assert_allclose(float(drds), ad_s, rtol=1e-12)


def test_state_3d_shapes(test_cfg, test_grid):
    km, ny, nx = test_cfg.km, test_cfg.ny, test_cfg.nx
    T = jnp.full((km, ny, nx), 10.0)
    S = jnp.full((km, ny, nx), 0.0347)
    rho = eos.state(test_cfg, test_grid.vgrid.pressz, T, S)
    assert rho.shape == (km, ny, nx)
    r = np.asarray(rho)
    # density increases with depth at fixed T,S (pressure effect)
    assert np.all(np.diff(r[:, 60, 60]) > 0)


def test_ts_range_build(test_grid):
    tsr = eos.build_ts_range(np.asarray(test_grid.vgrid.zt), jnp.float64)
    assert float(tsr.tmax[0, 0, 0]) == 29.0
    assert float(tsr.smin[0, 0, 0]) == 28.5e-3


def test_jmcd_unesco_surface_values():
    """At p=0 the JMcD EOS reduces to the UNESCO-1983 surface density, whose
    published check values are rho(S=0,T=5)=999.96675 and
    rho(S=35,T=5)=1027.67547 kg/m^3 (source/state_mod.F90:97-122)."""
    r0 = eos.jmcd_rho(jnp.array(5.0), jnp.array(0.0), jnp.array(0.0))
    r35 = eos.jmcd_rho(jnp.array(5.0), jnp.array(0.035), jnp.array(0.0))
    np.testing.assert_allclose(float(r0), 0.99996675, atol=1e-8)
    np.testing.assert_allclose(float(r35), 1.02767547, atol=1e-8)


def test_jmcd_derivatives_match_autodiff():
    import jax
    T, S, p = 10.0, 0.034, 100.0
    rho, drdt, drds = eos.jmcd_rho(jnp.array(T), jnp.array(S), jnp.array(p),
                                   want_drhodt=True, want_drhods=True)
    ad_t = float(jax.grad(lambda t: eos.jmcd_rho(t, jnp.array(S),
                                                 jnp.array(p)))(jnp.array(T)))
    ad_s = float(jax.grad(lambda s: eos.jmcd_rho(jnp.array(T), s,
                                                 jnp.array(p)))(jnp.array(S)))
    np.testing.assert_allclose(float(drdt), ad_t, rtol=1e-10)
    np.testing.assert_allclose(float(drds), ad_s, rtol=1e-10)


def test_jmcd_close_to_mwjf():
    """The two 'full' EOS fits agree to a few 0.01 kg/m^3 over the oceanic
    range (they fit the same UNESCO/Feistel data)."""
    for T, S, p in [(2.0, 0.0345, 300.0), (20.0, 0.035, 200.0),
                    (10.0, 0.034, 50.0), (0.0, 0.0347, 500.0)]:
        rj = float(eos.jmcd_rho(jnp.array(T), jnp.array(S), jnp.array(p)))
        rm = float(eos.mwjf_rho(jnp.array(T), jnp.array(S), jnp.array(p)))
        assert abs(rj - rm) < 5e-4, (T, S, p, rj, rm)


def test_jmcd_state_dispatch(test_cfg, test_grid):
    cfg = test_cfg.with_(state_choice="jmcd")
    km, ny, nx = cfg.km, cfg.ny, cfg.nx
    T = jnp.full((km, ny, nx), 8.0)
    S = jnp.full((km, ny, nx), 0.0348)
    rho, drdt, drds = eos.state(cfg, test_grid.vgrid.pressz, T, S,
                                want_drhodt=True, want_drhods=True)
    r = np.asarray(rho)
    assert np.all(np.diff(r[:, 60, 60]) > 0)   # compressibility
    assert np.all(np.asarray(drdt) < 0)        # warmer -> lighter at 8 C
    assert np.all(np.asarray(drds) > 0)        # saltier -> denser


def test_polynomial_eos_fits_unesco():
    """Bryan-Cox polynomial EOS (state_mod.F90:600-662 + init_state_coeffs
    :1168-1560): the per-level cubic fit must track the full UNESCO (1981)
    EOS within fit error over the level's sampled T/S range, with
    consistent analytic derivatives."""
    import jax.numpy as jnp
    from pop2_tpu.config import get_config
    from pop2_tpu.grid import build_grid

    cfg = get_config("mini").with_(state_choice="polynomial")
    grid = build_grid(cfg)
    pz = np.asarray(grid.vgrid.pressz)

    for k in (0, cfg.km - 1):
        p = float(pz[k])
        tg = np.linspace(0.0, 7.0, 9)
        sg = np.linspace(34.6, 35.0, 7)
        TG, SG = np.meshgrid(tg, sg, indexing="ij")
        sig = eos.unesco_rho(TG, SG, p)          # full kg/m^3
        th = eos.potem(TG, SG, p)
        r = eos.state(cfg, grid.vgrid.pressz[k:k + 1],
                      jnp.asarray(th)[None], jnp.asarray(SG * 1e-3)[None])
        got = np.asarray(r)[0]
        np.testing.assert_allclose(got, sig / 1000.0, atol=5e-6)

    # analytic derivatives vs finite differences
    rng = np.random.RandomState(0)
    T = jnp.asarray(2.0 + 4.0 * rng.rand(cfg.km, 4, 5))
    S = jnp.asarray(0.0346 + 0.0004 * rng.rand(cfg.km, 4, 5))
    rho, drdt, drds = eos.state(cfg, grid.vgrid.pressz, T, S,
                                want_drhodt=True, want_drhods=True)
    eps = 1e-4
    r_t = eos.state(cfg, grid.vgrid.pressz, T + eps, S)
    r_s = eos.state(cfg, grid.vgrid.pressz, T, S + eps * 1e-3)
    np.testing.assert_allclose(np.asarray((r_t - rho) / eps),
                               np.asarray(drdt), rtol=2e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray((r_s - rho) / (eps * 1e-3)),
                               np.asarray(drds), rtol=2e-3, atol=1e-9)


def test_polynomial_eos_model_steps():
    """The model steps stably under the polynomial EOS choice."""
    from pop2_tpu.config import get_config
    from pop2_tpu.model import Model

    cfg = get_config("mini").with_(state_choice="polynomial")
    m = Model(cfg)
    st = m.initial_state()
    for _ in range(3):
        st, _ = m.advance(st)
    assert np.isfinite(m.diagnostics(st)["KE"])
