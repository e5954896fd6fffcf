"""Equation of state rho(Theta, S, p).

Reference: ``source/state_mod.F90``. Implemented TPU-first as pure elementwise
functions over whole (km, ny, nx) fields — a rational polynomial that XLA fuses
into neighboring stencil work (the reference evaluates it level-by-level per
block, source/state_mod.F90:258-683).

Types:
  * ``mwjf``  — McDougall, Wright, Jackett & Feistel 25-term rational EOS
                (source/state_mod.F90:418-498; test value rho=1.033213242
                g/cm^3 at S=35 PSU, theta=20 C, pressz=200 bars).
  * ``linear``— linear expansion about a reference state
                (source/state_mod.F90:664-672).

Units: T in degC, S in g/g (msu), p in bars; rho in g/cm^3.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from pop2_tpu.config import ModelConfig

P001 = 0.001

# MWJF numerator coefficients (source/state_mod.F90:173-185), with the
# kg/m^3 -> g/cm^3 conversion folded in
MWJF_NP0S0T0 = 9.99843699e+2 * P001
MWJF_NP0S0T1 = 7.35212840e+0 * P001
MWJF_NP0S0T2 = -5.45928211e-2 * P001
MWJF_NP0S0T3 = 3.98476704e-4 * P001
MWJF_NP0S1T0 = 2.96938239e+0 * P001
MWJF_NP0S1T1 = -7.23268813e-3 * P001
MWJF_NP0S2T0 = 2.12382341e-3 * P001
MWJF_NP1S0T0 = 1.04004591e-2 * P001
MWJF_NP1S0T2 = 1.03970529e-7 * P001
MWJF_NP1S1T0 = 5.18761880e-6 * P001
MWJF_NP2S0T0 = -3.24041825e-8 * P001
MWJF_NP2S0T2 = -1.23869360e-11 * P001

# MWJF denominator coefficients (source/state_mod.F90:189-202)
MWJF_DP0S0T0 = 1.0e+0
MWJF_DP0S0T1 = 7.28606739e-3
MWJF_DP0S0T2 = -4.60835542e-5
MWJF_DP0S0T3 = 3.68390573e-7
MWJF_DP0S0T4 = 1.80809186e-10
MWJF_DP0S1T0 = 2.14691708e-3
MWJF_DP0S1T1 = -9.27062484e-6
MWJF_DP0S1T3 = -1.78343643e-10
MWJF_DP0SQT0 = 4.76534122e-6
MWJF_DP0SQT2 = 1.63410736e-9
MWJF_DP1S0T0 = 5.30848875e-6
MWJF_DP2S0T3 = -3.03175128e-16
MWJF_DP3S0T1 = -1.27934137e-17

# linear EOS parameters (source/state_mod.F90:224-229)
T_LEOS_REF = 19.0
S_LEOS_REF = 0.035
RHO_LEOS_REF = 1.025022
LEOS_ALF = 2.55e-4
LEOS_BET = 7.64e-1

# T/S valid ranges per 250 m depth bin for range enforcement
# (source/state_mod.F90:1286-1336); S in ppt here, converted at build time.
TREFMIN = np.array([-2., -2., -2., -2., -1., -1., -1., -1., -1., -1., -1.,
                    -1., -1., -1., -1., -1., -1., -1., -1., 0., 0., 0., 0.,
                    0., 0., 0., 0., 0., 0., 0., 0., 0., 0.])
TREFMAX = np.array([29., 19., 14., 11., 9., 7., 7., 7., 7., 7., 7., 7., 7.,
                    7., 7., 7., 7., 7., 7., 7., 7., 7., 7., 7., 7., 7., 7.,
                    7., 7., 7., 7., 7., 7.])
SREFMIN = np.array([28.5, 33.7, 34.0, 34.1, 34.2, 34.4, 34.5, 34.5, 34.6,
                    34.6, 34.6, 34.6, 34.6, 34.6, 34.6, 34.6, 34.6, 34.6,
                    34.6, 34.6, 34.6, 34.6, 34.6, 34.7, 34.7, 34.7, 34.7,
                    34.7, 34.7, 34.7, 34.7, 34.7, 34.7])
SREFMAX = np.array([37.0, 36.6, 35.8, 35.7, 35.3, 35.1, 35.1, 35.0, 35.0,
                    35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0,
                    35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0, 35.0,
                    35.0, 35.0, 35.0, 35.0, 35.0, 35.0])


class TSRange(NamedTuple):
    """Per-level valid T/S ranges, shape (km, 1, 1) for broadcasting."""
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    smin: jnp.ndarray
    smax: jnp.ndarray


def build_ts_range(zt_cm: np.ndarray, dtype) -> TSRange:
    """Per-level ranges from the 250-m depth bins
    (source/state_mod.F90:1345-1351, conversion at :1131-1134)."""
    idx = np.minimum((np.asarray(zt_cm) * 0.01 / 250.0).astype(int), 32)
    shape = (-1, 1, 1)
    return TSRange(
        tmin=jnp.asarray(TREFMIN[idx].reshape(shape), dtype),
        tmax=jnp.asarray(TREFMAX[idx].reshape(shape), dtype),
        smin=jnp.asarray((SREFMIN[idx] * 1e-3).reshape(shape), dtype),
        smax=jnp.asarray((SREFMAX[idx] * 1e-3).reshape(shape), dtype),
    )


def _adjust_ts(cfg: ModelConfig, T, S, ts_range: Optional[TSRange]):
    if cfg.state_range_opt == "enforce" and ts_range is not None:
        TQ = jnp.clip(T, ts_range.tmin, ts_range.tmax)
        SQ = jnp.clip(S, ts_range.smin, ts_range.smax)
    else:
        # prevent garbage on land points (source/state_mod.F90:353-358)
        TQ = jnp.clip(T, -1000.0, 1000.0)
        SQ = jnp.clip(S, 0.0, 1000.0)
    return TQ, SQ


def mwjf_rho(T, S_msu, p_bars, want_drhodt: bool = False,
             want_drhods: bool = False):
    """MWJF density (g/cm^3) and optional dT/dS derivatives.

    ``p_bars`` broadcasts against T/S (pass (km,1,1) for 3-D fields).
    Follows source/state_mod.F90:418-498 term for term.
    """
    p = 10.0 * p_bars  # bars -> the dbar-like pressure in the fit
    TQ = T
    SQ = 1000.0 * S_msu
    SQR = jnp.sqrt(SQ)

    nums0t0 = MWJF_NP0S0T0 + p * (MWJF_NP1S0T0 + p * MWJF_NP2S0T0)
    nums0t1 = MWJF_NP0S0T1
    nums0t2 = MWJF_NP0S0T2 + p * (MWJF_NP1S0T2 + p * MWJF_NP2S0T2)
    nums0t3 = MWJF_NP0S0T3
    nums1t0 = MWJF_NP0S1T0 + p * MWJF_NP1S1T0
    nums1t1 = MWJF_NP0S1T1
    nums2t0 = MWJF_NP0S2T0

    work1 = (nums0t0 + TQ * (nums0t1 + TQ * (nums0t2 + nums0t3 * TQ))
             + SQ * (nums1t0 + nums1t1 * TQ + nums2t0 * SQ))

    dens0t0 = MWJF_DP0S0T0 + p * MWJF_DP1S0T0
    dens0t1 = MWJF_DP0S0T1 + p ** 3 * MWJF_DP3S0T1
    dens0t2 = MWJF_DP0S0T2
    dens0t3 = MWJF_DP0S0T3 + p ** 2 * MWJF_DP2S0T3
    dens0t4 = MWJF_DP0S0T4
    dens1t0 = MWJF_DP0S1T0
    dens1t1 = MWJF_DP0S1T1
    dens1t3 = MWJF_DP0S1T3
    densqt0 = MWJF_DP0SQT0
    densqt2 = MWJF_DP0SQT2

    work2 = (dens0t0 + TQ * (dens0t1 + TQ * (dens0t2
             + TQ * (dens0t3 + dens0t4 * TQ)))
             + SQ * (dens1t0 + TQ * (dens1t1 + TQ * TQ * dens1t3)
                     + SQR * (densqt0 + TQ * TQ * densqt2)))
    denomk = 1.0 / work2
    rho = work1 * denomk

    out = [rho]
    if want_drhodt:
        work3 = (nums0t1 + TQ * (2.0 * nums0t2 + 3.0 * nums0t3 * TQ)
                 + nums1t1 * SQ)
        work4 = (dens0t1 + SQ * dens1t1
                 + TQ * (2.0 * (dens0t2 + SQ * SQR * densqt2)
                         + TQ * (3.0 * (dens0t3 + SQ * dens1t3)
                                 + TQ * 4.0 * dens0t4)))
        out.append((work3 - work1 * denomk * work4) * denomk)
    if want_drhods:
        work3 = nums1t0 + nums1t1 * TQ + 2.0 * nums2t0 * SQ
        work4 = (dens1t0 + TQ * (dens1t1 + TQ * TQ * dens1t3)
                 + 1.5 * SQR * (densqt0 + TQ * TQ * densqt2))
        out.append((work3 - work1 * denomk * work4) * denomk * 1000.0)
    return tuple(out) if len(out) > 1 else out[0]


def linear_rho(T, S_msu, want_drhodt: bool = False,
               want_drhods: bool = False):
    """Linear EOS (source/state_mod.F90:664-672); returns full density."""
    rho = (RHO_LEOS_REF + LEOS_BET * (S_msu - S_LEOS_REF)
           - LEOS_ALF * (T - T_LEOS_REF))
    out = [rho]
    if want_drhodt:
        out.append(jnp.full_like(rho, -LEOS_ALF))
    if want_drhods:
        out.append(jnp.full_like(rho, LEOS_BET))
    return tuple(out) if len(out) > 1 else out[0]


def state(cfg: ModelConfig, pressz, T, S, ts_range: Optional[TSRange] = None,
          want_drhodt: bool = False, want_drhods: bool = False):
    """rho (and optional derivatives) for full 3-D (km, ny, nx) fields.

    ``pressz`` is the per-level reference pressure (bars), shape (km,) — the
    displaced-parcel variant (k != kk) is available by passing a different
    pressure profile.
    """
    p = jnp.reshape(pressz, (-1, 1, 1))
    TQ, SQ = _adjust_ts(cfg, T, S, ts_range)
    if cfg.state_choice == "mwjf":
        return mwjf_rho(TQ, SQ, p, want_drhodt, want_drhods)
    if cfg.state_choice == "linear":
        return linear_rho(TQ, SQ, want_drhodt, want_drhods)
    raise NotImplementedError(cfg.state_choice)


def state_at_level(cfg: ModelConfig, press_bars, T, S,
                   ts_range_k: Optional[tuple] = None):
    """rho for a single level/field displaced to pressure ``press_bars``
    (used by convective adjustment's k -> k+1 displacement,
    source/vertical_mix.F90:1955-1958)."""
    if ts_range_k is not None:
        tmin, tmax, smin, smax = ts_range_k
        T = jnp.clip(T, tmin, tmax)
        S = jnp.clip(S, smin, smax)
    else:
        T = jnp.clip(T, -1000.0, 1000.0)
        S = jnp.clip(S, 0.0, 1000.0)
    if cfg.state_choice == "mwjf":
        return mwjf_rho(T, S, press_bars)
    if cfg.state_choice == "linear":
        return linear_rho(T, S)
    raise NotImplementedError(cfg.state_choice)
