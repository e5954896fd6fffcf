"""Tidally driven internal-wave mixing (St Laurent/Jayne formulation).

Reference: ``source/tidal_mixing.F90`` — tidal energy flux E(x,y) at the
bottom drives a diffusivity kappa = Gamma q E F(z) / (rho N^2) with the
St Laurent et al. 2002 exponential vertical redistribution F(z)
(init_tidal_mixing2 :1280-1310, tidal_form_coef_jayne :2512-2548); applied
in KPP interior mixing as an addition to the background diffusivity capped
at ``tidal_mix_max`` (vmix_kpp.F90:1755-1835, tidal_compute_diff
:3046-3140).

TPU-first: the time-invariant coefficient Gamma q E F(z) is a dense
(km, ny, nx) array built host-side; the per-step work is one fused
elementwise divide by N^2 inside ``ri_iwmix``.
"""

from __future__ import annotations

import numpy as np

from pop2_tpu import constants as const
from pop2_tpu.config import ModelConfig


def energy_flux(cfg: ModelConfig, grid) -> np.ndarray:
    """Tidal energy flux E(x,y) in W/m^2 at T points. From a POP-format
    binary record when ``tidal_energy_file`` is set
    (tidal_read_energy_jayne), else the constant ``tidal_energy_const``."""
    ny, nx = cfg.ny, cfg.nx
    if cfg.tidal_energy_file is not None:
        raw = np.fromfile(cfg.tidal_energy_file, dtype=">f8")
        if raw.size < ny * nx:
            raise ValueError("tidal_energy_file too small")
        return raw[:ny * nx].reshape(ny, nx).astype(np.float64)
    return np.full((ny, nx), cfg.tidal_energy_const)


def build_tidal_coef(cfg: ModelConfig, grid) -> np.ndarray:
    """TIDAL_COEF_3D = (Gamma/rho_fw) * q * E * F(z), masked to the ocean
    column, at interfaces k (0-based index k = interface below layer k).

    F(z): num_k = exp(-(HT - zw_k)/zeta) for k < KMT, 1 at k == KMT;
    denominator = sum_{k<KMT} num_k * dzw_k (init_tidal_mixing2
    :1280-1299). E is converted W/m^2 -> erg/s/cm^2 (*1000, :2231).
    """
    km = cfg.km
    zw = np.asarray(grid.vgrid.zw)          # (km,) interface depths (cm)
    dzw = np.asarray(grid.vgrid.dzw)        # (km+1,)
    HT = np.asarray(grid.HT)
    KMT = np.asarray(grid.KMT)
    RCALCT = np.asarray(grid.RCALCT)
    zeta = cfg.tidal_vertical_decay_scale

    kidx = np.arange(1, km + 1)[:, None, None]   # 1-based level
    num = np.exp(-(HT[None] - zw[:, None, None]) / zeta)
    interior = kidx < KMT[None]
    at_bottom = kidx == KMT[None]
    denom = np.sum(np.where(interior, num * dzw[1:km + 1, None, None], 0.0),
                   axis=0)
    denom = np.where(denom > 0.0, denom, 1.0)
    vert_func = np.where(interior | at_bottom,
                         np.where(at_bottom, 1.0, num) / denom, 0.0)

    qe = (cfg.tidal_local_mixing_fraction * 1000.0
          * energy_flux(cfg, grid))       # erg/s/cm^2
    gamma_rhor = cfg.tidal_mixing_efficiency / const.RHO_FW
    return gamma_rhor * RCALCT[None] * qe[None] * vert_func
