"""Production-configuration assembly.

``get_config('prod_full')`` carries the IO-free part of the reference's
gx1v7 default physics menu; this module attaches the pieces that come
from the reference's in-tree input files (``input_templates/``): the real
overflow geometry (Denmark Strait / Faroe Bank Channel / Ross Sea /
Weddell Sea with kmt pop-ups, region boxes, and sidewall orientations)
and the real 60-level vertical grid.

Reference: bld/namelist_files/namelist_defaults_pop.xml (defaults),
input_templates/gx1v7_overflow, input_templates/gx1v7_vert_grid.
"""

from __future__ import annotations

import os

from pop2_tpu.config import ModelConfig, get_config

REF_TEMPLATES = "/root/reference/input_templates"


def get_production_config(name: str = "prod_full",
                          templates: str = REF_TEMPLATES,
                          **overrides) -> ModelConfig:
    """The flagship configuration with the reference's real auxiliary
    input data attached when available (falls back to the IO-free preset
    when the reference tree is absent)."""
    cfg = get_config(name)
    if os.path.isdir(templates):
        from pop2_tpu.io import input_templates as it
        vg = os.path.join(templates, "gx1v7_vert_grid")
        if cfg.km == 60 and os.path.exists(vg):
            cfg = cfg.with_(vert_grid="file", vert_grid_file=vg)
        ovf = os.path.join(templates, "gx1v7_overflow")
        if (cfg.nx, cfg.ny) == (320, 384) and os.path.exists(ovf):
            cfg = cfg.with_(overflows=it.read_overflows(ovf))
    if overrides:
        cfg = cfg.with_(**overrides)
    return cfg
