#!/usr/bin/env python
"""Performance benchmark: steady-state step throughput on whatever
accelerator JAX finds (the driver runs this on one real TPU chip).

Flagship configuration: ``prod_full`` — the gx1v7-shaped production-physics
menu the reference runs in production (320x384x60 tripole, KPP + GM +
anisotropic viscosity + penetrating shortwave + frazil ice + 2 passive
tracers; cime_config/config_pes.xml:411, input_templates/
gx1v7_domain_size.F90). The light ``prod`` configuration (384x256x40,
const vmix + del2 + centered advection) is reported alongside in detail —
it isolates the dynamical-core cost the fused kernels target.

Metric: grid-points/s/chip = nx*ny*km * steps/s on the flagship config
(BASELINE.md; the reference publishes no numbers — BASELINE.json
"published": {} — so vs_baseline is the ratio against the first recorded
value of this same metric, 1.0 until a baseline file exists).

Env knobs: BENCH_GRID overrides the flagship preset; BENCH_SECONDARY=0
skips the light config; BENCH_FP64=1 adds float64 runs of both configs
(slow on TPU — fp64 is emulated; results land in detail.fp64).

Prints exactly one JSON line.
"""

import json
import os
import time

# persistent XLA compile cache: first-compile of the production-physics step
# over the TPU tunnel is minutes; cache entries make driver re-runs cheap
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _measure(preset, dtype, nsteps_warm, nsteps):
    import jax
    from pop2_tpu.config import get_config, SolverConfig
    from pop2_tpu.model import Model

    cfg = get_config(preset).with_(
        dtype=dtype,
        solver=SolverConfig(choice="ChronGear",
                            convergence_criterion=1.0e-5,
                            max_iterations=500,
                            convergence_check_freq=10),
    )
    model = Model(cfg)
    state = model.initial_state()

    # warmup must cover every executable the timed region will use: the
    # Euler first step, a single leapfrog step, the fused scan chunk, and
    # an averaging step (first one at time_mix_freq=17)
    state, diags = model.advance(state)          # Euler first step
    state, diags = model.run_compiled(state, nsteps_warm)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    state, diags = model.run_compiled(state, nsteps)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps_per_sec = nsteps / dt
    points = cfg.nx * cfg.ny * cfg.km
    return {
        "grid": preset, "nx": cfg.nx, "ny": cfg.ny, "km": cfg.km,
        "dtype": dtype,
        "steps_per_sec": round(steps_per_sec, 3),
        "points_per_sec": round(points * steps_per_sec, 1),
        "solver_iters_last": int(diags.solver_iters),
    }


def main():
    import jax

    nsteps_warm = int(os.environ.get("BENCH_WARMUP", "20"))
    nsteps = int(os.environ.get("BENCH_STEPS", "32"))
    flagship = os.environ.get("BENCH_GRID", "prod_full")

    detail = {"backend": jax.default_backend()}
    flag = _measure(flagship, "float32", nsteps_warm, nsteps)
    detail.update(flag)

    if os.environ.get("BENCH_SECONDARY", "1") != "0":
        detail["light"] = _measure("prod", "float32", nsteps_warm, nsteps)
    if os.environ.get("BENCH_FP64", "0") == "1":
        detail["fp64"] = {
            "flagship": _measure(flagship, "float64", 4, 8),
            "light": _measure("prod", "float64", 4, 8),
        }

    value = flag["points_per_sec"]
    baseline = None
    if os.path.exists("BASELINE.json"):
        try:
            with open("BASELINE.json") as f:
                bl = json.load(f)
            baseline = (bl.get("published", {})
                        .get("grid_points_per_sec_per_chip"))
        except Exception:
            baseline = None
    vs_baseline = (value / baseline) if baseline else 1.0

    print(json.dumps({
        "metric": "grid_points_per_sec_per_chip",
        "value": value,
        "unit": "points/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
