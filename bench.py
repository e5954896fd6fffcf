#!/usr/bin/env python
"""Performance benchmark: steady-state step throughput on the flagship (test)
grid, on whatever accelerator JAX finds (the driver runs this on one real TPU
chip).

Metric: grid-points/s/chip = nx*ny*km * steps/s (BASELINE.md; the reference
publishes no numbers — BASELINE.json "published": {} — so vs_baseline is the
ratio against the first recorded value of this same metric, 1.0 until a
baseline file exists).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time


def main():
    # fp32 is the TPU fast mode; fp64 parity runs live in the test suite.
    import jax
    from pop2_tpu.config import get_config, SolverConfig
    from pop2_tpu.model import Model

    # warmup must cover every executable the timed region will use: the
    # Euler first step, a single leapfrog step, the fused scan chunk, and an
    # averaging step (first one at time_mix_freq=17)
    nsteps_warm = int(os.environ.get("BENCH_WARMUP", "20"))
    nsteps = int(os.environ.get("BENCH_STEPS", "32"))
    # 'prod' (384x256x40) is the flagship benchmark resolution: it is the
    # smallest grid that saturates one chip (~40% more points/s than the
    # 'test' grid; larger grids become latency-chain-bound again)
    preset = os.environ.get("BENCH_GRID", "prod")

    cfg = get_config(preset).with_(
        dtype="float32",
        solver=SolverConfig(choice="ChronGear",
                            convergence_criterion=1.0e-5,
                            max_iterations=500,
                            convergence_check_freq=10),
    )
    model = Model(cfg)
    state = model.initial_state()

    # warmup: trigger Euler + leapfrog + fused-scan compiles, settle the flow
    state, diags = model.advance(state)          # Euler first step
    state, diags = model.run_compiled(state, nsteps_warm)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    state, diags = model.run_compiled(state, nsteps)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps_per_sec = nsteps / dt
    points = cfg.nx * cfg.ny * cfg.km
    value = points * steps_per_sec

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
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "grid": preset, "nx": cfg.nx, "ny": cfg.ny, "km": cfg.km,
            "steps_per_sec": round(steps_per_sec, 3),
            "dtype": cfg.dtype,
            "backend": jax.default_backend(),
            "solver_iters_last": int(diags.solver_iters),
        },
    }))


if __name__ == "__main__":
    main()
