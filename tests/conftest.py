"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication (c):
decomposition-invariance tests on a virtual mesh)."""

import os
import sys

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# tunnel as the ONLY jax backend at interpreter startup — JAX_PLATFORMS=cpu
# set afterwards is ignored. Tests need the local 8-virtual-device CPU
# platform, so if the sitecustomize ran, re-exec the whole pytest process
# with it scrubbed from PYTHONPATH (guarded against loops).
if (".axon_site" in os.environ.get("PYTHONPATH", "")
        and os.environ.get("POP2_TPU_TEST_REEXEC") != "1"):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if ".axon_site" not in p)
    env["POP2_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # unbuffered so the re-exec'd pytest's output reaches the caller even
    # when stdout is a pipe (round-3 verdict: output appeared swallowed)
    env["PYTHONUNBUFFERED"] = "1"
    sys.stdout.write("[conftest] re-exec with axon sitecustomize scrubbed "
                     "(JAX_PLATFORMS=cpu); pytest output follows\n")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest",
                               *sys.argv[1:]], env)

# must be set before jax is imported anywhere; hard-override so tests never
# run over the (slow, single-chip) TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: this box has 2 vCPUs and XLA compiles of the
# fp64 step are expensive — cache them across test processes. Keep a separate
# cache when the axon sitecustomize is active (its remote XLA:CPU compiles
# target a different machine and would poison the local cache).
_cache = ("/root/.jax_cache" if ".axon_site" not in
          os.environ.get("PYTHONPATH", "") else "/root/.jax_cache_axon")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def test_cfg():
    from pop2_tpu.config import get_config
    return get_config("test")


@pytest.fixture(scope="session")
def test_grid(test_cfg):
    from pop2_tpu.grid import build_grid
    return build_grid(test_cfg)


@pytest.fixture(scope="session")
def mini_cfg():
    from pop2_tpu.config import get_config
    return get_config("mini")


@pytest.fixture(scope="session")
def mini_grid(mini_cfg):
    from pop2_tpu.grid import build_grid
    return build_grid(mini_cfg)
