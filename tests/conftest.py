"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4 implication (c):
decomposition-invariance tests on a virtual mesh)."""

import os

# must be set before jax is imported anywhere; hard-override so tests never
# run over the (slow, single-chip) TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: this box has 2 vCPUs and XLA compiles of the
# fp64 step are expensive — cache them across test processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
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
