"""Test configuration: force CPU with 8 virtual devices and float64.

The reference DP core is double-precision C; strict-parity tests run in
float64 on CPU.  Multi-chip sharding tests use the 8 virtual CPU devices.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The container's sitecustomize registers the axon TPU backend at interpreter
# startup and overrides JAX_PLATFORMS; config.update wins if applied before
# backend initialisation.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the f64 engine comparators compile one scan
# per distinct read shape — cache them across test runs (gitignored dir,
# same one bench.py uses for the TPU kernels)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pathlib

import pytest

from cpecan_tpu.fixtures import fixture_path

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def zymo_reference_seq():
    path = pathlib.Path(fixture_path("ZymoRef.txt"))
    if not path.exists():
        pytest.skip("Zymo reference fixture unavailable")
    return path.read_text().splitlines()[0]


@pytest.fixture(scope="session")
def zymo_npread():
    from cpecan_tpu.io.npread import load_npread
    path = pathlib.Path(fixture_path("ZymoC_ch_1_file1.npRead"))
    if not path.exists():
        pytest.skip("Zymo npRead fixture unavailable")
    return load_npread(str(path))


@pytest.fixture(scope="session")
def template_model():
    from cpecan_tpu.io.poremodel import load_pore_model
    path = pathlib.Path(fixture_path("template_median68pA.model"))
    if not path.exists():
        pytest.skip("template model fixture unavailable")
    return load_pore_model(str(path))
