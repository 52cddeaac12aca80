"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the CPU
platform with 8 virtual devices (SURVEY.md §4d); the env vars must be set
before jax initializes.
"""

import os

# SINGLEHDR_TEST_TPU=1 opts out of the CPU pin so the hardware-gated tests
# (e.g. tests/test_unet_fused.py Mosaic parity) run on the real chip:
#   SINGLEHDR_TEST_TPU=1 python -m pytest tests/test_unet_fused.py -q
_USE_TPU = os.environ.get("SINGLEHDR_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The hosted TPU PJRT plugin ("axon") registers itself regardless of
# JAX_PLATFORMS; pin the default platform explicitly so the suite never
# dispatches over the device tunnel.
if not _USE_TPU:
    jax.config.update("jax_platform_name", "cpu")

# Persistent compilation cache: the hal/joint/finetune steps cost minutes of
# XLA-CPU compile; cache them across suite runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    """Build the native codec once if the toolchain is available (tests skip
    gracefully when it isn't)."""
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parent.parent
    lib = root / "native" / "build" / "libshdr_native.so"
    if not lib.exists():
        try:
            subprocess.run(
                ["make", "-C", str(root / "native")],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            pass
