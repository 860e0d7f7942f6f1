"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without a TPU pod (SURVEY.md §4: device_count-agnostic
tests via xla_force_host_platform_device_count). Must run before jax import.
"""

import os

# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# JAX_PLATFORM_NAME and jax.config.update("jax_platforms", ...) both work.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# This JAX build's DEFAULT matmul precision is bf16-class on every backend;
# fidelity tests need true-f32 matmuls (see audio/mel.py rationale).
jax.config.update("jax_default_matmul_precision", "highest")


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "test_data"))


@pytest.fixture(scope="session")
def golden_dir():
    """Reference golden-trace directory, or skip."""
    if not reference_available():
        pytest.skip("reference golden traces not available")
    return os.path.join(REFERENCE_DIR, "test_data")


@pytest.fixture(scope="session")
def golden_audio(golden_dir):
    """1.5 s 16 kHz mono f32 clip (reference: test_data/ref_a_audio.bin)."""
    return np.fromfile(os.path.join(golden_dir, "ref_a_audio.bin"), dtype=np.float32)


@pytest.fixture(scope="session")
def golden_filterbank(golden_dir):
    """whisper.cpp 80x201 slaney filterbank (reference: test_data/ref_b_filterbank.bin)."""
    fb = np.fromfile(os.path.join(golden_dir, "ref_b_filterbank.bin"), dtype=np.float32)
    return fb.reshape(80, 201)


@pytest.fixture(scope="session")
def golden_mel(golden_dir):
    """Expected 148x80 log-mel for the 1.5 s clip (reference: test_data/ref_c_mel_numpy.bin)."""
    mel = np.fromfile(os.path.join(golden_dir, "ref_c_mel_numpy.bin"), dtype=np.float32)
    return mel.reshape(148, 80)


# -- compiled-program pressure relief ----------------------------------------
# The full single-process suite compiles 500+ XLA CPU programs; past ~500
# the CPU client segfaults inside backend_compile_and_load (LLVM JIT state,
# reproducible at the same test index, gone when the suite is split).
# Periodically dropping JAX's executable caches bounds the accumulation;
# affected fixtures simply recompile.
_teardown_count = {"n": 0}


def pytest_runtest_teardown(item, nextitem):
    _teardown_count["n"] += 1
    if _teardown_count["n"] % 100 == 0:
        jax.clear_caches()
