"""Test config: force an 8-device virtual CPU mesh before JAX import.

Mirrors the multi-chip layout we target (a v5e-8 slice) so sharding tests
exercise real NamedSharding/pjit paths without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# On this 1-vCPU CI box XLA:CPU's parallel codegen (default split 32) stalls
# ~40s per compile waiting on its thread pool; a single split compiles the
# same graph in ~4s.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin in this image force-registers itself and overrides the
# JAX_PLATFORMS env var (config becomes "axon,cpu"); without this update all
# "CPU" tests silently dispatch through the TPU tunnel, adding ~0.8s latency
# per op. Force the CPU backend programmatically.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
