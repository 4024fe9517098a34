"""Test harness config.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Must set the env before jax is imported anywhere.
"""

import os

# Force the CPU backend: the session environment may pre-set JAX_PLATFORMS to
# a real accelerator (e.g. a tunneled TPU), which would serialize every test
# through one remote chip and break the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# XLA CPU fast-math approximates exp/log (~1e-4 abs error in fp32) — kills
# parity tests. TPU is unaffected; disable it for the CPU test backend.
if "xla_cpu_enable_fast_math" not in flags:
    flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax
import numpy as np
import pytest

# A site-level accelerator plugin (tunneled TPU) may override JAX_PLATFORMS
# via jax.config during interpreter startup; config beats env, so re-force it.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA CPU compiles of
# the same tiny-model programs; repeat runs reuse them.
jax.config.update("jax_compilation_cache_dir", "/tmp/scl_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
