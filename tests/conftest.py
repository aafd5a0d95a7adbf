"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (SURVEY.md §4). Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep XLA single-threaded-ish on the 1-core CI box.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU-tunnel site package force-sets JAX_PLATFORMS=axon at import
# time; the config.update below wins over it so tests stay on the virtual
# 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
