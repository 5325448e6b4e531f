"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4 test plan)."""

import os
import sys

# force CPU: the session env pins JAX_PLATFORMS to the (single) TPU tunnel,
# and concurrent test processes would deadlock claiming it
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the tunnel's sitecustomize imports jax and registers its PJRT plugin
# BEFORE conftest runs, so the env var above is too late: jax is already
# in sys.modules with jax_platforms materialized as "axon,cpu". Pin the
# config itself — backend resolution is lazy, so this wins as long as no
# array op ran yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
