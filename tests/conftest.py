"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

Note: this environment's sitecustomize registers an 'axon' TPU backend and
programmatically sets jax_platforms — env vars alone don't stick, so we
re-override via jax.config before the (lazy) backend initializes.
"""

import os

# XLA_FLAGS must be in the env before the CPU client is created.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for test runs: CPU AOT artifacts embed host
# features, but test runs always execute on this same host, so reusing them
# is safe and cuts repeat-suite wall time substantially. (The TPU bench path
# uses its own cache dir — see bench.py.)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
