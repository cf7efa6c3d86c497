"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the driver
separately dry-run-compiles the multichip path; see __graft_entry__.py).

Note: the axon TPU PJRT plugin in this image ignores the JAX_PLATFORMS env
var, so the platform is forced via jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: closed-loop laps, multihost subprocess launches, reference "
        "parity replays, batched-engine equivalence sweeps. Quick tier: "
        "pytest -m 'not slow' (~2-3 min vs ~23 min full).")
