"""Test config: force a virtual 8-device CPU mesh so every sharding and
collective path runs in CI without TPU hardware.

The sandbox's sitecustomize registers the axon TPU backend and pins
``jax.config.jax_platforms = "axon,cpu"`` (overriding env vars), so we must
counter-update the config — env alone is not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
