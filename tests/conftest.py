"""Test harness config: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU runs happen via
bench.py / the driver, not the unit suite.  The axon sitecustomize
registers the TPU plugin and sets jax_platforms programmatically, so we
must override the *config*, not just the env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
