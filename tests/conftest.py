"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the standard
``xla_force_host_platform_device_count`` trick)."""

import os

# The image exports JAX_PLATFORMS=axon (the TPU tunnel); tests must run on
# the virtual CPU mesh. The axon sitecustomize force-sets
# jax_platforms="axon,cpu" at interpreter start, overriding the env var, so
# select the cpu platform through jax.config after import as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
