"""Test configuration: force the CPU backend with an 8-device virtual mesh
so multi-chip sharding paths are exercised without TPU hardware.

Note: the environment may pre-register a TPU PJRT plugin (JAX_PLATFORMS=axon
via sitecustomize); overriding jax.config after import is what actually
forces CPU here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocesses spawned by tests must NOT touch the TPU plugin at all:
# its sitecustomize registration is gated on this variable, and
# concurrent registrations from short-lived test subprocesses can wedge
# the device tunnel for the whole machine.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
