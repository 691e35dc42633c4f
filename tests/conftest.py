"""Test configuration: run everything on a virtual 8-device CPU mesh.

The session environment registers the 'axon' TPU plugin in a way that
overrides JAX_PLATFORMS, so we instead pin the default device to CPU after
import and give mesh tests 8 virtual host devices via XLA_FLAGS (set before
jax initializes its backends).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
# Parity tests compare against torch fp32; make fp32 matmuls/convs exact.
jax.config.update("jax_default_matmul_precision", "highest")


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]
