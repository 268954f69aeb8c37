# Test harness configuration: force a virtual 8-device CPU mesh so sharding
# logic is exercised without TPU hardware (mirrors the reference's use of a
# CPU oracle backend, /root/reference/PhiFlow/tests/test_fluid_tf.py:25-44).
#
# NOTE: in this image the axon TPU plugin ignores the JAX_PLATFORMS env var,
# so the platform must be forced through jax.config before backend init.
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Enable x64 so tests can build float64 oracles (framework code is explicitly
# float32 unless configured otherwise).
jax.config.update("jax_enable_x64", True)
