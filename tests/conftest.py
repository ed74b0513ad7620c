import os

# Tests run on a virtual 8-device CPU mesh (SURVEY §4.6): multi-chip
# sharding is validated without TPU hardware.  The axon TPU plugin ignores
# the JAX_PLATFORMS env var, so the config must be set in-process before
# the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
