import os

# Force CPU with 8 virtual devices so multi-chip sharding logic is exercised
# without TPU hardware (must be set before jax import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu",
# overriding the env var — pin it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
