"""Test configuration: run the suite on an 8-device virtual CPU mesh.

The axon sitecustomize force-registers the TPU platform and sets
jax_platforms='axon,cpu' at interpreter start, so plain JAX_PLATFORMS=cpu is
not enough — we re-point jax at cpu after import, before any backend is
initialized. XLA_FLAGS must be set before the first backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Allow float64 ground-truth comparisons in kernel unit tests; engine states
# pick their dtype explicitly (float32 by default) so this doesn't change
# engine behavior.
jax.config.update("jax_enable_x64", True)
