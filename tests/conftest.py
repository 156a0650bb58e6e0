"""Test config: CPU backend with 8 virtual devices + float64 for oracles.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); numerical parity tests run in f64 on CPU while the
TPU path runs f32 — dtype follows the inputs everywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (a tunneled TPU
# chip) which would turn every eager test op into a network round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The site config force-sets jax_platforms to "axon,cpu" (overriding the env
# var), so pin it explicitly after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
