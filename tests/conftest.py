"""Test harness config: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax at interpreter startup and points
it at a tunneled TPU backend ("axon"), so env vars are too late here —
we must override through jax.config before any backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
