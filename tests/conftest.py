"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 the distributed
tests emulate an 8-way time mesh with host-platform virtual devices. Parity
tests need float64 (PCG to 1e-8), hence jax_enable_x64.

NOTE: this image preimports jax via sitecustomize with JAX_PLATFORMS=axon
(the TPU tunnel), so setting env vars here is too late — the platform must be
overridden through jax.config BEFORE the first backend use.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (already preimported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
