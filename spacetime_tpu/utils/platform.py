"""Platform selection helpers.

This image preimports jax at interpreter startup with JAX_PLATFORMS=axon (the
TPU tunnel), so environment variables set by user code are too late; platform
choice must go through jax.config before the first backend use. These helpers
wrap that: call exactly one of use_cpu()/use_tpu() at process start.
"""

from __future__ import annotations

import jax


def use_cpu(num_devices: int | None = None, x64: bool = True) -> None:
    """Run on host CPU, optionally with N virtual devices (mesh emulation)."""
    jax.config.update("jax_platforms", "cpu")
    if num_devices is not None:
        jax.config.update("jax_num_cpu_devices", num_devices)
    if x64:
        ensure_x64()


def use_tpu(x64: bool = False) -> None:
    """Run on the TPU backend (axon tunnel in this image).

    Keeps the CPU platform registered as secondary so host-side math
    (problem-data quadrature, exact solutions) can pin to it — dispatching
    those tiny batches through the TPU tunnel is pathologically slow.
    """
    jax.config.update("jax_platforms", "axon,cpu")
    enable_compile_cache()
    if x64:
        ensure_x64()


def ensure_x64() -> None:
    jax.config.update("jax_enable_x64", True)


def enable_compile_cache(path: str = "/root/.cache/spacetime_tpu_xla") -> None:
    """Persist compiled executables across processes.

    Full-solve graphs take minutes to compile on the axon backend; the
    persistent cache makes repeat runs (benchmarks, CLI, tests at the same
    shapes) start in seconds.
    """
    import os

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
