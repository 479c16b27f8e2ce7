"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_time_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ``time`` axis (the framework's primary parallel
    axis — the reference parallelizes time only, SURVEY.md §2)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(devices, ("time",))


def make_spacetime_mesh(n_time: int, n_space: int, devices=None) -> Mesh:
    """A 2-D (time × space) mesh for the largest configs (cfg5 stretch,
    SURVEY.md §2): timesteps over ``time``, the leading spatial grid axis
    over ``space``."""
    import numpy as np

    if devices is None:
        devices = jax.devices()
    if n_time * n_space > len(devices):
        raise ValueError(
            f"requested {n_time}x{n_space} devices, only {len(devices)} available"
        )
    arr = np.asarray(devices[: n_time * n_space]).reshape(n_time, n_space)
    return Mesh(arr, ("time", "space"))
