"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_time_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ``time`` axis (the framework's only parallel axis
    at parity scope; spatial sharding is post-parity work, SURVEY.md §2).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(devices, ("time",))
