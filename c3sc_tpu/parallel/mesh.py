"""Device mesh construction for pod slices."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axes: tuple[str, ...] = ("fibers", "ctrl"),
              shape: tuple[int, ...] | None = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default 2D layout: 'fibers' (data-parallel over Bellman fiber/node
    batches and rollout scenarios) x 'ctrl' (parallel over control-candidate
    blocks, reduced with pmin). With `shape=None` all devices go to 'fibers'
    (ctrl=1), the right default for small candidate sets.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != #devices {n}"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)
