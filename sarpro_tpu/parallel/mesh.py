"""Device mesh construction for scene-batch × row-shard processing."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _factor(n: int) -> tuple[int, int]:
    """Split n devices into (scene, row) — favor scene parallelism, keep the
    row axis a power-of-two divisor for clean histogram reductions."""
    best = (n, 1)
    for rows in (1, 2, 4, 8):
        if n % rows == 0:
            best = (n // rows, rows)
            if rows >= 2 and n // rows >= 2:
                return best
    return best


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("scene", "row"),
    shape: Optional[tuple[int, int]] = None,
) -> Mesh:
    """Build a 2D mesh over the first `n_devices` devices.

    axes: 'scene' = inter-scene batch parallelism (DP analogue),
          'row'   = intra-scene spatial sharding (TP/SP analogue).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = _factor(n_devices)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
