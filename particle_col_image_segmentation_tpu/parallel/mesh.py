"""Device-mesh construction.

The reference has zero parallelism (SURVEY.md §2.8); scale-out here is
TPU-native: a 2-axis mesh with "data" (batch of planes — the DP axis) and
"space" (plane rows — the spatial/TP-analogue axis), collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_data: Optional[int] = None,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over ``n_data × n_space`` devices (defaults to all devices on the
    data axis)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    use = n_data * n_space
    arr = np.array(devices[:use]).reshape(n_data, n_space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))
