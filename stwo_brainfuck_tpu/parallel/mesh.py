"""Device mesh construction for multi-chip proving.

The sharding axis is trace ROWS (the zkVM analog of sequence parallelism —
SURVEY.md §5 "long-context"): table building, LogUp fractions/prefix sums,
and constraint evaluation are pointwise or scan-like over rows, so they
shard cleanly with one all_gather + ppermute for the prefix-sum seam.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

ROW_AXIS = "rows"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ROW_AXIS,))
