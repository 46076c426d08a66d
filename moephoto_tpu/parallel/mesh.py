"""Device-mesh helpers.

The reference is single-GPU (SURVEY.md section 2.4); multi-chip scaling
here is dp (batch/frames) x sp (spatial, image rows) over ICI, with
halo exchange replacing the in-place overlap blending of the tiler.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def makeMesh(
    shape: Optional[Sequence[int]] = None,
    axisNames: Tuple[str, ...] = ("dp", "sp"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    ``shape=None`` puts every device on the leading axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not shape:
        shape = [len(devices)] + [1] * (len(axisNames) - 1)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axisNames[: arr.ndim])
