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


_activeMesh: list = [None, None]  # [cached mesh, cache key]


def activeMesh() -> Optional[Mesh]:
    """The inference mesh configured by ``config.meshShape`` (e.g.
    ``[8]`` for 8-way tile data parallelism, ``[2, 4]`` for dp x sp), or
    None when unset / the devices don't match.  This is what routes the
    tiled image pipeline across chips (ModelExec consumes it)."""
    from moephoto_tpu.config import config

    shape = tuple(getattr(config, "meshShape", ()) or ())
    backend = getattr(config, "meshBackend", "") or None
    if not shape or int(np.prod(shape)) <= 1:
        return None
    key = (shape, backend)
    if _activeMesh[1] == key and _activeMesh[0] is not None:
        return _activeMesh[0]
    devices = jax.devices(backend) if backend else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        import logging

        logging.getLogger("Moe").warning(
            "meshShape %s needs %d devices, have %d — running single-device",
            shape, n, len(devices),
        )
        return None
    mesh = makeMesh(list(shape), devices=devices[:n])
    _activeMesh[0], _activeMesh[1] = mesh, key
    return mesh
