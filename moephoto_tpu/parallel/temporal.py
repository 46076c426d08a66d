"""Row-sharded (SPMD) execution for temporal video stages.

The reference runs every video model single-GPU (SURVEY.md section 2.4);
the TPU-native scaling axis for the temporal pipelines (IconVSR, ESTRNN,
IFRNet) is *spatial*: the recurrences are sequential in time, but every
stage is convolutional over (H, W), so image rows shard across the whole
mesh and XLA's SPMD partitioner inserts the conv halo exchanges and
warp/gather collectives automatically.  The math is unchanged — a
sharded stage computes the identical program, distributed — so outputs
match the single-device path (tests/test_parallel.py proves it on an
8-device CPU mesh).

Design notes:
  - ``stageJit(fn, hAxes)`` replaces a module-level ``jax.jit(fn)``.
    With no mesh configured it IS that plain jit (zero overhead).  With
    ``config.meshShape`` set, array args get placed row-sharded over a
    flattened 1-D ('sp',) mesh via ``device_put`` and the jit compiles
    under GSPMD.
  - Pallas kernels are opaque custom calls that GSPMD cannot partition;
    the ``spmdTracing()`` flag lets the op-level dispatchers
    (ops/deform.py, models/iconvsr.py spynet) keep the XLA tier while a
    sharded stage traces.  The XLA paths partition cleanly.
  - dp-style batch sharding is deliberately NOT used here: temporal
    stages carry recurrent state frame-to-frame, so the batch axis is
    time and cannot shard.  Batched helper stages (EDVR clips, upsample
    chunks) still win from row sharding.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_spmdTracing = [False]


def spmdTracing() -> bool:
    """True while a row-sharded stage traces (ops consult this to keep
    XLA tiers instead of un-partitionable Pallas custom calls)."""
    return _spmdTracing[0]


_videoMesh: list = [None, None]  # [mesh, key]


def videoMesh() -> Optional[Mesh]:
    """``config.meshShape`` flattened to a 1-D ('sp',) row mesh (video
    stages have no batch axis to shard — see module docstring)."""
    from moephoto_tpu.parallel.mesh import activeMesh

    base = activeMesh()
    if base is None:
        return None
    devs = base.devices.reshape(-1)
    if devs.size <= 1:
        return None
    key = tuple(d.id for d in devs)
    if _videoMesh[1] != key:
        _videoMesh[0], _videoMesh[1] = Mesh(devs, ("sp",)), key
    return _videoMesh[0]


def _rowSpec(hAxis: int, ndim: int) -> P:
    return P(*[("sp" if i == hAxis else None) for i in range(ndim)])


def stageJit(fn: Callable, hAxes: Sequence[Optional[int]]) -> Callable:
    """Mesh-aware replacement for a module-level ``jax.jit(fn)``.

    ``hAxes`` aligns with ``fn``'s positional args: the index of each
    array arg's image-row (H) axis, or None to leave the arg alone
    (params trees, masks, scalars — GSPMD replicates them).  Both the
    plain and the sharded executables cache per shape as usual.
    """
    hAxes = tuple(hAxes)
    plain = jax.jit(fn)

    def traced(*args):
        _spmdTracing[0] = True
        try:
            return fn(*args)
        finally:
            _spmdTracing[0] = False

    sharded = jax.jit(traced)

    def call(*args):
        mesh = videoMesh()
        if mesh is None:
            return plain(*args)
        assert len(args) == len(hAxes), (fn, len(args), len(hAxes))

        def place(a, h):
            if h is None:
                return a
            # pytree args (e.g. a pyramid feature list): every leaf
            # shares the same H-axis index, shapes may differ
            return jax.tree_util.tree_map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh, _rowSpec(h, np.ndim(leaf)))
                ),
                a,
            )

        placed = [place(a, h) for a, h in zip(args, hAxes)]
        return sharded(*placed)

    call.plain = plain  # escape hatch for tests
    return call
