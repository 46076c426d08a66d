"""Static halo-tile engine: the TPU replacement for the reference's
memory-aware ``prepare``/``doCrop`` loop (``imageProcess.py:19-172``).

Design
------
The reference re-plans tile sizes from live free-VRAM every 28 calls and
stitches tiles sequentially with an in-place sigmoid blend.  On TPU,
dynamic shapes force recompiles and serial stitching wastes the MXU, so
this engine instead:

  1. picks a **static tile size** per model (aligned to the model's
     stride requirements and to MXU-friendly multiples),
  2. reflect-pads the image so tiles on a fixed stride cover it exactly
     (static Python-side plan -> static slices inside ``jit``),
  3. stacks all tiles into a **batch** and runs the model over fixed-size
     chunks (one compile per chunk shape, big MXU batches),
  4. blends with a precomputed separable **sigmoid window** via
     overlap-add + weight normalization — numerically equivalent in
     quality to the reference's pairwise blend (``imageProcess.py:109,
     120-131``) but order-independent and fully parallel.

Everything from padding to the final crop runs inside a single jitted
function per (image bucket, tile spec), so XLA fuses the pad, slicing,
model, and blend.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

ceilTo = lambda x, d: -(-int(x) // d) * d


@dataclass(frozen=True)
class TileSpec:
    """Static tiling parameters for one model.

    tile:   tile side length fed to the model (includes halos).
    pad:    halo width; adjacent tiles overlap by ``2 * pad`` pixels.
    align:  model stride alignment (tile and padded image are multiples).
    scale:  spatial scale factor of the model output.
    batch:  tiles evaluated per jitted model call.
    """

    tile: int = 256
    pad: int = 8
    align: int = 8
    scale: float = 1.0
    batch: int = 8

    def __post_init__(self):
        assert self.tile % self.align == 0, (self.tile, self.align)
        assert self.tile > 2 * self.pad


def planAxis(size: int, tile: int, pad: int) -> List[int]:
    """Static anchor positions along one axis.

    Tiles of length ``tile`` on stride ``tile - 2*pad`` starting at 0;
    the image is padded up to the grid extent, so anchors are uniform.
    """
    stride = tile - 2 * pad
    if size <= tile:
        return [0]
    n = math.ceil((size - 2 * pad) / stride)
    return [i * stride for i in range(n)]


def paddedExtent(size: int, tile: int, pad: int, align: int) -> int:
    if size <= tile:
        # single tile: pad only to alignment (matches the reference's
        # no-tiling path, so aligned inputs see zero extra context)
        return ceilTo(size, align)
    anchors = planAxis(size, tile, pad)
    return max(anchors[-1] + tile, ceilTo(size, align))


def _ramp(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sigmoid ramp over ``n`` pixels (reference ``imageProcess.py:109``).

    Symmetric: ramp + reversed ramp == 1 exactly, so two neighbouring
    tiles' windows form a partition of unity across the overlap.
    """
    if n == 0:
        return jnp.ones((0,), dtype)
    # half-pixel centering makes the ramp exactly antisymmetric:
    # ramp[i] + ramp[n-1-i] == 1
    t = ((jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5) * 9.0
    return jax.nn.sigmoid(t).astype(dtype)


def _axisWindow(
    t: int, padSc: int, isFirst: bool, isLast: bool, dtype=jnp.float32
) -> jnp.ndarray:
    """1D blend weights for one tile along one axis.

    Interior edges discard the outermost ``padSc//2`` pixels entirely
    (they saw the tile's own pad boundary — the reference's clip logic,
    ``imageProcess.py:111-117``) and sigmoid-ramp across the central
    ``2*(padSc - d)`` pixels of the 2*padSc overlap.  Image-boundary
    edges keep weight 1 to the end.
    """
    w = jnp.ones((t,), dtype)
    if padSc == 0:
        return w
    d = padSc // 2
    r = 2 * (padSc - d)
    ramp = _ramp(r, dtype)
    if not isFirst:
        w = w.at[:d].set(0.0).at[d : d + r].set(ramp)
    if not isLast:
        w = w.at[t - d :].set(0.0).at[t - d - r : t - d].set(ramp[::-1])
    return w


def blendWindow(
    th: int,
    tw: int,
    padSc: int,
    dtype=jnp.float32,
    edges=(False, False, False, False),
) -> jnp.ndarray:
    """2D separable blend window; ``edges`` = (firstY, lastY, firstX,
    lastX) flags marking image-boundary sides."""
    wy = _axisWindow(th, padSc, edges[0], edges[1], dtype)
    wx = _axisWindow(tw, padSc, edges[2], edges[3], dtype)
    return wy[:, None] * wx[None, :]


def reflectPadHW(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Reflect-pad bottom/right of an (H, W, C) image, tiling reflections
    when the pad exceeds the image extent (reference ``getPad`` :48-56)."""
    h, w = x.shape[0], x.shape[1]
    while ph > 0 or pw > 0:
        dh = min(ph, x.shape[0] - 1)
        dw = min(pw, x.shape[1] - 1)
        x = jnp.pad(x, ((0, dh), (0, dw), (0, 0)), mode="reflect")
        ph -= dh
        pw -= dw
        if dh == 0 and dw == 0:  # degenerate 1-pixel axis
            x = jnp.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
            break
    return x


def _chunked(
    fn: Callable, tiles: jnp.ndarray, batch: int, mesh=None
) -> jnp.ndarray:
    """Apply ``fn`` over the tile batch in fixed-size chunks.

    Chunks run under ``lax.map`` so the model body is compiled ONCE
    regardless of tile count (a Python loop unrolled N copies of the
    model into the XLA program — NAFNet at 1080p took 270 s to
    compile); the final partial chunk is padded to ``batch``.

    With a ``mesh``, each chunk grows to ``batch`` tiles PER DEVICE and
    a sharding constraint splits the chunk's tile axis across every mesh
    device — tiles are independent halo-padded work units, so this is
    exact data parallelism; GSPMD inserts the gather for the blend.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = batch * mesh.size
        spec = NamedSharding(mesh, P(tuple(mesh.axis_names), None, None, None))
        inner = fn
        fn = lambda t: inner(jax.lax.with_sharding_constraint(t, spec))
    n = tiles.shape[0]
    if n <= batch:
        if n < batch:
            fill = jnp.repeat(tiles[-1:], batch - n, axis=0)
            tiles = jnp.concatenate([tiles, fill], axis=0)
        return fn(tiles)[:n]
    nChunks = -(-n // batch)
    padded = nChunks * batch
    if padded > n:
        fill = jnp.repeat(tiles[-1:], padded - n, axis=0)
        tiles = jnp.concatenate([tiles, fill], axis=0)
    stacked = tiles.reshape((nChunks, batch) + tiles.shape[1:])
    out = jax.lax.map(fn, stacked)  # (nChunks, batch, ...)
    return out.reshape((padded,) + out.shape[2:])[:n]


def _tiledApplyImpl(
    x: jnp.ndarray,
    fn: Callable,
    spec: TileSpec,
    outC: int,
    mesh=None,
) -> jnp.ndarray:
    h, w, c = x.shape
    tile, pad, align, sc = spec.tile, spec.pad, spec.align, spec.scale
    ph = paddedExtent(h, tile, pad, align)
    pw = paddedExtent(w, tile, pad, align)
    xp = reflectPadHW(x, ph - h, pw - w)

    ys = planAxis(ph, tile, pad)
    xs = planAxis(pw, tile, pad)
    th = min(tile, ph)
    tw = min(tile, pw)

    tiles = jnp.stack(
        [xp[y : y + th, xcoord : xcoord + tw, :] for y in ys for xcoord in xs],
        axis=0,
    )  # (n, th, tw, c)

    out_tiles = _chunked(fn, tiles, spec.batch, mesh)  # (n, th*sc, tw*sc, outC)
    oth, otw = int(round(th * sc)), int(round(tw * sc))
    assert out_tiles.shape[1:3] == (oth, otw), (out_tiles.shape, oth, otw)

    padSc = int(round(pad * sc))
    oH, oW = int(round(ph * sc)), int(round(pw * sc))

    # Blend windows: one of (up to) 9 edge variants per tile.  The
    # overlap-add runs as a lax.scan over tiles so the canvas updates
    # compile once (an unrolled loop put 40 scatter-adds on a 4K canvas
    # into the program) and alias in place via the scan carry.
    yKind = lambda i, n: 0 if n == 1 else (0 if i == 0 else (2 if i == n - 1 else 1))
    winBank = []
    winIndex = {}
    tileWin, tileOy, tileOx = [], [], []
    for iy, y in enumerate(ys):
        for ix, xcoord in enumerate(xs):
            edges = (iy == 0, iy == len(ys) - 1, ix == 0, ix == len(xs) - 1)
            if edges not in winIndex:
                winIndex[edges] = len(winBank)
                winBank.append(
                    blendWindow(oth, otw, padSc, out_tiles.dtype, edges)[:, :, None]
                )
            tileWin.append(winIndex[edges])
            tileOy.append(int(round(y * sc)))
            tileOx.append(int(round(xcoord * sc)))
    winBankArr = jnp.stack(winBank)
    coords = (
        jnp.asarray(tileWin, jnp.int32),
        jnp.asarray(tileOy, jnp.int32),
        jnp.asarray(tileOx, jnp.int32),
    )

    def accum(carry, inp):
        canvas, weight = carry
        tileOut, (wIdx, oy, ox) = inp
        win = winBankArr[wIdx]
        cSlice = jax.lax.dynamic_slice(canvas, (oy, ox, 0), (oth, otw, outC))
        canvas = jax.lax.dynamic_update_slice(canvas, cSlice + tileOut * win, (oy, ox, 0))
        wSlice = jax.lax.dynamic_slice(weight, (oy, ox, 0), (oth, otw, 1))
        weight = jax.lax.dynamic_update_slice(weight, wSlice + win, (oy, ox, 0))
        return (canvas, weight), None

    canvas = jnp.zeros((oH, oW, outC), out_tiles.dtype)
    weight = jnp.zeros((oH, oW, 1), out_tiles.dtype)
    (canvas, weight), _ = jax.lax.scan(accum, (canvas, weight), (out_tiles, coords))
    out = canvas / jnp.maximum(weight, 1e-8)
    return out[: int(round(h * sc)), : int(round(w * sc)), :]


def tiledApply(
    x: jnp.ndarray,
    fn: Callable,
    spec: TileSpec,
    outC: int | None = None,
    mesh=None,
) -> jnp.ndarray:
    """Tiled application of a batched model ``fn`` to an (H, W, C) image.

    ``fn``: (B, th, tw, C) -> (B, th*scale, tw*scale, outC); must accept
    the static tile shape implied by ``spec``.  ``mesh``: optional device
    mesh — the tile batch is sharded across it (see ``_chunked``).
    """
    if outC is None:
        outC = x.shape[-1]
    return _tiledApplyImpl(x, fn, spec, outC, mesh)
