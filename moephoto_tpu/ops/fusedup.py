"""Fused sub-pixel upsample + heads Pallas kernel for MoeNet_lite2.

The lite up path (reference ``MoeNet_lite2.py:22-49``: per-stage 1x1
conv -> PixelShuffle -> PReLU, then two 1x1 heads summed) is pure
pointwise math, but its intermediates are 16x the pixel count at 96
channels — under XLA each stage round-trips ~2.4 GB of bf16 through
HBM per 24-plane tile chunk (measured 38 ms of a 50 ms model).  This
kernel keeps the whole expansion in VMEM: per pixel-row tile it runs
every stage's per-subposition (c, c) matmuls on the MXU, applies bias +
PReLU, contracts both heads as full-lane VPU reductions, and writes
only the (rows, S*cout) result — HBM traffic drops from ~12 GB to
~0.4 GB per chunk.

Layout contract (matches ``models/sr.py`` nested deferred layout):
output column index = (((s1 * 4 + s2) * 4 + ...) * cout + plane) with
s_i = rowOffset_i * 2 + colOffset_i, i.e. exactly the axis nesting
``interleaveNested`` expects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _prepStage(params, key: str, dtype):
    """(4, c, c) per-subposition weights + (4, 1, c) biases + (1, c)
    PReLU slope for one up stage, subpositions ordered (row, col)."""
    wFull = params[key + ".0.weight"][0, 0]  # (c, 4c), cols = co*4 + a*2 + b
    c = wFull.shape[0]
    w = jnp.transpose(wFull.reshape(c, c, 2, 2), (2, 3, 0, 1))  # (a, b, cin, co)
    w = w.reshape(4, c, c).astype(dtype)
    bias = jnp.transpose(params[key + ".0.bias"].reshape(c, 2, 2), (1, 2, 0))
    bias = bias.reshape(4, 1, c).astype(jnp.float32)
    slope = params[key + ".2.weight"].astype(dtype)
    slope = jnp.broadcast_to(slope.reshape(1, -1), (1, c)) if slope.size > 1 else (
        jnp.full((1, c), slope.reshape(()), dtype)
    )
    return w, bias, slope


def _prepHead(params, key: str):
    """(cout, 1, c) f32 head rows + (cout,) f32 bias."""
    w = params[key + ".weight"][0, 0].astype(jnp.float32)  # (c, cout)
    b = params.get(key + ".bias")
    cout = w.shape[1]
    b = jnp.zeros((cout,), jnp.float32) if b is None else b.astype(jnp.float32)
    return jnp.transpose(w)[:, None, :], b  # (cout, 1, c)


def _kernel(nUps, cout, dtype, *refs):
    xresRef, ximRef = refs[0], refs[1]
    stageRefs = refs[2 : 2 + 6 * nUps]
    hrRef, hbrRef, hiRef, hbiRef, outRef = refs[2 + 6 * nUps :]

    def loadStages(sRefs):
        return [(w[...], b[...], s[...].astype(jnp.float32)) for w, b, s in sRefs]

    resStages = loadStages(stageRefs[6 * i : 6 * i + 3] for i in range(nUps))
    imStages = loadStages(stageRefs[6 * i + 3 : 6 * i + 6] for i in range(nUps))

    def finals(x, stages):
        """Depth-first leaf streams: keeps O(nUps) live streams instead of
        4**nUps, so larger row tiles fit the register budget."""
        if not stages:
            yield x
            return
        (w, b, s32), rest = stages[0], stages[1:]
        for sub in range(4):
            y = jnp.dot(x, w[sub], preferred_element_type=jnp.float32) + b[sub]
            # select in f32: v5e Mosaic rejects bf16 comparisons
            y = jnp.where(y >= 0, y, s32 * y).astype(dtype)
            yield from finals(y, rest)

    hr, hbr = hrRef[...], hbrRef[...]
    hi, hbi = hiRef[...], hbiRef[...]
    cols = []
    for r, m in zip(
        finals(xresRef[...], resStages), finals(ximRef[...], imStages)
    ):
        r32 = r.astype(jnp.float32)
        m32 = m.astype(jnp.float32)
        for plane in range(cout):
            # both heads in one full-lane VPU multiply-add + reduce
            z = jnp.sum(r32 * hr[plane] + m32 * hi[plane], axis=1, keepdims=True)
            cols.append((z + (hbr[0, plane] + hbi[0, plane])).astype(dtype))
    outRef[...] = jnp.concatenate(cols, axis=1)


def fusedUpHeads(
    params,
    res: jnp.ndarray,
    im: jnp.ndarray,
    nUps: int,
    tileRows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused up-stages + heads: (M, c) x2 -> (M, 4**nUps * cout).

    ``params`` uses the lite checkpoint keys (``ures.i.*``, ``uim.i.*``,
    ``convt_R1``, ``convt_I1``).  Rows are independent pixels; M is
    padded to the row tile internally.
    """
    M, c = res.shape
    dtype = res.dtype
    S = 4**nUps

    ops = []
    for i in range(nUps):
        ops.extend(_prepStage(params, f"ures.{i}", dtype))
        ops.extend(_prepStage(params, f"uim.{i}", dtype))
    hr, hbr = _prepHead(params, "convt_R1")
    hi, hbi = _prepHead(params, "convt_I1")
    cout = hr.shape[0]
    ops += [hr, hbr.reshape(1, cout), hi, hbi.reshape(1, cout)]

    Mp = -(-M // tileRows) * tileRows
    if Mp > M:
        fill = jnp.zeros((Mp - M, c), dtype)
        res = jnp.concatenate([res, fill], axis=0)
        im = jnp.concatenate([im, fill], axis=0)

    rowSpec = pl.BlockSpec((tileRows, c), lambda i: (i, 0))
    fullSpec = lambda a: pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n)
    out = pl.pallas_call(
        functools.partial(_kernel, nUps, cout, dtype),
        grid=(Mp // tileRows,),
        in_specs=[rowSpec, rowSpec] + [fullSpec(a) for a in ops],
        out_specs=pl.BlockSpec((tileRows, S * cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, S * cout), dtype),
        interpret=interpret,
    )(res, im, *ops)
    return out[:M]
