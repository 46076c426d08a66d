"""Pallas DCNv2 sampling kernel (TPU).

The XLA dense shift-window path (ops/deform._deformConvDense) is
HBM-bound: every window term re-reads and re-writes the (B,H,W,C) f32
accumulator (~880 GB of traffic per dcn_pack.l1 call @360p B=7,
measured 879 ms).  This kernel keeps the accumulator, the padded row
slab and the per-k offset planes VMEM-resident: HBM traffic drops to
one slab read + one output write per row block.

Layout (chosen for Mosaic v5e constraints, docs/PERF.md):
  - row-blocked grid over pre-built OVERLAPPING row slabs (BlockSpec
    index maps cannot express overlapping reads, so XLA stacks them —
    3x read amplification, ~2 ms);
  - (rows, W, C) blocks: window shifts are cheap sublane slices (lane
    slicing is expensive on Mosaic);
  - per-k offset planes carried on a LEADING K axis (sliced for free);
  - the (TR*W, dg) group weights broadcast to C lanes by a tiny
    (dg, C) 0/1 MXU matmul (lane-count-changing reshapes are rejected).

Same math as _deformConvDense: bilinear + modulation folded into hat
weights over the [-margin, margin]^2 shift window; valid only while
every |offset| <= margin (callers dispatch via deformConv2d).

Reference semantics: torchvision deform_conv2d as used by
ModulatedDeformConvPack (reference models.py:553-616).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

_TR = 8  # output rows per program


def _dcnKernel(K, dg, margin, padding, dilation, W, Cout, outDtype,
               slabRef, oyRef, oxRef, mRef, wRef, outRef):
    win = 2 * margin + 1
    kw = 3  # kernel taps per axis (K == kh*kw with kh == kw == 3)
    P = margin + max(padding, dilation) + 1
    C = slabRef.shape[-1]
    cg = C // dg
    TRW = _TR * W

    # (dg, C) 0/1 expansion matrix: lane c belongs to group c // cg
    gIota = lax.broadcasted_iota(jnp.int32, (dg, C), 0)
    cIota = lax.broadcasted_iota(jnp.int32, (dg, C), 1)
    expand = (cIota // cg == gIota).astype(jnp.float32)

    # nested fori loops: the k loop unrolled in Python put 9 copies of
    # the window loop into one Mosaic program and hung the remote
    # compile helper; dynamic-k nesting compiles ONE body
    def kBody(k, accOut):
        ky = k // kw
        kx = k % kw
        by = ky * dilation - padding
        bx = kx * dilation - padding
        oy = oyRef[0, k].astype(jnp.float32).reshape(TRW, dg)
        ox = oxRef[0, k].astype(jnp.float32).reshape(TRW, dg)
        mk = mRef[0, k].astype(jnp.float32).reshape(TRW, dg)

        def term(t, acc):
            dy = t // win - margin
            dx = t % win - margin
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - dy.astype(jnp.float32)))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - dx.astype(jnp.float32)))
            w8 = wy * wx * mk  # (TRW, dg)
            w64 = jnp.dot(w8, expand, preferred_element_type=jnp.float32)
            sv = slabRef[0, pl.ds(P + by + dy, _TR), pl.ds(P + bx + dx, W), :]
            return acc + w64 * sv.astype(jnp.float32).reshape(TRW, C)

        acc = lax.fori_loop(0, win * win, term, jnp.zeros((TRW, C), jnp.float32))
        return accOut + jnp.dot(
            acc.astype(wRef.dtype), wRef[k], preferred_element_type=jnp.float32
        )

    accOut = lax.fori_loop(0, K, kBody, jnp.zeros((TRW, Cout), jnp.float32))
    outRef[0] = accOut.reshape(_TR, W, Cout).astype(outDtype)


def dcnDensePallas(
    x: jnp.ndarray,  # (B, H, W, C)
    off: jnp.ndarray,  # (B, H, W, dg, K, 2) — (y, x) like torchvision
    m: jnp.ndarray,  # (B, H, W, dg, K)
    weight: jnp.ndarray,  # (kh, kw, C, Cout) HWIO
    bias,
    dg: int,
    padding: int = 1,
    dilation: int = 1,
    margin: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    assert kh == 3 and kw == 3, "kernel specialized for 3x3 DCN"
    assert H % _TR == 0, (H, _TR)
    P = margin + max(padding, dilation) + 1
    nR = H // _TR

    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    # overlapping row slabs, stacked by XLA (see module docstring)
    slabs = jnp.stack(
        [xp[:, r * _TR : r * _TR + _TR + 2 * P] for r in range(nR)], axis=1
    ).reshape(B * nR, _TR + 2 * P, W + 2 * P, C)

    def perK(a):  # (B, H, W, dg, K[, ...]) -> (B*nR, K, TR, W, dg)
        a = jnp.moveaxis(a, 4, 1)  # (B, K, H, W, dg)
        a = a.reshape(B, K, nR, _TR, W, dg)
        a = a.transpose(0, 2, 1, 3, 4, 5)
        return a.reshape(B * nR, K, _TR, W, dg)

    oy = perK(off[..., 0])
    ox = perK(off[..., 1])
    mk = perK(m)
    wStack = weight.reshape(K, C, Cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _dcnKernel, K, dg, margin, padding, dilation, W, Cout, x.dtype
        ),
        grid=(B * nR,),
        in_specs=[
            pl.BlockSpec((1, _TR + 2 * P, W + 2 * P, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, _TR, W, dg), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, K, _TR, W, dg), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, K, _TR, W, dg), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((K, C, Cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TR, W, Cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nR, _TR, W, Cout), x.dtype),
        interpret=interpret,
    )(slabs, oy, ox, mk, wStack)
    out = out.reshape(B, H, W, Cout)
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return out
