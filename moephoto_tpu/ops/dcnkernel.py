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
  - per-k offset planes carried on a LEADING K axis (sliced for free),
    TRANSPOSED to (dg, TR*tw) so the minor dim is 128-aligned (dg=8
    minor would lane-pad 16x in HBM);
  - the (dg, TR*tw) group weights broadcast to C lanes by a tiny
    (dg, C) 0/1 MXU matmul contracting dim 0 of both operands
    (lane-count-changing reshapes and transposes are rejected);
  - k taps processed in PAIRS on lane-concatenated (.., 2C) operands:
    at C=64 single-tap window FMAs pad half the 128-lane VPU, pairing
    fills them (chip A/B: 136 ms vs 207 unpaired @B=7 L1 360p, bf16
    outputs agree to 1 ulp; docs/PERF.md round 3).  Round 5: pairs are
    COLUMN-major (same kernel-column taps share bx) so each pair's
    x-sweep shrinks to the 2m+1 shifts its hats can actually be
    nonzero on, instead of the cross-column union — 48 window FMAs
    per tile at the M=1 tier vs 75 (see _dcnKernel).  The k loop is
    Python-unrolled over the 4 pairs + 1 single — compile through the
    remote helper is ~214 s cold (the vmem flag multiplies per-dot
    compile cost) but cached thereafter.

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
from jax.experimental.pallas import tpu as pltpu

_TR = 8  # output rows per program
_TW = 128  # output cols per program (W=640 blocks explode Mosaic
#            compile time through the remote helper; 128 compiles in ~10 s)


def _dcnKernel(K, dg, margin, padding, dilation, W, Cout, outDtype,
               slabRef, oyRef, oxRef, mRef, wRef, outRef):
    win = 2 * margin + 1
    kw = 3
    P = margin + max(padding, dilation) + 1
    C = slabRef.shape[-1]
    cg = C // dg
    TRW = _TR * W

    expandDims = (((0,), (0,)), ((), ()))

    # PAIRED k taps: the window-loop FMAs and the final contraction run
    # on lane-concatenated (.., 2C) operands so the 128-lane VPU/MXU is
    # fully occupied at C=64 (single-tap ops pad half the lanes).
    #
    # Pairing is COLUMN-MAJOR (taps of the same kernel column share
    # their x geometry bx): the x-hat of a tap is nonzero only for
    # integer shifts s in [bx-margin, bx+margin] (2m+1 values), but a
    # pair must sweep the UNION of its two taps' supports — row-major
    # pairs (bx differing by dilation) swept 2m+1+d shifts, and the
    # original global sweep covered all kw columns (2m+1+2d).  Same-bx
    # pairs sweep exactly 2m+1: at the production M=1 tier that is
    # 48 window FMAs per tile vs 75, and the sweeps ARE the kernel's
    # VMEM-traffic bound (docs/PERF.md round 5).
    def tapGeomS(k):
        ky, kx = k // kw, k % kw
        return ky * dilation - padding, kx * dilation - padding

    byCol = {}
    for k in range(K):
        byCol.setdefault(k % kw, []).append(k)
    pairs, rest = [], []
    for kx in sorted(byCol):
        col = list(byCol[kx])
        while len(col) >= 2:
            pairs.append((col.pop(0), col.pop(0)))
        rest += col
    rest.sort()
    while len(rest) >= 2:
        pairs.append((rest.pop(0), rest.pop(0)))
    single = rest[0] if rest else None

    def sRange(ks):
        bxs = [tapGeomS(k)[1] for k in ks]
        return min(bxs) - margin, max(bxs) + margin

    gIota = lax.broadcasted_iota(jnp.int32, (dg, C), 0)
    cIota = lax.broadcasted_iota(jnp.int32, (dg, C), 1)
    expand1 = (cIota // cg == gIota).astype(jnp.float32)
    g2 = lax.broadcasted_iota(jnp.int32, (2 * dg, 2 * C), 0)
    c2 = lax.broadcasted_iota(jnp.int32, (2 * dg, 2 * C), 1)
    expand2 = (c2 // cg == g2).astype(jnp.float32)  # block-diag 2x

    def hatsFor(k, bx, lo, hi):
        # separable bilinear hats in (dg, TRW) layout; the tap x-offset
        # bx folds into the hat argument so every column slice start in
        # the window loop stays STATIC (the slab column dim is the
        # sublane dim — dynamic starts there must be 8-aligned)
        oyT = oyRef[0, k].astype(jnp.float32)
        oxbT = oxRef[0, k].astype(jnp.float32) + float(bx)
        mkT = mRef[0, k].astype(jnp.float32)
        return [
            jnp.maximum(0.0, 1.0 - jnp.abs(oyT - float(d - margin))) * mkT
            for d in range(win)
        ] + [
            jnp.maximum(0.0, 1.0 - jnp.abs(oxbT - float(s)))
            for s in range(lo, hi + 1)
        ]

    acc = jnp.zeros((TRW, Cout), jnp.float32)

    for ka, kb in pairs:
        bya, bxa = tapGeomS(ka)
        byb, bxb = tapGeomS(kb)
        lo, hi = sRange((ka, kb))
        nSp = hi - lo + 1
        hA = jnp.concatenate(hatsFor(ka, bxa, lo, hi), axis=1)
        hB = jnp.concatenate(hatsFor(kb, bxb, lo, hi), axis=1)
        wAll = jnp.concatenate([hA, hB], axis=0)  # (2dg, (win+nSp)*TRW)
        wE = lax.dot_general(
            wAll, expand2, expandDims, preferred_element_type=jnp.float32
        )  # ((win+nSp)*TRW, 2C): lanes 0..C-1 = tap a, C..2C-1 = tap b
        wymE = [wE[d * TRW : (d + 1) * TRW] for d in range(win)]
        wxE = [wE[(win + i) * TRW : (win + i + 1) * TRW] for i in range(nSp)]
        accP = jnp.zeros((TRW, 2 * C), jnp.float32)
        for d in range(win):
            dy = d - margin
            ra = slabRef[0, pl.ds(P + bya + dy, _TR)].astype(jnp.float32)
            rb = slabRef[0, pl.ds(P + byb + dy, _TR)].astype(jnp.float32)
            rowsP = jnp.concatenate([ra, rb], axis=-1)  # (_TR, Wp, 2C)
            rowAcc = jnp.zeros((TRW, 2 * C), jnp.float32)
            for sIdx, s in enumerate(range(lo, hi + 1)):
                sv = rowsP[:, P + s : P + s + W, :].reshape(TRW, 2 * C)
                rowAcc = rowAcc + wxE[sIdx] * sv
            accP = accP + wymE[d] * rowAcc
        wP = jnp.concatenate([wRef[ka], wRef[kb]], axis=0)  # (2C, Cout)
        acc = acc + jnp.dot(
            accP.astype(wRef.dtype), wP, preferred_element_type=jnp.float32
        )

    if single is not None:
        k = single
        by, bx = tapGeomS(k)
        lo, hi = sRange((k,))
        nSp = hi - lo + 1
        hS = jnp.concatenate(hatsFor(k, bx, lo, hi), axis=1)
        wE = lax.dot_general(
            hS, expand1, expandDims, preferred_element_type=jnp.float32
        )
        wymE = [wE[d * TRW : (d + 1) * TRW] for d in range(win)]
        wxE = [wE[(win + i) * TRW : (win + i + 1) * TRW] for i in range(nSp)]
        acc1 = jnp.zeros((TRW, C), jnp.float32)
        for d in range(win):
            dy = d - margin
            rows = slabRef[0, pl.ds(P + by + dy, _TR)]
            rowAcc = jnp.zeros((TRW, C), jnp.float32)
            for sIdx, s in enumerate(range(lo, hi + 1)):
                sv = rows[:, P + s : P + s + W, :]
                rowAcc = rowAcc + wxE[sIdx] * sv.astype(jnp.float32).reshape(TRW, C)
            acc1 = acc1 + wymE[d] * rowAcc
        acc = acc + jnp.dot(
            acc1.astype(wRef.dtype), wRef[k], preferred_element_type=jnp.float32
        )

    outRef[0] = acc.reshape(_TR, W, Cout).astype(outDtype)


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
    tw = min(_TW, W)
    nCl = -(-W // tw)
    Wp = nCl * tw

    xp = jnp.pad(x, ((0, 0), (P, P), (P, P + Wp - W), (0, 0)))
    # overlapping row+col slabs, stacked by XLA (see module docstring)
    rows = jnp.stack(
        [xp[:, r * _TR : r * _TR + _TR + 2 * P] for r in range(nR)], axis=1
    )  # (B, nR, TR+2P, Wp+2P, C)
    slabs = jnp.stack(
        [rows[:, :, :, c * tw : c * tw + tw + 2 * P] for c in range(nCl)], axis=2
    ).reshape(B * nR * nCl, _TR + 2 * P, tw + 2 * P, C)

    def perK(a):  # (B, H, W, dg, K) -> (B*nR*nCl, K, dg, TR*tw) f32
        a = jnp.moveaxis(a, 4, 1)  # (B, K, H, W, dg)
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, Wp - W), (0, 0)))
        a = a.reshape(B, K, nR, _TR, nCl, tw, dg)
        a = a.transpose(0, 2, 4, 1, 6, 3, 5)  # (B, nR, nCl, K, dg, TR, tw)
        # materialize the operand in f32: a bf16 (dg=8, TRW) block pads
        # its sublane dim to the (16, 128) bf16 tile — same HBM bytes as
        # f32, so the exact dtype is free and the kernel skips the cast
        return a.reshape(B * nR * nCl, K, dg, _TR * tw).astype(jnp.float32)

    oy = perK(off[..., 0])
    ox = perK(off[..., 1])
    mk = perK(m)
    wStack = weight.reshape(K, C, Cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _dcnKernel, K, dg, margin, padding, dilation, tw, Cout, x.dtype
        ),
        grid=(B * nR * nCl,),
        in_specs=[
            pl.BlockSpec((1, _TR + 2 * P, tw + 2 * P, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, dg, _TR * tw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, dg, _TR * tw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, K, dg, _TR * tw), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((K, C, Cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TR, tw, Cout), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nR * nCl, _TR, tw, Cout), x.dtype),
        interpret=interpret,
        # the default 16 MB scoped-vmem budget trips XLA's stack check
        # once the grid exceeds ~8 programs (measured: grid 40 wants
        # 27 MB); the per-program working set is ~2 MB, v5e VMEM is 128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(slabs, oy, ox, mk, wStack)
    out = out.reshape(B, nR, nCl, _TR, tw, Cout).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(B, H, Wp, Cout)[:, :, :W]
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return out
