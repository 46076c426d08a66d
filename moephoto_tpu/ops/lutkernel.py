"""Pallas adaptive-LUT transform kernel (TPU).

The XLA formulation (ops/lut.ailutTransform) costs ~48 ms @1080p: the
vectorized binary search materializes a (D, H*W) compare matrix in HBM
and the 8 corner lookups run as flat XLA gathers (~1 ns/element).  This
kernel removes BOTH: per pixel tile it builds the trilinear
*hat weights* over the adaptive vertex grid directly in VMEM and
contracts the (green, blue) plane selection with ONE MXU matmul against
the (D*D, C*D) LUT matrix — the same gather->hat-matmul trade as the
DCNv2 kernel (ops/dcnkernel.py).

Math: for a piecewise-linear hat on a non-uniform sorted grid v[0..D-1],
    w_i(x) = clamp((x - v[i-1]) / (v[i] - v[i-1]), 0, 1)
           + clamp((v[i+1] - x) / (v[i+1] - v[i]), 0, 1) - 1
(with v[-1] = -inf, v[D] = +inf), which reproduces lower_bound +
fractional interpolation exactly for x inside [v[0], v[D-1]]; inputs are
clamped to that range first (the CUDA kernel linearly extrapolates
outside it — retouch inputs are [0, 1] images so the paths agree there;
the XLA path stays the parity reference).

Then per pixel p and channel c:
    out[p, c] = sum_{b,g,r} wB[p,b] wG[p,g] wR[p,r] LUT[c, b, g, r]
              = sum_r wR[p, r] * (Wgb[p, :] @ LUTmat[:, c*D + r])
with Wgb[p, b*D+g] = wB[p,b]*wG[p,g] built by lane-broadcast/tile of the
two (T, D) hat blocks, and the final r-contraction done by a static
(C*D, C) 0/1 selector matmul.

Reference semantics: ailut_transform_cuda.cu:88-159 (lut layout
lut[b, c, bid, gid, rid], i.e. red minor).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TPX = 512  # pixels per program (sublane rows; 256 and >=2048 crash the
#             v5e Mosaic compile helper — docs/PERF.md)

_BIG = 1e30


def _hats(x, vPrev, vCur, vNext):
    """(T, D) hat weights of value column x (T, 1) against per-lane
    vertex tables (1, D)."""
    up = jnp.clip((x - vPrev) / (vCur - vPrev), 0.0, 1.0)
    dn = jnp.clip((vNext - x) / (vNext - vCur), 0.0, 1.0)
    return up + dn - 1.0


def _lutKernel(D, C, imgRef, tabRef, lutRef, selRef, eBRef, eGRef, eRRef, outRef):
    img = imgRef[...].astype(jnp.float32)  # (T, 3)
    r = img[:, 0:1]
    g = img[:, 1:2]
    b = img[:, 2:3]
    # clamp to the vertex range (see module docstring)
    lo = tabRef[9, 0:1][None]
    hi = tabRef[10, 0:1][None]
    r = jnp.clip(r, lo, hi)
    g = jnp.clip(g, lo, hi)
    b = jnp.clip(b, lo, hi)

    # per-axis hat blocks (T, D) against the (1, D) vertex tables
    wR = _hats(r, tabRef[0:1, :D], tabRef[1:2, :D], tabRef[2:3, :D])
    wG = _hats(g, tabRef[3:4, :D], tabRef[4:5, :D], tabRef[5:6, :D])
    wB = _hats(b, tabRef[6:7, :D], tabRef[7:8, :D], tabRef[8:9, :D])

    # lane expansions via 0/1 MXU dots, NOT lane concatenation: a
    # D-piece concat at 33-lane offsets lowers to cross-lane shuffles
    # that dominated the first kernel (35 of its 42 ms); a (T, D) @
    # (D, D*D) dot lands every element lane-aligned for free.  The 0/1
    # matrices are HOST-built operands — iota/compare construction
    # inside the kernel blew Mosaic compile time past 15 minutes
    dot = lambda a_, b_: lax.dot_general(
        a_, b_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    wgb = dot(wB, eBRef[...]) * dot(wG, eGRef[...])  # (T, DD)

    # plane-selection matmul: (T, DD) @ (DD, C*D) -> per pixel the
    # g/b-interpolated red rows of every channel.  bf16 operands, f32
    # accumulation (~4e-3 relative rounding — the same class as the XLA
    # path's own TPU default-precision matmuls)
    a = jnp.dot(
        wgb.astype(jnp.bfloat16),
        lutRef[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (T, C*D)

    # r-contraction: multiply by the expanded wR, then the static 0/1
    # selector dot sums each channel's D lanes
    out = jnp.dot(
        a * dot(wR, eRRef[...]), selRef[...], preferred_element_type=jnp.float32
    )
    outRef[...] = out.astype(outRef.dtype)


# pixels (lanes) per program for the lanes-major variant.  Round-4 chip
# sweep @1080p: 512 -> 11.61 ms, 1024 -> 10.99, 2048 -> 10.64,
# 4096 -> 10.40 (amortizes per-program overhead; the constant-block LUT
# operands hoist, so VMEM stays ~small).  A sublane repeat/tile wgb
# construction (replacing the two f32 expansion dots) measured SLOWER
# (11.5 ms) — Mosaic sublane repeats cost more than the MXU dots.
_TLX = 4096


def _lutKernelT(D, C, exact, imgRef, tabRef, lutRef, selRef, tabGBRef, tabRRef, outRef):
    """Lanes-major twin of _lutKernel: pixels ride the LANE axis so the
    image/output DMAs are dense (the pixel-major kernel moves (T, 3)
    blocks at 3/128 lane fill).

    Hat weights are evaluated DIRECTLY at their expanded row positions
    against host-built (D*D, 16)/(C*D, 8) vertex tables — pure f32 VPU
    ops — instead of (D, T) hats pushed through 0/1 expansion-matrix
    MXU dots: on TPU a dot truncates its f32 operand to bf16 regardless
    of dtype (default matmul precision; measured 6.3e-3 maxabs on chip
    while interpret mode shows 7e-6), and exact-f32 sublane-broadcast
    expansion measured 36.4 ms @1080p.

    ``exact``: run the main (C*D, D*D)@(D*D, T) contraction as a bf16x2
    hi/lo split (3 MXU passes, lo*lo ~2^-18 dropped) and the final
    C-selection likewise — ~f32 accuracy end to end.  fp32 images take
    it by default: the reference pins AiLUT to fp32 (AiLUT.py:157), so
    this IS the production retouch path.  bf16 images keep the single
    bf16 dot (the operands carry bf16 error already)."""
    rgb = imgRef[...].astype(jnp.float32)  # (3, T)
    r = rgb[0:1, :]
    g = rgb[1:2, :]
    b = rgb[2:3, :]

    def hats(tRef, x, c0):  # (1, T) vs (R, 1) vertex columns -> (R, T)
        # per-row clip BOUNDS (columns c0+4..c0+7) encode the CUDA
        # algorithm's out-of-range EXTRAPOLATION (ailut_transform_cuda
        # .cu:88-159 computes an unclamped fraction in the clamped edge
        # bin): row 0's dn may exceed 1 (x < v0 -> weight 1-f > 1),
        # row 1's up may go negative (weight f < 0), and symmetrically
        # rows D-1/D-2 on the high side; every interior row keeps the
        # standard [0, 1] hat clips.  The old kernel clamped x into the
        # vertex range instead, which silently diverged on unclipped
        # upstream stages (AOD output) — the 39.41 dB chain-4 finding.
        vPrev = tRef[:, c0 : c0 + 1]
        invUp = tRef[:, c0 + 1 : c0 + 2]
        vNext = tRef[:, c0 + 2 : c0 + 3]
        invDn = tRef[:, c0 + 3 : c0 + 4]
        upLo = tRef[:, c0 + 4 : c0 + 5]
        upHi = tRef[:, c0 + 5 : c0 + 6]
        dnLo = tRef[:, c0 + 6 : c0 + 7]
        dnHi = tRef[:, c0 + 7 : c0 + 8]
        up = jnp.clip((x - vPrev) * invUp, upLo, upHi)
        dn = jnp.clip((vNext - x) * invDn, dnLo, dnHi)
        return up + dn - 1.0

    wgb = hats(tabGBRef, b, 0) * hats(tabGBRef, g, 8)  # (DD, T)
    wRfull = hats(tabRRef, r, 0)  # (CD, T)

    mm = lambda x_, y_: jnp.dot(x_, y_, preferred_element_type=jnp.float32)
    if exact:
        lutF = lutRef[...]
        lutHi = lutF.astype(jnp.bfloat16)
        lutLo = (lutF - lutHi.astype(jnp.float32)).astype(jnp.bfloat16)
        wHi = wgb.astype(jnp.bfloat16)
        wLo = (wgb - wHi.astype(jnp.float32)).astype(jnp.bfloat16)
        a = mm(lutHi, wHi) + (mm(lutHi, wLo) + mm(lutLo, wHi))  # (C*D, T)
        aw = a * wRfull  # (C*D, T)
        awHi = aw.astype(jnp.bfloat16)
        awLo = (aw - awHi.astype(jnp.float32)).astype(jnp.bfloat16)
        sel16 = selRef[...].astype(jnp.bfloat16)
        out = mm(sel16, awHi) + mm(sel16, awLo)  # (C, T)
    else:
        a = jnp.dot(
            lutRef[...].astype(jnp.bfloat16),
            wgb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (C*D, T)
        out = mm(selRef[...], a * wRfull)  # (C, T)
    outRef[...] = out.astype(outRef.dtype)


def ailutTransformPallasT(
    img: jnp.ndarray,  # (B, H, W, 3)
    lut: jnp.ndarray,  # (B, C, D, D, D) red-minor
    vertices: jnp.ndarray,  # (B, 3, D) sorted
    interpret: bool = False,
    exact: bool = None,
) -> jnp.ndarray:
    """Lanes-major ailutTransformPallas (pixels along lanes; one XLA
    transpose each way).  ``exact`` (default: img is fp32) selects the
    bf16x2 split main dot — see _lutKernelT."""
    B, H, W, _ = img.shape
    C = lut.shape[1]
    D = lut.shape[-1]
    N = H * W
    Np = -(-N // _TLX) * _TLX
    f32 = jnp.float32
    if exact is None:
        exact = img.dtype == f32

    selT = (
        lax.broadcasted_iota(jnp.int32, (C, C * D), 1) // D
        == lax.broadcasted_iota(jnp.int32, (C, C * D), 0)
    ).astype(f32)
    lanes = np.arange(D * D)
    iB = lanes // D  # static row->B-vertex index
    iG = lanes % D
    iR = np.arange(C * D) % D

    outs = []
    for bi in range(B):
        flatT = img[bi].reshape(N, 3).astype(f32).T  # (3, N)
        flatT = jnp.pad(flatT, ((0, 0), (0, Np - N)))
        # lutMatT (C*D, D*D): row c*D+rid, lane bid*D+gid
        lutMatT = (
            lut[bi].astype(f32).transpose(0, 3, 1, 2).reshape(C * D, D * D)
        )
        tabT = _tables(vertices[bi], D).T  # (D, 11)

        # expanded hat tables: [vPrev, 1/(vCur-vPrev), vNext,
        # 1/(vNext-vCur), upLo, upHi, dnLo, dnHi] per kernel row
        # (static gathers; reciprocals host-side so the kernel
        # multiplies instead of dividing — <=2 ulp vs the XLA
        # transform's division).  The clip-bound columns relax specific
        # edge-row clips to reproduce the CUDA algorithm's linear
        # extrapolation outside the vertex range (see _lutKernelT).
        def hatCols(c0, idx):
            vP, vC, vN = tabT[:, c0], tabT[:, c0 + 1], tabT[:, c0 + 2]
            Dv = tabT.shape[0]
            upLo = np.zeros(Dv, np.float32)
            upLo[1] = -_BIG  # row 1: weight f may go negative below v0
            upHi = np.ones(Dv, np.float32)
            upHi[Dv - 1] = _BIG  # row D-1: weight g may exceed 1
            dnLo = np.zeros(Dv, np.float32)
            dnLo[Dv - 2] = -_BIG  # row D-2: weight 1-g may go negative
            dnHi = np.ones(Dv, np.float32)
            dnHi[0] = _BIG  # row 0: weight 1-f may exceed 1
            return [
                vP[idx], (1.0 / (vC - vP))[idx], vN[idx], (1.0 / (vN - vC))[idx],
                jnp.asarray(upLo[idx]), jnp.asarray(upHi[idx]),
                jnp.asarray(dnLo[idx]), jnp.asarray(dnHi[idx]),
            ]

        tabGB = jnp.stack(hatCols(6, iB) + hatCols(3, iG), axis=1)  # (DD, 16)
        tabR = jnp.stack(hatCols(0, iR), axis=1)  # (CD, 8)
        out = pl.pallas_call(
            functools.partial(_lutKernelT, D, C, exact),
            grid=(Np // _TLX,),
            in_specs=[
                pl.BlockSpec((3, _TLX), lambda i: (0, i)),
                pl.BlockSpec((D, 11), lambda i: (0, 0)),
                pl.BlockSpec((C * D, D * D), lambda i: (0, 0)),
                pl.BlockSpec((C, C * D), lambda i: (0, 0)),
                pl.BlockSpec((D * D, 16), lambda i: (0, 0)),
                pl.BlockSpec((C * D, 8), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, _TLX), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((C, Np), f32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(flatT, tabT, lutMatT, selT, tabGB, tabR)
        outs.append(out[:, :N].T.reshape(H, W, C))
    return jnp.stack(outs).astype(img.dtype)


def ailutTransformPallasSpmd(
    img: jnp.ndarray,  # (B, H, W, 3)
    lut: jnp.ndarray,  # (B, C, D, D, D) red-minor
    vertices: jnp.ndarray,  # (B, 3, D) sorted
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`ailutTransformPallas` for row-sharded SPMD stage traces.

    The LUT transform is pointwise per pixel (each output pixel depends
    only on its own input pixel plus the per-image LUT/vertices), so —
    unlike the warp/DCN wrappers — no halo exchange is needed: the
    kernel runs per-shard inside ``shard_map`` over the ('sp',) row mesh
    with the LUT and vertex tables replicated.  Falls back to the exact
    XLA transform when no mesh is active or rows don't divide."""
    from jax.sharding import PartitionSpec as P

    from moephoto_tpu.ops.lut import ailutTransform
    from moephoto_tpu.parallel.temporal import videoMesh

    mesh = videoMesh()
    H = img.shape[1]
    if mesh is None or H % mesh.devices.size != 0:
        return ailutTransform(img, lut, vertices)

    def local(a, l, v):
        return ailutTransformPallasT(a, l, v, interpret=interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "sp"), P(), P()),
        out_specs=P(None, "sp"),
        check_vma=False,
    )(img, lut, vertices)


def _tables(vt, D):  # (3, D) -> (11, D) prev/cur/next per axis + clamp rows
    f32 = jnp.float32
    pads = []
    for a in (0, 1, 2):  # r, g, b
        v = vt[a].astype(f32)
        pads.append(jnp.concatenate([jnp.full((1,), -_BIG, f32), v[:-1]]))
        pads.append(v)
        pads.append(jnp.concatenate([v[1:], jnp.full((1,), _BIG, f32)]))
    lo = jnp.max(jnp.stack([vt[0, 0], vt[1, 0], vt[2, 0]])).reshape(1)
    hi = jnp.min(jnp.stack([vt[0, -1], vt[1, -1], vt[2, -1]])).reshape(1)
    pads.append(jnp.pad(lo, (0, D - 1)))
    pads.append(jnp.pad(hi, (0, D - 1)))
    return jnp.stack(pads)  # (11, D)


def ailutTransformPallas(
    img: jnp.ndarray,  # (B, H, W, 3)
    lut: jnp.ndarray,  # (B, C, D, D, D) red-minor
    vertices: jnp.ndarray,  # (B, 3, D) sorted
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, W, _ = img.shape
    C = lut.shape[1]
    D = lut.shape[-1]
    N = H * W
    Np = -(-N // _TPX) * _TPX
    f32 = jnp.float32

    # static (C*D, C) selector: lane c*D+r contributes to channel c
    sel = (
        lax.broadcasted_iota(jnp.int32, (C * D, C), 0) // D
        == lax.broadcasted_iota(jnp.int32, (C * D, C), 1)
    ).astype(f32)
    # host-built 0/1 lane-expansion matrices (see kernel docstring)
    lanes = np.arange(D * D)
    eB = jnp.asarray((lanes // D == np.arange(D)[:, None]).astype(np.float32))
    eG = jnp.asarray((lanes % D == np.arange(D)[:, None]).astype(np.float32))
    lanesC = np.arange(C * D)
    eR = jnp.asarray((lanesC % D == np.arange(D)[:, None]).astype(np.float32))

    outs = []
    for bi in range(B):
        flat = img[bi].reshape(N, 3).astype(f32)
        flat = jnp.pad(flat, ((0, Np - N), (0, 0)))
        # LUTmat (D*D, C*D): row bid*D+gid, lane c*D+rid
        lutMat = (
            lut[bi].astype(f32).transpose(1, 2, 0, 3).reshape(D * D, C * D)
        )
        tab = _tables(vertices[bi], D)
        out = pl.pallas_call(
            functools.partial(_lutKernel, D, C),
            grid=(Np // _TPX,),
            in_specs=[
                pl.BlockSpec((_TPX, 3), lambda i: (i, 0)),
                pl.BlockSpec((11, D), lambda i: (0, 0)),
                pl.BlockSpec((D * D, C * D), lambda i: (0, 0)),
                pl.BlockSpec((C * D, C), lambda i: (0, 0)),
                pl.BlockSpec((D, D * D), lambda i: (0, 0)),
                pl.BlockSpec((D, D * D), lambda i: (0, 0)),
                pl.BlockSpec((D, C * D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_TPX, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((Np, C), f32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(flat, tab, lutMat, sel, eB, eG, eR)
        outs.append(out[:N].reshape(H, W, C))
    return jnp.stack(outs).astype(img.dtype)
