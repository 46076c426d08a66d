"""Y-channel SR / denoise families: MyNet (Net2x/3x/4x), NetDN, SEDN,
MoeNet_lite2.

Reference definitions: ``python/models.py:108-223`` and
``python/MoeNet_lite2.py``.  All operate on single-channel planes
(B, H, W, 1); the executor folds RGB channels into the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    deferredSubpixelConv,
    getPrecision,
    globalAvgPool,
    interleaveDeferred,
    interleaveNested,
    leakyRelu,
    prelu,
    sigmoid,
)
from moephoto_tpu.models.blocks import arsb, frm


def _mynetTrunk(params: Params, x: jnp.ndarray, nBlocks: int = 6):
    """Shared MyNet stem: conv_input -> PReLU; conv_input2; ARSB chain."""
    out = prelu(params, "relu", conv2d(params, "conv_input", x, padding=1))
    conv1 = conv2d(params, "conv_input2", out, padding=1)
    f = conv1
    for i in range(nBlocks):
        f = arsb(params, f"convt_F{i + 1}", f)
    return out, f


def _permutePSWeight(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reorder conv output channels from torch pixel-shuffle order
    (co*r^2 + a*r + b) to deferred sub-pixel order (a, b, co)."""
    kh, kw, cin, ctot = w.shape
    co = ctot // (r * r)
    wp = w.reshape(kh, kw, cin, co, r, r)
    return jnp.transpose(wp, (0, 1, 2, 4, 5, 3)).reshape(kh, kw, cin, ctot)


def _permutePSBias(b: jnp.ndarray, r: int) -> jnp.ndarray:
    co = b.shape[0] // (r * r)
    return jnp.transpose(b.reshape(co, r, r), (1, 2, 0)).reshape(-1)


def _upPathDeferred(params: Params, prefix: str, x: jnp.ndarray, nUps: int, r: int) -> jnp.ndarray:
    """The ``u``/``convt_R1`` upsample paths of Net2x/3x/4x
    (models.py:125-154) computed entirely in the deferred sub-pixel
    layout — no pixel-shuffle interleaves until the caller's final
    1-channel assembly.  Returns (b, h, w, R, C, 1)."""
    b, h, w, c = x.shape
    cur = x.reshape(b, h, w, 1, 1, c)
    R = 1
    for i in range(nUps):
        key = f"{prefix}.{i}.0"
        wp = _permutePSWeight(params[key + ".weight"], r).astype(cur.dtype)
        bp = _permutePSBias(params[key + ".bias"], r)
        if R == 1:
            xi = cur.reshape(b, h, w, -1)
            dn = jax.lax.conv_dimension_numbers(
                xi.shape, wp.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                xi, wp, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                precision=getPrecision(), preferred_element_type=jnp.float32,
            )
            y = (y + bp.astype(jnp.float32)).astype(cur.dtype)
            co = y.shape[-1] // (r * r)
            y = y.reshape(b, h, w, r, r, co)
        else:
            y = deferredSubpixelConv(wp, cur, bp)  # (b,h,w,R,C, r*r*co)
            co = y.shape[-1] // (r * r)
            y = y.reshape(b, h, w, R, R, r, r, co)
            y = jnp.transpose(y, (0, 1, 2, 3, 5, 4, 6, 7))  # (R, a) (C, b)
            y = y.reshape(b, h, w, R * r, R * r, co)
        R *= r
        cur = prelu(params, f"{prefix}.{i}.2", y)
    wf = params[f"{prefix}.{nUps}.weight"].astype(cur.dtype)
    if R == 1:
        return conv2d(params, f"{prefix}.{nUps}", cur.reshape(b, h, w, -1), padding=1)[
            :, :, :, None, None, :
        ]
    return deferredSubpixelConv(wf, cur)


def makeMyNetSR(scale: int):
    nUps, r = {2: (1, 2), 3: (1, 3), 4: (2, 2)}[scale]

    def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
        out, f = _mynetTrunk(params, x)
        u = _upPathDeferred(params, "u", out, nUps, r)
        res = _upPathDeferred(params, "convt_R1", f, nUps, r)
        return interleaveDeferred(u + res)

    return apply


net2x = makeMyNetSR(2)
net3x = makeMyNetSR(3)
net4x = makeMyNetSR(4)


def netDN(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Light denoise: 48-ch MyNet with plain conv heads (models.py:158-164)."""
    out, f = _mynetTrunk(params, x)
    u = conv2d(params, "u", out, padding=1)
    res = conv2d(params, "convt_R1", f, padding=1)
    return u + res


def netDNS2dParams(params: Params) -> Params:
    """One-time weight transform for :func:`netDNS2d` (models/s2d.py)."""
    from moephoto_tpu.models.s2d import s2dTransform

    c3 = ["conv_input", "conv_input2", "u", "convt_R1"]
    vecs = ["relu.weight"]
    for i in range(6):
        c3 += [f"convt_F{i + 1}.0.conv_1", f"convt_F{i + 1}.0.conv_2"]
        vecs += [f"convt_F{i + 1}.0.relu.weight"]
    return s2dTransform(params, c3, vecs=vecs)


def netDNS2d(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """netDN executed in the space-to-depth domain: 48-ch convs run at
    ~17 TF/s on v5e from lane padding; the 4x-channel zero-structured
    equivalent kernel wins 1.48x per original pixel composed with plane
    packing (models/s2d.py).  Params must be pre-transformed by
    :func:`netDNS2dParams`; the graph itself is unchanged — ARSB blocks,
    PReLU and the residual heads all commute with the domain change."""
    from moephoto_tpu.models.s2d import depthToSpace2, spaceToDepth2

    x2 = spaceToDepth2(x)
    out, f = _mynetTrunk(params, x2)
    u = conv2d(params, "u", out, padding=1)
    res = conv2d(params, "convt_R1", f, padding=1)
    return depthToSpace2(u + res)


def _sednBlock(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """SE residual conv block (reference ``_Conv_Block`` models.py:166-206).

    The SE tail is restructured for the TPU (same math): the squeeze
    convs run as (B, C) dots, and the per-(batch, channel) excitation
    scale folds into the 1x1 ``trans`` weight —
    ``(out * s) @ W == out @ (s[:, None] * W)`` — so one batched MXU
    matmul replaces the full-tensor broadcast multiply + conv that broke
    conv-to-conv fusion (~35% of the block, docs/PERF.md SEDN roofline).
    """
    out = conv2d(params, p + ".rblock.0", x, padding=1)
    out = leakyRelu(out)
    out = conv2d(params, p + ".rblock.2", out, padding=1)
    out = leakyRelu(out)
    out = conv2d(params, p + ".rblock.4", out, padding=1)
    se = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # (B, C) GAP
    for key, act in ((".conv_down", leakyRelu), (".conv_up", None)):
        w = params[p + key + ".weight"]  # (1, 1, cin, cout) HWIO
        se = jnp.dot(se, w[0, 0].astype(jnp.float32),
                     precision=getPrecision(), preferred_element_type=jnp.float32)
        b = params.get(p + key + ".bias")
        if b is not None:
            se = se + b.astype(jnp.float32)
        if act is not None:
            se = act(se)
    wT = params[p + ".trans.0.weight"]  # (1, 1, C, K)
    wEff = (sigmoid(se)[:, :, None] * wT[0, 0].astype(jnp.float32)).astype(out.dtype)
    y = jnp.einsum("bhwc,bck->bhwk", out, wEff,
                   precision=getPrecision(), preferred_element_type=jnp.float32)
    bT = params.get(p + ".trans.0.bias")
    if bT is not None:
        y = y + bT.astype(jnp.float32)
    return x + leakyRelu(y.astype(out.dtype))


def sedn(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Strong denoise: 16 SE residual blocks (models.py:210-223)."""
    out = leakyRelu(conv2d(params, "conv_input", x, padding=1))
    f = out
    for i in range(16):
        f = _sednBlock(params, f"convt_F1.{i}", f)
    return x + conv2d(params, "convt_R1", f, padding=1)


def _lb(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """MoeNet_lite2 LB block (MoeNet_lite2.py:8-20)."""
    out = prelu(params, p + ".relu", conv2d(params, p + ".conv_1", x, padding=1))
    out = conv2d(params, p + ".conv_2", out, padding=1)
    return frm(params, p + ".se", out) + x


def makeMoeNetLite2(upscale: int = 2, fused: bool = False):
    """MoeNet_lite2 with TPU-fused upsampling.

    Everything after the first pixel shuffle in the reference is
    pointwise (1x1 convs + PReLU + final 1x1 heads), so instead of
    materializing spatially-interleaved tensors per stage (a strided
    512^2 transpose that dominated profiles at ~19 ms/stage), sub-pixel
    offsets are carried as nested trailing axes (b, h, w, 2, 2, ..., 48)
    and interleaved ONCE on the 1-channel output.  Bit-identical math —
    only the data layout of intermediates changes.
    """
    nUps = int(upscale).bit_length() - 1

    def pointwise(params: Params, key: str, x: jnp.ndarray) -> jnp.ndarray:
        w = params[key + ".weight"][0, 0]  # (cin, cout)
        y = jnp.dot(x, w.astype(x.dtype), precision=getPrecision(),
                    preferred_element_type=jnp.float32)
        b = params.get(key + ".bias")
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)

    def upStage(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
        # x: (b, h, w, <subpos...>, c) -> same + a trailing (2, 2) pair.
        # ONE matmul with the weight's output columns pre-ordered
        # (row, col, co): N=192 keeps the MXU's lane blocks 2x fuller
        # than four N=48 calls, and appending the sub-position axes
        # nested (instead of merging into (2R, 2C)) removes the per-stage
        # interleaving stacks entirely — the single strided transpose
        # happens on the 1-channel output in interleaveNested.
        c = x.shape[-1]
        wFull = params[p + ".0.weight"][0, 0]  # (c, c*4), cols = co*4+a*2+b_
        wp = wFull.reshape(c, c, 2, 2)  # (cin, co, a, b_)
        wp = jnp.transpose(wp, (0, 2, 3, 1)).reshape(c, 4 * c)  # cols (a,b_,co)
        bp = jnp.transpose(params[p + ".0.bias"].reshape(c, 2, 2), (1, 2, 0))
        y = jnp.dot(
            x, wp.astype(x.dtype),
            precision=getPrecision(), preferred_element_type=jnp.float32,
        ) + bp.reshape(-1).astype(jnp.float32)
        y = y.astype(x.dtype).reshape(x.shape[:-1] + (2, 2, c))
        return prelu(params, p + ".2", y)

    def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
        out = prelu(params, "relu", conv2d(params, "conv_input", x))
        conv1 = conv2d(params, "conv_input2", out)
        f = _lb(params, "convt_F11", conv1)
        f = _lb(params, "convt_F12", f)
        res = _lb(params, "convt_F13", f)
        im = out
        if fused:
            # whole up path + heads in one VMEM-resident Pallas kernel
            from moephoto_tpu.ops.fusedup import fusedUpHeads

            b, h, w, c = res.shape
            flat = fusedUpHeads(
                params, res.reshape(-1, c), im.reshape(-1, c), nUps
            )
            hr = flat.reshape((b, h, w) + (2, 2) * nUps + (-1,))
            return interleaveNested(hr, nUps)
        for i in range(nUps):
            res = upStage(params, f"ures.{i}", res)
            im = upStage(params, f"uim.{i}", im)
        hr = pointwise(params, "convt_R1", res) + pointwise(params, "convt_I1", im)
        # single final interleave on the (1- or pack-) channel map
        return interleaveNested(hr, nUps)

    return apply


moeNetLite2x2 = makeMoeNetLite2(2)
moeNetLite2x4 = makeMoeNetLite2(4)
moeNetLite2x8 = makeMoeNetLite2(8)
# TPU production variants (Pallas fused up path; used by the registry
# when compute runs in bf16 — the XLA path above stays the CPU/parity
# reference)
moeNetLite2x2F = makeMoeNetLite2(2, fused=True)
moeNetLite2x4F = makeMoeNetLite2(4, fused=True)
moeNetLite2x8F = makeMoeNetLite2(8, fused=True)
