"""IconVSR bidirectional recurrent video super-resolution x4
(reference ``python/videoSR.py``).

Components: SpyNet 6-level pyramid optical flow, EDVR keyframe feature
extractor (PCD deformable alignment + TSA fusion), backward/forward
recurrent trunks with keyframe fusion, pixel-shuffle upsampler.

Streaming structure mirrors the reference graph (``doVSR`` :502-541):
the backward pass runs on 20-frame chunks with fresh state (bounded
lookahead), forward is strictly recurrent, keyframes every 7 frames.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from moephoto_tpu.config import config
from moephoto_tpu.engine.stream import (
    InfiniteSource,
    Stream,
    StreamGraph,
    stackRuns,
)
from moephoto_tpu.models.api import (
    Params,
    avgPool2d,
    conv2d,
    deferredSubpixelConv,
    interleaveDeferred,
    leakyRelu,
    maxPool2d,
    pixelShuffle,
    resizeBilinear,
    resizeBilinear2x,
    sigmoid,
)
from moephoto_tpu.models.blocks import residualBlockNoBN
from moephoto_tpu.models.streamcommon import StreamOpt, alignPad, makeStreamFunc
from moephoto_tpu.parallel.temporal import stageJit
from moephoto_tpu.ops.deform import modulatedDeformConvPack
from moephoto_tpu.ops.warp import backWarp
from moephoto_tpu.progress import Node

RefTime = 7
NumFeat = 64
BackwardChunk = 20

modelPath_ = "model/vsr/IconVSR_Vimeo90K_BDx4-cfcb7e00.pth"

_SPY_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_SPY_STD = np.array([0.229, 0.224, 0.225], np.float32)


_SPY_PACK_S = [None]


def _spyPackMatrix() -> np.ndarray:
    """0/1 selection tensor scattering a 7x7 stride-1 fine-grid kernel
    onto the 2x2-packed (space-to-depth) layout.

    Fine output row ``2i + a`` reads fine input row ``2j + p`` at tap
    ``dy = 2*(j - i) + p - a``; over ``dy in [-3, 3]`` the packed row
    offset ``j - i`` spans ``[-2, 2]`` — a 5x5 packed kernel whose
    (Y, X, in-phase u=p*2+q, out-phase v=a*2+b) slot holds fine tap
    (dy+3, dx+3), zero where |dy| or |dx| > 3 (49% of slots).  Each
    slot has at most ONE source tap, so packing is exact in any dtype.
    """
    if _SPY_PACK_S[0] is None:
        S = np.zeros((5, 5, 4, 4, 7, 7), np.float32)
        for a in range(2):
            for b in range(2):
                for p in range(2):
                    for q in range(2):
                        for Y in range(5):
                            dy = 2 * (Y - 2) + p - a
                            if abs(dy) > 3:
                                continue
                            for X in range(5):
                                dx = 2 * (X - 2) + q - b
                                if abs(dx) > 3:
                                    continue
                                S[Y, X, p * 2 + q, a * 2 + b, dy + 3, dx + 3] = 1
        _SPY_PACK_S[0] = S
    return _SPY_PACK_S[0]


def _spyConvPacked(params: Params, key: str, xp: jnp.ndarray) -> jnp.ndarray:
    """One SpyNet 7x7 conv evaluated on the 2x2-packed layout: 5x5 conv
    over 4x the channels.  2.04x the MACs of the fine form, but C=128/256
    fills the MXU lanes the fine C=32/64 convs leave half-empty — the
    packed probe ran the same pixel coverage 3.4x faster (round 5,
    docs/PERF.md SpyNet section)."""
    from moephoto_tpu.models.api import _convPET, _precision

    wf = params[key + ".weight"]  # (7, 7, cin, cout) HWIO
    S = jnp.asarray(_spyPackMatrix(), wf.dtype)
    cin, cout = wf.shape[2], wf.shape[3]
    # channel layout matches pixelUnshuffle/pixelShuffle: c*4 + i*2 + j
    wp = jnp.einsum("YXuvyx,yxio->YXiuov", S, wf).reshape(5, 5, 4 * cin, 4 * cout)
    dn = jax.lax.conv_dimension_numbers(xp.shape, wp.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xp, wp.astype(xp.dtype), (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=dn,
        precision=_precision[0],
        preferred_element_type=_convPET[0],
    )
    b = params.get(key + ".bias")
    if b is not None:
        y = y + jnp.repeat(b, 4).astype(y.dtype)
    return y.astype(xp.dtype)


def _spyModulePacked(
    params: Params, level: int, inp: jnp.ndarray
) -> jnp.ndarray:
    """The 5-conv basic_module on the packed layout: one unshuffle in,
    one shuffle out; ReLU is elementwise (layout-invariant)."""
    from moephoto_tpu.models.api import pixelUnshuffle

    xp = pixelUnshuffle(inp, 2)  # (B, H/2, W/2, 32)
    p = f"spynet.basic_module.{level}"
    for j in range(0, 9, 2):
        xp = _spyConvPacked(params, f"{p}.{j}", xp)
        if j < 8:
            xp = jax.nn.relu(xp)
    return pixelShuffle(xp, 2)  # (B, H, W, 2)


def spynetApply(params: Params, pair: jnp.ndarray) -> jnp.ndarray:
    """SpyNet (videoSR.py:87-137): pair (B, 2, H, W, 3) -> flow (B, H, W, 2).

    H, W must be multiples of 64 (6 halvings, asserted in the ref :125).
    """
    mean = jnp.asarray(_SPY_MEAN).reshape(1, 1, 1, 3)
    std = jnp.asarray(_SPY_STD).reshape(1, 1, 1, 3)
    ref = [(pair[:, 0] - mean.astype(pair.dtype)) / std.astype(pair.dtype)]
    supp = [(pair[:, 1] - mean.astype(pair.dtype)) / std.astype(pair.dtype)]
    for _ in range(5):
        ref.insert(0, avgPool2d(ref[0], 2, 2, count_include_pad=False))
        supp.insert(0, avgPool2d(supp[0], 2, 2, count_include_pad=False))
    B, H0, W0, _ = ref[0].shape
    flow = jnp.zeros((B, H0 // 2, W0 // 2, 2), pair.dtype)
    for level in range(6):
        h, w = ref[level].shape[1], ref[level].shape[2]
        up = (
            resizeBilinear(flow, h, w, align_corners=True) * 2.0
        )
        # 3-ch pyramid warps: bf16/TPU rides the Pallas bounded kernel
        # (XLA gathers are the SpyNet hot spot — docs/PERF.md); fp32/CPU
        # keeps the exact XLA path; row-sharded SPMD stage traces keep
        # the Pallas tier via the shard_map'd wrapper
        # (ops/warp.backWarpBoundedSpmd)
        from moephoto_tpu.parallel.temporal import pallasSpmdMode, spmdTracing

        if spmdTracing():
            pm = pallasSpmdMode()
            if pm and (pair.dtype == jnp.bfloat16 or pm == "interpret"):
                from moephoto_tpu.ops.warp import backWarpBoundedSpmd

                warped = backWarpBoundedSpmd(
                    supp[level], up, padding_mode="border",
                    interpret=pm == "interpret",
                )
            else:
                warped = backWarp(supp[level], up, padding_mode="border")
        elif (
            pair.dtype == jnp.bfloat16
            and jax.default_backend() != "cpu"
        ):
            from moephoto_tpu.ops.warp import backWarpBounded

            warped = backWarpBounded(supp[level], up, padding_mode="border")
        else:
            warped = backWarp(supp[level], up, padding_mode="border")
        inp = jnp.concatenate([ref[level], warped, up], axis=-1)
        if pair.dtype == jnp.bfloat16 and jax.default_backend() != "cpu":
            # chip tier: 2x2-packed 5x5 convs fill the MXU lanes the
            # fine C=32/64 7x7 stacks leave half-empty (exact packing;
            # tests/test_models_parity.py pins it against the fine path)
            y = _spyModulePacked(params, level, inp)
        else:
            y = inp
            p = f"spynet.basic_module.{level}"
            for j in range(0, 9, 2):
                y = conv2d(params, f"{p}.{j}", y, padding=3)
                if j < 8:
                    y = jax.nn.relu(y)
        flow = y + up
    return flow


# --- EDVR ------------------------------------------------------------------


def _pcdAlign(params: Params, p: str, nbr: List[jnp.ndarray], ref: List[jnp.ndarray]):
    """PCD alignment (videoSR.py:139-220): 3-level pyramid cascade of
    deformable convs."""
    upOffset = upFeat = None
    feat = None
    for i in range(3, 0, -1):
        lv = f"l{i}"
        offset = jnp.concatenate([nbr[i - 1], ref[i - 1]], axis=-1)
        offset = leakyRelu(conv2d(params, f"{p}.offset_conv1.{lv}", offset, padding=1), 0.1)
        if i == 3:
            offset = leakyRelu(conv2d(params, f"{p}.offset_conv2.{lv}", offset, padding=1), 0.1)
        else:
            offset = leakyRelu(
                conv2d(
                    params,
                    f"{p}.offset_conv2.{lv}",
                    jnp.concatenate([offset, upOffset], axis=-1),
                    padding=1,
                ),
                0.1,
            )
            offset = leakyRelu(conv2d(params, f"{p}.offset_conv3.{lv}", offset, padding=1), 0.1)
        feat = modulatedDeformConvPack(params, f"{p}.dcn_pack.{lv}", nbr[i - 1], offset)
        if i < 3:
            feat = conv2d(
                params, f"{p}.feat_conv.{lv}",
                jnp.concatenate([feat, upFeat], axis=-1), padding=1,
            )
        if i > 1:
            feat = leakyRelu(feat, 0.1)
            # phase-add 2x (exact): jax.image.resize's dense-matrix dots
            # poison fusion inside this program — 183 ms/slab of in-situ
            # cost, 120 of it recovered by this form (round 5, PERF.md)
            upOffset = resizeBilinear2x(offset) * 2.0
            upFeat = resizeBilinear2x(feat)
    offset = jnp.concatenate([feat, ref[0]], axis=-1)
    offset = leakyRelu(conv2d(params, f"{p}.cas_offset_conv1", offset, padding=1), 0.1)
    offset = leakyRelu(conv2d(params, f"{p}.cas_offset_conv2", offset, padding=1), 0.1)
    feat = leakyRelu(modulatedDeformConvPack(params, f"{p}.cas_dcnpack", feat, offset), 0.1)
    return feat


def _tsaFusion(params: Params, p: str, aligned: jnp.ndarray, center: int):
    """TSA fusion (videoSR.py:222-307): aligned (B, N, H, W, C)."""
    B, N, H, W, C = aligned.shape
    embRef = conv2d(params, p + ".temporal_attn1", aligned[:, center], padding=1)
    emb = conv2d(
        params, p + ".temporal_attn2", aligned.reshape(B * N, H, W, C), padding=1
    ).reshape(B, N, H, W, -1)
    corr = jnp.sum(emb * embRef[:, None].astype(emb.dtype), axis=-1)  # (B, N, H, W)
    corrProb = sigmoid(corr)[..., None]  # (B, N, H, W, 1)
    alignedW = aligned * corrProb.astype(aligned.dtype)
    # (B, H, W, N*C) with torch channel order [frame0 C, frame1 C, ...]
    flat = alignedW.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * C)
    feat = leakyRelu(conv2d(params, p + ".feat_fusion", flat), 0.1)

    attn = leakyRelu(conv2d(params, p + ".spatial_attn1", flat), 0.1)
    attnMax = maxPool2d(attn, 3, 2, 1)
    attnAvg = avgPool2d(attn, 3, 2, 1)
    attn = leakyRelu(
        conv2d(params, p + ".spatial_attn2", jnp.concatenate([attnMax, attnAvg], -1)),
        0.1,
    )
    attnLevel = leakyRelu(conv2d(params, p + ".spatial_attn_l1", attn), 0.1)
    attnMax = maxPool2d(attnLevel, 3, 2, 1)
    attnAvg = avgPool2d(attnLevel, 3, 2, 1)
    attnLevel = leakyRelu(
        conv2d(
            params, p + ".spatial_attn_l2", jnp.concatenate([attnMax, attnAvg], -1),
            padding=1,
        ),
        0.1,
    )
    attnLevel = leakyRelu(conv2d(params, p + ".spatial_attn_l3", attnLevel, padding=1), 0.1)
    attnLevel = resizeBilinear2x(attnLevel)
    attn = leakyRelu(conv2d(params, p + ".spatial_attn3", attn, padding=1), 0.1) + attnLevel
    attn = leakyRelu(conv2d(params, p + ".spatial_attn4", attn), 0.1)
    attn = resizeBilinear2x(attn)
    attn = conv2d(params, p + ".spatial_attn5", attn, padding=1)
    attnAdd = conv2d(
        params, p + ".spatial_attn_add2",
        leakyRelu(conv2d(params, p + ".spatial_attn_add1", attn), 0.1),
    )
    attn = sigmoid(attn)
    return feat * attn.astype(feat.dtype) * 2 + attnAdd.astype(feat.dtype)


def edvrApply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """EDVR keyframe feature extractor (videoSR.py:324-379):
    x (B, N, H, W, 3) -> (B, H, W, 64)."""
    B, N, H, W, C = x.shape
    center = N // 2
    p = "edvr"
    l1 = leakyRelu(conv2d(params, p + ".conv_first", x.reshape(B * N, H, W, C), padding=1), 0.1)
    for i in range(5):
        l1 = residualBlockNoBN(params, f"{p}.feature_extraction.{i}", l1)
    l2 = leakyRelu(conv2d(params, p + ".conv_l2_1", l1, stride=2, padding=1), 0.1)
    l2 = leakyRelu(conv2d(params, p + ".conv_l2_2", l2, padding=1), 0.1)
    l3 = leakyRelu(conv2d(params, p + ".conv_l3_1", l2, stride=2, padding=1), 0.1)
    l3 = leakyRelu(conv2d(params, p + ".conv_l3_2", l3, padding=1), 0.1)
    l1 = l1.reshape(B, N, H, W, -1)
    l2 = l2.reshape(B, N, H >> 1, W >> 1, -1)
    l3 = l3.reshape(B, N, H >> 2, W >> 2, -1)
    # batch the N per-neighbor PCD cascades into ONE call: the reference
    # loops neighbors sequentially (videoSR.py:361-367) but every conv /
    # DCN is batch-parallel, and batching multiplies gather+MXU
    # efficiency by N on TPU
    nbrB = [
        lv.reshape((B * N,) + lv.shape[2:]) for lv in (l1, l2, l3)
    ]
    refB = [
        jnp.broadcast_to(lv[:, center : center + 1], lv.shape).reshape(
            (B * N,) + lv.shape[2:]
        )
        for lv in (l1, l2, l3)
    ]
    aligned = _pcdAlign(params, p + ".pcd_align", nbrB, refB)
    aligned = aligned.reshape(B, N, H, W, -1)
    return _tsaFusion(params, p + ".fusion", aligned, center)


def trunkApply(params: Params, prefix: str, x: jnp.ndarray, numBlocks: int = 30):
    """ConvResidualBlocks (videoSR.py:309-311)."""
    y = leakyRelu(conv2d(params, prefix + ".0", x, padding=1), 0.1)
    for i in range(numBlocks):
        y = residualBlockNoBN(params, f"{prefix}.2.{i}", y)
    return y


def upsampleApply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Upsample head (videoSR.py:313-322): two pixel-shuffle x2 stages.

    TPU layout (round 5): the second shuffle and both fine-grid convs
    (conv_hr 64->64, conv_last 64->3) run in the DEFERRED sub-pixel
    layout at (2H, 2W).  On the materialized 4x grid those convs
    measured 5.5 TF/s — conv_last's cout=3 fills 3 of 128 MXU lanes
    and conv_last cost as much as the 64->64 (docs/PERF.md round-5
    upsample decomposition).  Deferred, they become dense 256-channel
    coarse contractions (4x the MACs at ~20x the utilization), the
    4x-resolution shuffle transpose disappears, and the final
    interleave runs on the 12-channel output — the round-1 lite-family
    trick (api.py deferredSubpixelConv).  Bit-effect: identical
    products, reordered sums (fp32 accumulation either way).
    """
    from moephoto_tpu.models.sr import _permutePSBias, _permutePSWeight

    p = "upsample"
    y = pixelShuffle(conv2d(params, p + ".0", x, padding=1), 2)
    y = leakyRelu(y, 0.1)
    # upsample.3 with output channels permuted to deferred (a, b, c)
    # order: its pixel-shuffle becomes a free reshape
    p3 = {
        "w.weight": _permutePSWeight(params[p + ".3.weight"], 2),
        "w.bias": _permutePSBias(params[p + ".3.bias"], 2),
    }
    z = leakyRelu(conv2d(p3, "w", y, padding=1), 0.1)  # (B, 2H, 2W, 256)
    b, h2, w2 = z.shape[0], z.shape[1], z.shape[2]
    zd = z.reshape(b, h2, w2, 2, 2, NumFeat)
    hd = leakyRelu(
        deferredSubpixelConv(
            params[p + ".6.weight"], zd, params[p + ".6.bias"]
        ),
        0.1,
    )
    o = deferredSubpixelConv(params[p + ".8.weight"], hd, params[p + ".8.bias"])
    return interleaveDeferred(o)


# --- keyframe marker -------------------------------------------------------


class KeyFrameState(InfiniteSource):
    """Marks every ``window``-th frame (+ stream tail) as keyframe
    (videoSR.py:381-401)."""

    def __init__(self, window: int):
        self.window = window
        self.count = 0
        self.last = True

    def pop(self, size: int = 1):
        res = np.zeros((size,), bool)
        for i in range(-self.count % self.window, size, self.window):
            res[i] = True
        if self.last:
            res[-1] = True
        self.count += size
        return res


# --- option + graph --------------------------------------------------------


class VSROpt(StreamOpt):
    pass


def getOpt(*_) -> VSROpt:
    import torch

    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.pipeline.registry import modelPath

    opt = VSROpt()
    raw = torch.load(modelPath(modelPath_), map_location="cpu", weights_only=False)
    dtype = config.dtype()
    params = {}
    for mod, sd in raw.items():
        flat = {f"{mod}.{k}": v.numpy() for k, v in sd.items()}
        conv = convertStateDict(flat)
        params.update(
            {
                k: jnp.asarray(v, dtype=dtype if v.dtype.kind == "f" else None)
                for k, v in conv.items()
            }
        )
    opt.params = params
    opt.dtype = dtype
    return opt


def synthParams(seed: int = 0, numBlocks: int = 30, dtype=jnp.float32) -> Params:
    """Random-init parameters for the per-frame stages (SpyNet, both
    recurrence trunks, fusions, upsample) — shapes match the reference
    checkpoint layout (videoSR.py:309-322,473) so the stage jits run
    without a checkpoint or the torch reference.  Used by the multi-chip
    dryrun and the sharded-temporal exactness tests; EDVR keys are NOT
    generated (its PCD/TSA tree is checkpoint-driven — golden tests
    cover it via the reference)."""
    rng = np.random.RandomState(seed)
    p = {}

    def conv(name, cin, cout, k=3):
        p[name + ".weight"] = (
            rng.randn(k, k, cin, cout).astype(np.float32)
            / np.sqrt(k * k * cin)
            * 0.5
        )
        p[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.01

    for level in range(6):
        cs = (8, 32, 64, 32, 16, 2)
        for idx, j in enumerate(range(0, 9, 2)):
            conv(f"spynet.basic_module.{level}.{j}", cs[idx], cs[idx + 1], k=7)
    for trunk, cin in (("backward_trunk", 3 + NumFeat), ("forward_trunk", 3 + 2 * NumFeat)):
        conv(trunk + ".0", cin, NumFeat)
        for i in range(numBlocks):
            conv(f"{trunk}.2.{i}.conv1", NumFeat, NumFeat)
            conv(f"{trunk}.2.{i}.conv2", NumFeat, NumFeat)
    conv("backward_fusion", 2 * NumFeat, NumFeat)
    conv("forward_fusion", 2 * NumFeat, NumFeat)
    conv("upsample.0", NumFeat, NumFeat * 4)
    conv("upsample.3", NumFeat, 64 * 4)
    conv("upsample.6", 64, 64)
    conv("upsample.8", 64, 3)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in p.items()}


# --- scanned recurrences -----------------------------------------------------
# The reference dispatches one warp + one 30-block trunk PER FRAME
# (videoSR.py:415-441); through the axon tunnel each dispatch costs
# ~31 ms and XLA cannot overlap them.  Both recurrences run instead as
# lax.scan over a fixed-length chunk inside ONE jitted program: the
# trunk body compiles once, keyframe fusion is a lax.cond branch, and
# host-side Nones become index+mask arrays (padding keeps one compiled
# variant per chunk length).


def _backwardScan(params, inp, flow, kfStack, kfIdx, kfMask, warpMask, validMask):
    """Backward recurrence over one chunk (videoSR.py:415-431).

    inp (T,H,W,3) model dtype · flow (T,H,W,2) fp32 · kfStack (K,H,W,C)
    keyframe EDVR features · kfIdx (T,) int32 into kfStack ·
    kfMask/warpMask/validMask (T,) bool.  Runs reversed; pad steps keep
    the carry at zero so the first real frame sees a fresh state,
    exactly like the reference's per-chunk ``new_zeros``.
    """
    dtype = inp.dtype

    def step(featProp, x):
        fr, fl, ki, kfM, wM, vM = x
        warped = backWarp(featProp.astype(jnp.float32), fl[None]).astype(dtype)
        fp = jnp.where(wM, warped, featProp)

        def fuse(f):
            kf = jax.lax.dynamic_index_in_dim(kfStack, ki, 0, keepdims=False)
            cat = jnp.concatenate([f, kf[None]], axis=-1)
            return conv2d(params, "backward_fusion", cat, padding=1)

        fp = jax.lax.cond(kfM, fuse, lambda f: f, fp)
        fp = trunkApply(
            params, "backward_trunk", jnp.concatenate([fr[None], fp], axis=-1)
        )
        fp = jnp.where(vM, fp, jnp.zeros_like(fp))
        return fp, fp[0]

    T, H, W, _ = inp.shape
    init = jnp.zeros((1, H, W, NumFeat), dtype)
    xs = (inp, flow, kfIdx, kfMask, warpMask, validMask)
    _, outs = jax.lax.scan(step, init, xs, reverse=True)
    return outs  # (T, H, W, NumFeat)


def _forwardScan(
    params, featProp, inp, bwd, flow, kfStack, kfIdx, flowMask, kfMask, validMask
):
    """Forward recurrence (videoSR.py:446-460); carry crosses calls."""
    dtype = inp.dtype

    def step(featProp, x):
        fr, bw, fl, ki, flM, kfM, vM = x
        warped = backWarp(featProp.astype(jnp.float32), fl[None]).astype(dtype)
        fp = jnp.where(flM, warped, featProp)

        def fuse(f):
            kf = jax.lax.dynamic_index_in_dim(kfStack, ki, 0, keepdims=False)
            cat = jnp.concatenate([f, kf[None]], axis=-1)
            return conv2d(params, "forward_fusion", cat, padding=1)

        fp = jax.lax.cond(kfM, fuse, lambda f: f, fp)
        fp = trunkApply(
            params,
            "forward_trunk",
            jnp.concatenate([fr[None], bw[None], fp], axis=-1),
        )
        fpNext = jnp.where(vM, fp, featProp)
        return fpNext, fp[0]

    xs = (inp, bwd, flow, kfIdx, flowMask, kfMask, validMask)
    fpOut, outs = jax.lax.scan(step, featProp, xs)
    return outs, fpOut


# --- fused chunk programs ---------------------------------------------------
# SpyNet runs INSIDE the scan programs (batched over the chunk's pairs,
# not per scan step) and upsample inside the forward program: one
# param-marshal dispatch per chunk per direction instead of separate
# flow/scan/upsample stages (each dispatch costs ~26-31 ms through the
# tunnel, docs/PERF.md round 3).  Masked positions carry zero pairs;
# their junk flows are discarded by the scan's warp/flow masks exactly
# like the zero flows they replace (SpyNet is per-sample independent,
# so real pairs' flows are bit-identical to the separate-stage path).


def _backwardScanPairs(
    params, inp, pairs, kfStack, kfIdx, kfMask, warpMask, validMask
):
    """pairs (T, 2, H, W, 3) model dtype -> flows in-program."""
    flows = spynetApply(params, pairs).astype(jnp.float32)
    return _backwardScan(
        params, inp, flows, kfStack, kfIdx, kfMask, warpMask, validMask
    )


def _forwardScanPairsUp(
    params, featProp, inp, bwd, pairs, kfStack, kfIdx, flowMask, kfMask,
    validMask,
):
    """Forward flows (reversed pairs) + recurrence + upsample head in ONE
    program; returns (upsampled (T, 4H, 4W, 3) f32, featProp carry)."""
    flows = spynetApply(params, pairs[:, ::-1]).astype(jnp.float32)
    outs, fpOut = _forwardScan(
        params, featProp, inp, bwd, flows, kfStack, kfIdx, flowMask,
        kfMask, validMask,
    )
    return _upsampleChunk(params, inp, outs), fpOut


def _backwardScanPairsEdvr(
    params, inp, pairs, clipsFlat, kfIdx, kfMask, warpMask, validMask
):
    """EDVR keyframe features + SpyNet flows + backward recurrence in
    ONE program (2 dispatches/clip with the forward program — VERDICT
    round-3 task 4; EDVR math is `_edvrChunk` unchanged, so outputs are
    identical to the separate-dispatch path).

    clipsFlat (Bk*RefTime, H, W, 3): the chunk's keyframe clips stacked
    flat on the host (ONE device stack instead of Bk+1 nested ones);
    kfIdx maps each frame to 1 + its keyframe rank (0 = no keyframe).
    Returns (scan outs (T, H, W, C), kfFeats (Bk, H, W, C)) — the feats
    feed the forward program's fusion without re-running EDVR.
    """
    clips = clipsFlat.reshape((-1, RefTime) + clipsFlat.shape[1:])
    kfFeats = _edvrChunk(params, clips)  # (Bk, H, W, NumFeat)
    kfStack = jnp.concatenate([jnp.zeros_like(kfFeats[:1]), kfFeats])
    flows = spynetApply(params, pairs).astype(jnp.float32)
    outs = _backwardScan(
        params, inp, flows, kfStack, kfIdx, kfMask, warpMask, validMask
    )
    return outs, kfFeats


# stage jits at module level: compiled executables are shared across
# graph instances, so rebuilding the pipeline per video task (worker
# behavior) costs no re-trace/re-compile for repeated shapes.
# stageJit == plain jax.jit single-device; with config.meshShape set the
# stages run row-sharded over the mesh (parallel/temporal.py) — GSPMD
# inserts the conv halos, so the math (and output) is unchanged.
# EDVR chunk: ONE dispatch for all of a span's keyframes, lax.map over
# B=2 slabs (PCD holds ~2.2 GB/clip of L1 activations — a flat batch
# would blow HBM; map keeps one slab live) + an exact remainder slab.
# lax.map is a scan, so the DCN bound-tier lax.cond stays a real branch
# per slab (vmap would flatten it to execute-all-tiers, PERF.md round 3)
EdvrSubBatch = 2


def _edvrChunk(p, x):
    B = x.shape[0]
    n2 = (B // EdvrSubBatch) * EdvrSubBatch
    outs = []
    if n2:
        sub = x[:n2].reshape((-1, EdvrSubBatch) + x.shape[1:])
        o = jax.lax.map(lambda t: edvrApply(p, t), sub)
        outs.append(o.reshape((-1,) + o.shape[2:]))
    if B > n2:
        outs.append(edvrApply(p, x[n2:]))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


edvrJit = stageJit(_edvrChunk, (None, 2), outHAxes=(1,))  # x (B, N, H, W, 3)
spyJit = stageJit(spynetApply, (None, 2), outHAxes=(1,))  # pair (B, 2, H, W, 3)
bScanJit = stageJit(
    _backwardScan,  # (params, inp(T,H..), flow(T,H..), kfStack(K,H..), idx/masks)
    (None, 1, 1, 1, None, None, None, None),
    outHAxes=(1,),
)
fScanJit = stageJit(
    _forwardScan,  # (params, featProp(1,H..), inp, bwd, flow, kfStack, idx/masks)
    (None, 1, 1, 1, 1, 1, None, None, None, None),
    outHAxes=(1, 1),
)
# fused chunk programs (the production pipeline path; the split jits
# above remain the unit-tested building blocks)
bScanPairsJit = stageJit(
    _backwardScanPairs,  # (params, inp(T,H..), pairs(T,2,H..), kfStack, idx/masks)
    (None, 1, 2, 1, None, None, None, None),
    outHAxes=(1,),
)
fScanPairsUpJit = stageJit(
    _forwardScanPairsUp,  # (params, featProp, inp, bwd, pairs, kfStack, idx/masks)
    (None, 1, 1, 1, 2, 1, None, None, None, None),
    outHAxes=(1, 1),
)
bScanPairsEdvrJit = stageJit(
    _backwardScanPairsEdvr,  # (params, inp, pairs, clipsFlat(Bk*7,H..), idx/masks)
    (None, 1, 2, 1, None, None, None, None),
    outHAxes=(1, 1),
)
# upsample sub-batch: lax.map over B=4 slabs keeps only ~4.8 GB of
# 4x-res intermediates live at a time (a flat (20, ...) batched body
# tried to allocate 24 GB of HBM; a B=1 map body lost the conv batch
# efficiency and measured 3.5% slower end-to-end) while the whole
# 20-frame chunk still rides a single dispatch.
UpSubBatch = 4


def _upsampleSlab(p, inpFeat):
    inp, feat = inpFeat  # (UpSubBatch, H, W, C)
    return upsampleApply(p, feat) + resizeBilinear(
        inp, inp.shape[1] * 4, inp.shape[2] * 4
    ).astype(jnp.float32)


def _upsampleChunk(p, inp, feat):
    T = inp.shape[0]
    n4 = (T // UpSubBatch) * UpSubBatch
    outs = []
    if n4:
        sub = lambda a: a[:n4].reshape((-1, UpSubBatch) + a.shape[1:])
        out = jax.lax.map(lambda t: _upsampleSlab(p, t), (sub(inp), sub(feat)))
        outs.append(out.reshape((-1,) + out.shape[2:]))
    if T > n4:  # tail-exact remainder slab (one cached compile per size)
        outs.append(_upsampleSlab(p, (inp[n4:], feat[n4:])))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


upJit = stageJit(_upsampleChunk, (None, 1, 1), outHAxes=(1,))  # (B, H, W, C)

# dispatch granularity only — the forward scan THREADS its carry across
# chunks (and upsamples in the same program), so outputs are bit-equal
# for any size (unlike BackwardChunk, which is semantic: fresh state per
# chunk, parity-pinned to the reference's [20, 20, tail] schedule).
# Each dispatch costs ~31 ms through the tunnel; 20-frame chunks cut the
# per-clip dispatch count (docs/PERF.md rounds 2-3).
ForwardChunk = 20


def _packOptional(items, n, T, shape, dtype):
    """Host list with Nones -> (stack (K,*shape), idx (T,), mask (T,));
    index 0 of the stack is a zero filler so it is never empty."""
    stack = [jnp.zeros(shape, dtype)]
    idx = np.zeros(T, np.int32)
    mask = np.zeros(T, bool)
    for i, it in enumerate(items[:n]):
        if it is not None:
            idx[i] = len(stack)
            mask[i] = True
            stack.append(it.astype(dtype))
    return jnp.stack(stack), jnp.asarray(idx), jnp.asarray(mask)


def _packOptionalRuns(items, n, T, shape, dtype):
    """``_packOptional`` for lazy (ref, row)-tuple items: same
    (stack (K+1, *shape), idx (T,), mask (T,)) contract (row 0 a zero
    filler), but contiguous rows of the same source array merge into
    single slices — a chunk's keyframe features all come from ONE
    backward-program output, so this is ~2 device ops instead of K
    slice + stack eager RPCs (the stackRuns rule, engine/stream.py)."""
    idx = np.zeros(T, np.int32)
    mask = np.zeros(T, bool)
    parts = [jnp.zeros((1,) + tuple(shape), dtype)]
    run = None  # (ref, start, stop)
    count = 1

    def flushRun():
        nonlocal run
        if run is not None:
            ref, a, b = run
            seg = ref if (a, b) == (0, ref.shape[0]) else ref[a:b]
            parts.append(seg if seg.dtype == dtype else seg.astype(dtype))
            run = None

    for i, it in enumerate(items[:n]):
        if it is None:
            continue
        ref, r = it
        idx[i] = count
        mask[i] = True
        count += 1
        if run is not None and run[0] is ref and run[2] == r:
            run = (ref, run[1], r + 1)
        else:
            flushRun()
            run = (ref, r, r + 1)
    flushRun()
    stack = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return stack, jnp.asarray(idx), jnp.asarray(mask)


def _padBatch(arr, T, dtype):
    n = arr.shape[0]
    arr = arr.astype(dtype)
    if n == T:
        return arr
    pad = jnp.zeros((T - n,) + arr.shape[1:], dtype)
    return jnp.concatenate([arr, pad])


def _stackPairs(items, n, T, shape, dtype):
    """(T, 2, *shape) pair batch from window-list items [fA, fB]
    (None -> zero pair), built column-wise: one stack per side + one
    dtype cast + one axis-1 stack — per-item slicing/casting would cost
    an eager tunnel RPC per frame (docs/PERF.md round 3)."""
    zero = [None]
    cols = []
    for s in (0, 1):
        rows = []
        for it in items[:n]:
            if it is None:
                if zero[0] is None:
                    zero[0] = jnp.zeros(shape, jnp.float32)
                rows.append(zero[0])
            else:
                rows.append(it[s])
        if T > n:
            if zero[0] is None:
                zero[0] = jnp.zeros(shape, jnp.float32)
            rows.extend([zero[0]] * (T - n))
        cols.append(jnp.stack(rows).astype(dtype))
    return jnp.stack(cols, axis=1)


def doVSR(func, node, opt: VSROpt):
    """Assemble the VSR stream graph (reference ``doVSR`` :502-541)."""
    nodes = [
        Node({"IconVSR": key})
        for key in ("KeyframeFeature", "Flow", "Backward", "FlowF", "Forward")
    ]
    graph = StreamGraph()
    sinkList: List = []

    def kfStage(windows, isKey, last=None):
        # pure item bookkeeping: emit each keyframe's RefTime-frame clip
        # window (a host list) or None.  EDVR itself runs INSIDE the
        # backward program (bScanPairsEdvrJit) — the reference runs it
        # per keyframe as its own dispatch (videoSR.py:381-401); folding
        # it keeps the math identical (same _edvrChunk on the same
        # clips) at 2 dispatches/clip total (VERDICT round-3 task 4)
        return [
            list(wFrames) if (b and len(wFrames) == RefTime) else None
            for wFrames, b in zip(windows, isKey)
        ]

    tailState = {"flowNone": False, "backPad": False}

    def calcFlowBackward(pairs, last=None):
        # pure item bookkeeping — SpyNet runs inside the backward scan
        # program (bScanPairsJit); items are [frameA, frameB] window
        # lists (zero device ops end to end)
        out: List = list(pairs) if pairs is not None else []
        if last and not tailState["flowNone"]:
            # no flow exists past the final frame (videoSR.py:411-414)
            out.append(None)
            tailState["flowNone"] = True
        return out

    fwdState = {"first": True}

    def calcFlowForward(pairs, last=None):
        # pure item bookkeeping — SpyNet runs (on reversed pairs) inside
        # the forward scan program (fScanPairsUpJit)
        out: List = []
        if fwdState["first"]:
            out.append(None)
            pairs = pairs[1:]
            fwdState["first"] = False
        out.extend(pairs)
        return out

    def calcBackward(inp, flowInp, keyframeClips, last=None):
        if inp is None:  # flush call: emit only the tail pads
            if tailState["backPad"]:
                return None
            tailState["backPad"] = True
            return [None, None]
        n = inp.shape[0]
        h, w = inp.shape[1], inp.shape[2]
        # tail-exact scan length: the valid/warp masks already make the
        # pad frames semantic no-ops, so compiling the tail size instead
        # of padding to the full chunk is bit-equal and skips up to
        # 6x36 ms of padded compute per clip (one extra cached compile
        # per distinct tail length)
        T = min(n, BackwardChunk)
        pairStack = _stackPairs(flowInp, n, T, (h, w, 3), opt.dtype)
        kfIdx = np.zeros(T, np.int32)
        kfMask = np.zeros(T, bool)
        kfPos: List[int] = []
        for i, c in enumerate(keyframeClips[:n]):
            if c is not None:
                kfIdx[i] = len(kfPos) + 1
                kfMask[i] = True
                kfPos.append(i)
        warpM = np.zeros(T, bool)
        warpM[:n] = True
        if last:
            warpM[n - 1] = False  # no flow past the final frame
        validM = np.zeros(T, bool)
        validM[:n] = True
        if kfPos:
            # ONE flat host stack of the span's keyframe clips; EDVR +
            # SpyNet + the reverse scan run as a single program, which
            # also returns the keyframe feats for the forward fusion
            flat = jnp.stack(
                [f for i in kfPos for f in keyframeClips[i]]
            ).astype(opt.dtype)  # (Bk*RefTime, H, W, 3)
            outs, kfFeats = bScanPairsEdvrJit(
                opt.params,
                _padBatch(inp, T, opt.dtype),
                pairStack,
                flat,
                jnp.asarray(kfIdx),
                jnp.asarray(kfMask),
                jnp.asarray(warpM),
                jnp.asarray(validM),
            )
        else:  # keyframe-less span (short tails): plain scan program
            outs = bScanPairsJit(
                opt.params,
                _padBatch(inp, T, opt.dtype),
                pairStack,
                jnp.zeros((1, h, w, NumFeat), opt.dtype),
                jnp.asarray(kfIdx),
                jnp.asarray(kfMask),
                jnp.asarray(warpM),
                jnp.asarray(validM),
            )
            kfFeats = None
        featItems: List = [None] * n
        for rank, i in enumerate(kfPos):
            featItems[i] = (kfFeats, rank)
        keyframeFeatFwd.put(featItems)
        out = [(outs, i) for i in range(n)]
        if last and not tailState["backPad"]:
            # 2 empties so the tail windows fill (videoSR.py:420-421)
            out.extend([None, None])
            tailState["backPad"] = True
        return out

    forwardState = {"featProp": None}

    def calcForward(inp, flowInp, keyframeFeat, backward, last=None):
        # forward recurrence + upsample head in ONE dispatch; emits the
        # final full-res frames straight to the sink
        n = inp.shape[0]
        h, w = inp.shape[1], inp.shape[2]
        T = n  # tail-exact (see calcBackward)
        featProp = forwardState["featProp"]
        if featProp is None:
            featProp = jnp.zeros((1, h, w, NumFeat), opt.dtype)
        pairStack = _stackPairs(flowInp, n, T, (h, w, 3), opt.dtype)
        flowM = np.zeros(T, bool)
        flowM[:n] = [f is not None for f in flowInp[:n]]
        kfStack, kfIdx, kfMask = _packOptionalRuns(
            keyframeFeat, n, T, (h, w, NumFeat), opt.dtype
        )
        validM = np.zeros(T, bool)
        validM[:n] = True
        bwd = stackRuns(
            [b[0] for b in backward[:n]], n, T, (h, w, NumFeat), opt.dtype
        )
        out, featProp = fScanPairsUpJit(
            opt.params,
            featProp,
            _padBatch(inp, T, opt.dtype),
            bwd,
            pairStack,
            kfStack,
            kfIdx,
            jnp.asarray(flowM),
            kfMask,
            jnp.asarray(validM),
        )
        forwardState["featProp"] = featProp
        oh, ow = getattr(opt, "outHW", (None, None))
        if oh:  # crop the 64-align pad ONCE for the whole chunk; the
            # per-frame opt.unpad then full-extent-slices (free alias)
            out = out[:, :oh, :ow]
        return [out[i].astype(jnp.float32) for i in range(n)]

    listB = lambda x: x
    inp = Stream(name="inp")
    inp1 = Stream(name="inp1")
    backwardInp = Stream(name="backwardInp")
    # window items are [frameA, frameB] LISTS (tensor=False): the tee
    # drains flowInp per frame, and a tensor window would build its
    # (1, 2, H, W, 3) array eagerly on every push (~3 device ops/frame);
    # the scan stages batch the lists once per chunk via _stackPairs
    flowInp = Stream(2, tensor=False, batchFunc=listB, name="flowInp")
    flowForwardInp = Stream(
        tensor=False, batchFunc=listB, name="flowForwardInp"
    ).setPadding(1)
    flowBackwardInp = Stream(tensor=False, batchFunc=listB, name="flowBackwardInp")
    isKeyFrame = KeyFrameState(RefTime)
    keyframeFeatureInp = Stream(
        RefTime, tensor=False, reserve=1, batchFunc=listB, name="kfInp"
    )
    keyframeClipsS = Stream(tensor=False, batchFunc=listB, name="kfClips")
    # keyframe EDVR feats, computed INSIDE the backward program and fed
    # forward as lazy (ref, row) items (calcBackward closure-puts them —
    # Stage outs broadcast one value, and this is a second output)
    keyframeFeatFwd = Stream(tensor=False, batchFunc=listB, name="kfFeatF")
    flowBackward = Stream(tensor=False, batchFunc=listB, name="flowB")
    backward = Stream(3, tensor=False, batchFunc=listB, name="backward")
    flowForward = Stream(tensor=False, batchFunc=listB, name="flowF")
    upsampleS = Stream(store=False, name="up")
    upsampleS.sink = sinkList

    graph.tee(inp, [inp1, flowInp, backwardInp])
    graph.tee(flowInp, [flowForwardInp, flowBackwardInp])
    graph.stage(
        nodes[0].bindFunc(kfStage),
        [keyframeFeatureInp, isKeyFrame],
        [keyframeClipsS],
        # pop whole spans so calcBackward sees every keyframe clip of
        # its chunk (at the reference's keyframe cadence of 5 that is 4
        # EDVR clips per span, lax.map'd over B=2 slabs in-program —
        # PCD's ~2.2 GB/clip of L1 activations caps the live batch)
        size=BackwardChunk,
    )
    graph.stage(
        nodes[1].bindFunc(calcFlowBackward), [flowBackwardInp], [flowBackward],
        # batch SpyNet pairs (ref schedules 1 at a time); 20 aligns the
        # flow chunk with BackwardChunk so stackRuns hits its 1-slice
        # fast path, and spy B=20 is sub-linear (12 ms/pair vs 17 at 10)
        size=BackwardChunk, flushOnce=True,
    )
    graph.stage(
        nodes[2].bindFunc(calcBackward),
        [backwardInp, flowBackward, keyframeClipsS],
        [backward],
        size=BackwardChunk,
        flushOnce=True,
    )
    graph.stage(
        nodes[3].bindFunc(calcFlowForward), [flowForwardInp], [flowForward],
        size=ForwardChunk,
    )
    graph.stage(
        nodes[4].bindFunc(calcForward),
        [inp1, flowForward, keyframeFeatFwd, backward],
        [upsampleS],
        size=ForwardChunk,
    )

    def initFunc(o, x):
        o.padF, o.unpadF, size = alignPad(x, 64)
        o.pad = lambda f: o.padF(f)
        h, w_ = x.shape[0], x.shape[1]
        o.outHW = (h * 4, w_ * 4)  # calcForward batch-crops to this
        o.unpad = lambda f: f[: h * 4, : w_ * 4]
        return size

    def pushFunc(x):
        if opt.i + opt.startPadding >= RefTime >> 1:
            inp.put([x])
        keyframeFeatureInp.put([x])

    return makeStreamFunc(
        func, node, opt, nodes, "VSR", [keyframeFeatureInp], initFunc,
        pushFunc, graph, sinkList,
    )
