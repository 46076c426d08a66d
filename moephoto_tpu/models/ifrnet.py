"""IFRNet flow-based frame interpolation at arbitrary real factor sf>=1
(reference ``python/IFRNet.py``; Kong et al.).

Pipeline per frame pair: 4-level pyramid encoder -> coarse-to-fine
decoder with bilinear warping -> post-merge (mask-blended warps + mean
restoration + residual).  The time-embedding source (``EmbtState``) and
the cosine-similarity frame deduper are host-side; all convs/warps are
jitted device programs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moephoto_tpu.config import config
from moephoto_tpu.engine.stream import (
    InfiniteSource, RowRef, Stream, StreamGraph, stackBatch,
)
from moephoto_tpu.models.api import (
    Params,
    conv2d,
    convTranspose2d,
    prelu,
    resizeBilinear,
    sigmoid,
)
from moephoto_tpu.models.streamcommon import StreamOpt, alignPad, makeStreamFunc
from moephoto_tpu.ops.warp import gridSample
from moephoto_tpu.parallel.temporal import stageJit
from moephoto_tpu.progress import Node

Channels = dict(
    S=[24, 36, 54, 72],
    M=[32, 48, 72, 96],
    L=[(64, 7), 96, 144, 192],
)
SideChannels = dict(S=24, M=32, L=64)
RefTime = 2

modelPaths = dict(
    S="model/IFRNet/IFRNet_S_GoPro.pth",
    M="model/IFRNet/IFRNet_GoPro.pth",
    L="model/IFRNet/IFRNet_L_GoPro.pth",
)


def warpExact(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """IFRNet Warp (IFRNet.py:19-35): exact pixel-offset bilinear warp
    with border padding (the kw/kh normalization + align_corners=True
    cancel to px = x + u).

    Full-res image warps (C <= 8, bf16, TPU) go through the Pallas
    bounded-flow kernel with an in-graph fallback for large flows —
    21 -> 2.3 ms per 720p warp; fp32/CPU and feature warps keep XLA.
    Row-sharded SPMD stage traces keep the Pallas tier via the
    shard_map'd wrapper (ops/warp.warpBoundedSpmd)."""
    from moephoto_tpu.ops.warp import (
        warpBounded,
        warpBoundedSpmd,
        warpXLAExact,
    )
    from moephoto_tpu.parallel.temporal import pallasSpmdMode, spmdTracing

    if img.shape[-1] <= 8:
        import jax as _jax

        if spmdTracing():
            pm = pallasSpmdMode()
            if pm and (img.dtype == jnp.bfloat16 or pm == "interpret"):
                return warpBoundedSpmd(
                    img, flow, "border", interpret=pm == "interpret"
                )
        elif img.dtype == jnp.bfloat16 and _jax.default_backend() != "cpu":
            return warpBounded(img, flow, "border")
    return warpXLAExact(img, flow, "border")


def _convrelu(params: Params, p: str, x, stride=1, k=3):
    y = conv2d(params, p + ".0", x, stride=stride, padding=k >> 1)
    return prelu(params, p + ".1", y)


def encoderApply(params: Params, chs, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Pyramid encoder (IFRNet.py:44-60): returns features small->large
    ([1/16, 1/8, 1/4, 1/2])."""
    feats = []
    cur = x
    for i, c in enumerate(chs):
        k = c[1] if isinstance(c, tuple) else 3
        p = f"encoder.pyramids.{i}"
        cur = _convrelu(params, p + ".0", cur, stride=2, k=k)
        cur = _convrelu(params, p + ".1", cur, stride=1, k=3)
        feats.append(cur)
    return feats[::-1]


def _resBlock(params: Params, p: str, x: jnp.ndarray, side: int) -> jnp.ndarray:
    """ResBlock with side-channel sub-path (IFRNet.py:62-79)."""
    out = _convrelu(params, p + ".conv1", x)
    main, sidePart = out[..., :-side], out[..., -side:]
    sidePart = _convrelu(params, p + ".conv2", sidePart)
    out = jnp.concatenate([main, sidePart], axis=-1)
    out = _convrelu(params, p + ".conv3", out)
    main, sidePart = out[..., :-side], out[..., -side:]
    sidePart = _convrelu(params, p + ".conv4", sidePart)
    out = jnp.concatenate([main, sidePart], axis=-1)
    out = conv2d(params, p + ".conv5", out, padding=1)
    return prelu(params, p + ".prelu", x + out)


def _decodeLevel(params: Params, i: int, x: jnp.ndarray, side: int) -> jnp.ndarray:
    p = f"decoder.decoders.{i}"
    y = _convrelu(params, p + ".0", x)
    y = _resBlock(params, p + ".1", y, side)
    return convTranspose2d(params, p + ".2", y, stride=2, padding=1)


# Spatial TTA transforms on (k, H, W, c), matching the reference's
# trans/transInv tables (imageProcess.py:564-570; NCHW flip(-1) == our
# axis-2 flip, transpose(-1,-2) == swap axes 1,2).  Inverse table maps
# 3<->4; the rest are self-inverse.
_T = lambda x: jnp.swapaxes(x, 1, 2)
_F = lambda x: x[:, :, ::-1]
_TRANS = [
    _T,
    _F,
    lambda x: x[:, ::-1, ::-1],
    lambda x: _T(_F(x)),
    lambda x: _F(_T(x)),
    lambda x: _T(_F(_T(x))),
    lambda x: _T(x[:, ::-1, ::-1]),
]
_TRANS_INV = [_TRANS[j] for j in (0, 1, 2, 4, 3, 5, 6)]


def _decodeFlowLevel(params: Params, i: int, x: jnp.ndarray, side: int) -> jnp.ndarray:
    """Level decode with the final ConvTranspose truncated to the 4 flow
    channels (reference FlowDecoder, IFRNet.py:87-92 + setSize :118-129:
    same weights, output rows :4)."""
    p = f"decoder.decoders.{i}"
    y = _convrelu(params, p + ".0", x)
    y = _resBlock(params, p + ".1", y, side)
    key = p + ".2"
    sub = {
        key + ".weight": params[key + ".weight"][..., :4],
        key + ".bias": params[key + ".bias"][:4],
    }
    return convTranspose2d(sub, key, y, stride=2, padding=1)


def _flowEnsemble(params: Params, i: int, xF: jnp.ndarray, side: int, n: int):
    """Sum of inverse-transformed flow-only decodes over the first ``n``
    TTA transforms (reference ensembling, IFRNet.py:93 + :146-149).
    Like the reference, flow CHANNELS are left untouched — only the
    spatial layout is untransformed."""

    def group(idxs):
        if not idxs:
            return 0
        xs = jnp.concatenate([_TRANS[j](xF) for j in idxs], axis=0)
        ys = _decodeFlowLevel(params, i, xs, side)
        parts = jnp.split(ys, len(idxs), axis=0)
        return sum(_TRANS_INV[j](y) for j, y in zip(idxs, parts))

    same = group([j for j in (1, 2, 5) if j < n])  # shape-preserving
    swapped = group([j for j in (0, 3, 4, 6) if j < n])  # transposed
    return same + swapped


def decoderApply(
    params: Params, chs, side: int, feats: List[jnp.ndarray], embt: jnp.ndarray,
    ensemble: int = 0,
) -> jnp.ndarray:
    """Coarse-to-fine decoder for ONE frame pair (IFRNet.py:94-159).

    feats: 4 levels small->large, each (2, h_l, w_l, c_l).
    embt: (k,) interpolation times -> returns (k, 4+extra, ...) final
    level output (flows 4ch, mask 1ch, residual 3ch at half res * 2).
    ensemble (0..7): per-level flow TTA, averaging the base flows with
    ``ensemble`` transformed flow-only decodes (IFRNet.py:146-149).
    """
    k = embt.shape[0]
    f0 = feats[0]
    h0, w0 = f0.shape[1], f0.shape[2]
    x0 = jnp.concatenate([f0[0], f0[1]], axis=-1)  # (h0, w0, 2c)
    x0 = jnp.broadcast_to(x0[None], (k,) + x0.shape)
    embtMap = jnp.broadcast_to(
        embt.reshape(k, 1, 1, 1).astype(x0.dtype), (k, h0, w0, 1)
    )
    args: Tuple = (x0, embtMap)
    out = None
    upFlow0 = upFlow1 = None
    for i in range(4):
        if i:
            ft = feats[i]  # (2, h, w, c)
            ft0 = jnp.broadcast_to(ft[0][None], (k,) + ft[0].shape)
            ft1 = jnp.broadcast_to(ft[1][None], (k,) + ft[1].shape)
            f0w = warpExact(ft0, upFlow0)
            f1w = warpExact(ft1, upFlow1)
            args = (ftRes, f0w, f1w, upFlow0, upFlow1)
        xF = jnp.concatenate(args, axis=-1)
        out = _decodeLevel(params, i, xF, side)
        if ensemble:
            flows = out[..., :4] + _flowEnsemble(params, i, xF, side, ensemble)
            out = jnp.concatenate(
                [flows / (ensemble + 1), out[..., 4:]], axis=-1
            )
        f0_ = out[..., :2]
        f1_ = out[..., 2:4]
        ftRes = out[..., 4:]
        if i:
            h, w = f0_.shape[1], f0_.shape[2]
            f0_ = f0_ + 2.0 * resizeBilinear(upFlow0, h, w)
            f1_ = f1_ + 2.0 * resizeBilinear(upFlow1, h, w)
        if i == 3:
            return jnp.concatenate([f0_, f1_, ftRes], axis=-1)
        upFlow0, upFlow1 = f0_, f1_


def decoderBatchApply(
    params: Params, chs, side: int, feats: List[jnp.ndarray], embt: jnp.ndarray,
    ensemble: int = 0,
) -> jnp.ndarray:
    """Decoder for a CHUNK of r frame pairs in ONE program: the
    per-pair bodies are Python-unrolled, NOT batched along a (r*k) conv
    batch axis.  Measured on chip @720p r=8 (docs/PERF.md round 3): the
    batched form hits super-linear XLA gather scaling in the largest
    feature warp ((8,368,640,32): 253 ms vs 94 unrolled) landing at
    736 ms/chunk; eight separate param-heavy dispatches cost 206
    (~26 ms RPC each); the unrolled single program is 186 ms and pays
    one dispatch.  Op-by-op identical to r per-pair calls, so outputs
    are bit-equal to the reference schedule.

    feats: 4 levels small->large, each (r, 2, h_l, w_l, c_l).
    embt: (r, k) -> (r, k, H, W, 4+extra).
    """
    r = embt.shape[0]
    outs = [
        decoderApply(
            params, chs, side, [lv[i] for lv in feats], embt[i],
            ensemble=ensemble,
        )
        for i in range(r)
    ]
    return jnp.stack(outs)


def postOutApply(
    params: Params,
    pair: jnp.ndarray,  # (2, H, W, 3) raw frames
    pairN: jnp.ndarray,  # (2, H, W, 3) mean-normalized
    means: jnp.ndarray,  # (2, 1, 1, 1)
    embt: jnp.ndarray,  # (k,)
    decoded: jnp.ndarray,  # (k, H, W, 8)
) -> jnp.ndarray:
    """Final merge (IFRNet ``postOut`` :164-187) for one pair: warped
    blend by sigmoid mask + time-interpolated mean + residual."""
    k = embt.shape[0]
    upFlow0 = decoded[..., :2]
    upFlow1 = decoded[..., 2:4]
    upMask = sigmoid(decoded[..., 4:5])
    upRes = decoded[..., 5:]
    img0 = jnp.broadcast_to(pairN[0][None], (k,) + pairN[0].shape)
    img1 = jnp.broadcast_to(pairN[1][None], (k,) + pairN[1].shape)
    e = embt.reshape(k, 1, 1, 1).astype(jnp.float32)
    meanP = (1 - e) * means[0] + e * means[1]
    img0w = warpExact(img0, upFlow0)
    img1w = warpExact(img1, upFlow1)
    merged = upMask * (img0w - img1w) + img1w + meanP.astype(decoded.dtype)
    pred = merged + upRes
    return jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)


def postOutBatchApply(
    params: Params,
    pair: jnp.ndarray,  # (r, 2, H, W, 3) raw frames
    pairN: jnp.ndarray,  # (r, 2, H, W, 3) mean-normalized
    means: jnp.ndarray,  # (r, 2, 1, 1, 1)
    embt: jnp.ndarray,  # (r, k)
    decoded: jnp.ndarray,  # (r, k, H, W, 8)
) -> jnp.ndarray:
    """Chunk-of-r-pairs merge in ONE program, per-pair bodies unrolled
    (NOT warp-batched): like ``decoderBatchApply``, a (r*k)-batched warp
    either blows up the XLA gather fallback super-linearly or forces one
    chunk-global Pallas tier choice; unrolling keeps per-pair tier
    dispatch and bit-equality with the reference schedule while paying a
    single ~26 ms param-marshal RPC for the whole chunk."""
    r = embt.shape[0]
    return jnp.stack([
        postOutApply(params, pair[i], pairN[i], means[i], embt[i], decoded[i])
        for i in range(r)
    ])


# --------------------------------------------------------------------------
# host-side time embedding + dedupe
# --------------------------------------------------------------------------

hardshrink = lambda k, c: 0 if abs(k - c) < 1e-6 else k


def getEmbWeight(i: int, c: float) -> np.ndarray:
    """Interpolation times for pair i at step c = 1/sf
    (IFRNet.py:191-192)."""
    return np.arange(-hardshrink(i % c, c), 1 + 1e-6, c, dtype=np.float32)[1:]


def getEmbStruct(t: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """(times, keepFirstCount, keepLastCount) (IFRNet.py:193)."""
    if float(t[-1]) + 1e-6 > 1:
        return (t[:-1], 0, 1)
    return (t, 0, 0)


class EmbtState(InfiniteSource):
    """Per-pair time-embedding source (IFRNet.py:194-225)."""

    def __init__(self, sf: float):
        assert sf >= 1
        self.c = 1.0 / sf
        self.count = 0

    def pop(self, size: int = 1):
        res = [getEmbStruct(getEmbWeight(i, self.c)) for i in range(self.count, self.count + size)]
        if not self.count:
            res[0] = (res[0][0], 1, res[0][2])
        self.count += size
        return res


def _pyrLvl0(item) -> jnp.ndarray:
    """Level-0 feature map of a (pyramid, i) reference item."""
    pyr, i = item
    return pyr[0][i]


class Deduper:
    """Cosine-similarity frame dedupe / scene-cut detection
    (IFRNet.py:227-266).  State items are 5-tuples
    (features, embt, frame, frameN, mean); features is a (pyramid, i)
    reference item (see ``encode``)."""

    NullOutput = None

    def __init__(self, low: float, high: float):
        self.state: Optional[list] = None
        self.low = low
        self.high = high
        self.skips = 0

    def _concat(self, embt):
        self.skips += 1
        s1 = self.state[1]
        newT = np.concatenate(
            [s1[0], np.ones((s1[2],), np.float32) * self.skips, embt[0] + self.skips]
        )
        self.state[1] = (newT, s1[1] + embt[1], embt[2])

    def __call__(self, *args, last=None):
        if args[0] is None:  # flush call: emit the residual final state
            if self.state is None:
                return None
            s, self.state = self.state, None
            if self.skips:
                s[1] = (s[1][0] / (self.skips + 1), s[1][1], s[1][2])
                self.skips = 0
            return [s]
        newState = [a[0] for a in args]  # batch-of-1 from every input
        feats = newState[0]
        embt = newState[1]
        if self.state is None:
            self.state = newState
            return None
        lv0Prev = _pyrLvl0(self.state[0])
        lv0New = _pyrLvl0(feats)
        simNum = float(
            jnp.vdot(
                lv0Prev.astype(jnp.float32).ravel(),
                lv0New.astype(jnp.float32).ravel(),
            )
        )
        n1 = float(jnp.linalg.norm(lv0Prev.astype(jnp.float32).ravel()))
        n2 = float(jnp.linalg.norm(lv0New.astype(jnp.float32).ravel()))
        sim = simNum / max(n1 * n2, 1e-12)
        if sim > self.high:  # duplicate: fold this frame into the gap
            self._concat(embt)
            if not last:
                return None
        s = self.state
        if sim < self.low:  # scene cut: repeat the first frame instead
            e0 = s[1]
            s[1] = (np.empty((0,), np.float32), e0[1] + len(e0[0]), e0[2])
        if self.skips:
            s[1] = (s[1][0] / (self.skips + 1), s[1][1], s[1][2])
        self.state = newState
        self.skips = 0
        return [s, newState] if last else [s]


# --------------------------------------------------------------------------
# option + graph assembly
# --------------------------------------------------------------------------


class IFRNetOpt(StreamOpt):
    pass


def synthParams(seed: int = 0, dtype=jnp.float32) -> Params:
    """Random-init IFRNet-S parameters in the checkpoint layout
    (reference IFRNet.py:49-159 encoder/decoder), run through the same
    ``convertStateDict`` path as :func:`getOpt` — so the stage jits run
    without a checkpoint or the torch reference.  Used by the multi-chip
    dryrun and the sharded-temporal exactness tests."""
    from moephoto_tpu.models.api import convertStateDict

    rng = np.random.RandomState(seed)
    sd = {}

    def t(name, *shape):
        fan = float(np.prod(shape[1:])) if len(shape) > 1 else 1.0
        sd[name + ".weight"] = (
            rng.randn(*shape) / np.sqrt(fan) * 0.5
        ).astype(np.float32)
        if len(shape) > 1:
            sd[name + ".bias"] = rng.randn(shape[0]).astype(np.float32) * 0.01

    chs = Channels["S"]  # [24, 36, 54, 72]
    side = SideChannels["S"]  # 24
    for l, c in enumerate(chs):
        cin = 3 if l == 0 else chs[l - 1]
        for j, ci in ((0, cin), (1, c)):
            t(f"encoder.pyramids.{l}.{j}.0", c, ci, 3, 3)
            sd[f"encoder.pyramids.{l}.{j}.1.weight"] = np.full(
                (c,), 0.25, np.float32
            )
    # per-decoder (in0, mid, convT-out) channel tuples — IFRNet.py:94-159
    # (in0 = concatenated features (+ flows/side below the top level),
    # convT-out = 4 flow ch + side (+ 2x upsampled side mid-levels))
    decs = ((145, 144, 2 * side + 10), (166, 162, 40), (112, 108, 28),
            (76, 72, 8))
    for d, (in0, mid, outc) in enumerate(decs):
        t(f"decoder.decoders.{d}.0.0", mid, in0, 3, 3)
        sd[f"decoder.decoders.{d}.0.1.weight"] = np.full((mid,), 0.25, np.float32)
        for cv, cc in (("conv1", mid), ("conv2", side), ("conv3", mid),
                       ("conv4", side)):
            t(f"decoder.decoders.{d}.1.{cv}.0", cc, cc, 3, 3)
            sd[f"decoder.decoders.{d}.1.{cv}.1.weight"] = np.full(
                (cc,), 0.25, np.float32
            )
        t(f"decoder.decoders.{d}.1.conv5", mid, mid, 3, 3)
        sd[f"decoder.decoders.{d}.1.prelu.weight"] = np.full(
            (mid,), 0.25, np.float32
        )
        # ConvTranspose2d: weight (in, out, kh, kw), bias (out,)
        sd[f"decoder.decoders.{d}.2.weight"] = (
            rng.randn(mid, outc, 4, 4) / np.sqrt(16 * mid) * 0.5
        ).astype(np.float32)
        sd[f"decoder.decoders.{d}.2.bias"] = (
            rng.randn(outc).astype(np.float32) * 0.01
        )
    isConvT = lambda k, s: k.startswith("decoder.decoders.") and k.endswith(
        ".2.weight"
    )
    conv = convertStateDict(sd, isConvT)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in conv.items()}


def getOpt(option: dict) -> IFRNetOpt:
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.pipeline.registry import modelPath

    model = option["model"][-1]
    opt = IFRNetOpt()
    opt.chs = Channels[model]
    opt.side = SideChannels[model]
    opt.sf = float(option["sf"])
    opt.dedupe = bool(option.get("dedupe", False))
    opt.dedupeLow = float(option.get("low", 0.5))
    opt.dedupeHigh = float(option.get("high", 0.993))
    opt.ensemble = min(int(option.get("ensemble", 0)), 7)
    import torch

    raw = torch.load(
        modelPath(modelPaths[model]), map_location="cpu", weights_only=False
    )
    dtype = config.dtype()
    params = {}
    for mod in ("encoder", "decoder"):
        sd = {f"{mod}.{k}": v.numpy() for k, v in raw[mod].items()}
        # each Decoder's ConvTranspose is child index 2
        isConvT = lambda k, s: k.startswith("decoder.decoders.") and k.endswith(".2.weight")
        conv = convertStateDict(sd, isConvT)
        params.update(
            {
                k: jnp.asarray(v, dtype=dtype if v.dtype.kind == "f" else None)
                for k, v in conv.items()
            }
        )
    opt.params = params
    opt.dtype = dtype
    return opt


# module-level stage jits keyed by static model config: executables are
# shared across graph instances, so per-task pipeline rebuilds don't
# re-trace/re-compile known shapes (jax's own cache handles shape/k)
_stageJits: dict = {}
# stageJit == plain jax.jit single-device; with config.meshShape set the
# stages run row-sharded over the mesh (parallel/temporal.py)
postJit = stageJit(
    postOutApply, (None, 1, 1, None, None, 1), outHAxes=(1,)
)  # pair/pairN (2,H,W,3), decoded (k,H,W,8) — mixed-k fallback


def _encoderJit(chs):
    key = ("enc", chs)
    if key not in _stageJits:
        _stageJits[key] = stageJit(
            lambda p, x: encoderApply(p, list(chs), x), (None, 1), outHAxes=(1,)
        )
    return _stageJits[key]


def _decoderJit(chs, side, ensemble):
    key = ("dec", chs, side, ensemble)
    if key not in _stageJits:
        _stageJits[key] = stageJit(
            lambda p, f, t: decoderApply(
                p, list(chs), side, f, t, ensemble=ensemble
            ),
            (None, 1, None),  # f: pyramid list, every level (2, h_l, w_l, c)
            outHAxes=(1,),
        )
    return _stageJits[key]


def _decodePostJit(chs, side, ensemble, dtype):
    """Decoder + postOut for a uniform-k chunk in ONE program (the
    separate stages each paid a ~26-31 ms param-marshal dispatch):
    f levels (r, 2, h, w, c), t (r, k) f32, pair/pairN (r, 2, H, W, 3),
    means (r, 2, 1, 1, 1) -> (r, k, H, W, 3) predictions."""
    key = ("decPost", chs, side, ensemble, str(dtype))
    if key not in _stageJits:

        def run(p, f, t, pair, pairN, means):
            dec = decoderBatchApply(
                p, list(chs), side, f, t.astype(dtype), ensemble=ensemble
            )
            return postOutBatchApply(p, pair, pairN, means, t, dec)

        _stageJits[key] = stageJit(run, (None, 2, None, 2, 2, None), outHAxes=(2,))
    return _stageJits[key]


def _encodeFullJit(chs, dtype):
    """mean + normalize + encoder pyramid in ONE program (the separate
    mean/normalize stages each cost a ~26 ms dispatch RPC per chunk):
    frames (r, H, W, 3) f32 -> (means (r,1,1,1) f32, inpN (r,H,W,3) f32,
    feats 4 levels in model dtype)."""
    key = ("encFull", chs, str(dtype))
    if key not in _stageJits:

        def run(p, frames):
            m = jnp.mean(frames.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
            inpN = frames - m.astype(frames.dtype)
            feats = encoderApply(p, list(chs), inpN.astype(dtype))
            return m, inpN, feats

        _stageJits[key] = stageJit(run, (None, 1), outHAxes=(None, 1, 1))
    return _stageJits[key]


# frame pairs per stage dispatch (see ``Chunk`` in models/estrnn.py):
# batching amortizes the ~31 ms/dispatch tunnel RPC; latency-neutral
# for offline video.  Tail pops compile once per residual size.
Chunk = 8


def doSlomo(func, node, opt: IFRNetOpt):
    """Assemble the slomo stream graph (reference ``doSlomo``
    IFRNet.py:316-343), with optional dedupe branch.

    The time-embedding source is consumed synchronously with the frame
    pairs by the decode stage (it is infinite, so it never gates
    scheduling); the per-pair embt tuple rides along in the decode
    output so the post stage needs no separate embt stream.
    """
    load = max(opt.sf - 1, 1)
    nodes = [
        Node({"IFRNet": "encode"}),
        Node({"IFRNet": "decode"}, load=load),
    ]
    graph = StreamGraph()
    sinkList: List = []

    decJit = _decoderJit(tuple(opt.chs), opt.side, opt.ensemble)
    encFullJit = _encodeFullJit(tuple(opt.chs), opt.dtype)
    decPostJit = _decodePostJit(tuple(opt.chs), opt.side, opt.ensemble, opt.dtype)

    listBatch = lambda x: x

    def makeEncode(meanDst, normDst):
        def encode(frames, last=None):
            # frames: (r, H, W, 3) f32.  ONE dispatch computes the chunk
            # means, normalized frames, and encoder pyramid; the mean and
            # normalized batches go straight to their streams (direct
            # put — a stage broadcasts one output to all outs), and the
            # pyramid items are (pyramid, i) REFERENCES into the chunk's
            # 4 level arrays — decode re-merges contiguous runs into
            # single slices (docs/PERF.md round 3 lazy-rows).
            m, inpN, feats = encFullJit(opt.params, frames)
            meanDst.put(m)
            normDst.put(inpN)
            r = frames.shape[0]
            return [(feats, i) for i in range(r)]

        return encode

    def pairLevels(wins):
        """4 levels of (r, 2, h, w, c) from r windows of (pyramid, i)
        reference items: per level, the left/right columns are
        run-merged slices (aligned chunks: 1-2 device ops each) and ONE
        axis-1 stack pairs them — vs 4*r slices + r+1 stacks eagerly."""
        out = []
        for l in range(4):
            cols = [
                stackBatch([RowRef(w[s][0][l], w[s][1]) for w in wins])
                for s in (0, 1)
            ]
            out.append(jnp.stack(cols, axis=1))
        return out

    def decodePost(featWins, embts, pairs, pairNs, meanPairs, last=None):
        # featWins: r windows [(pyrL, iL), (pyrR, iR)]; embts: r embt
        # tuples; pairs/pairNs: (r, 2, H, W, 3); meanPairs: (r, 2,
        # 1, 1, 1).  Uniform-k chunks (every integer sf) run decoder +
        # postOut as ONE dispatch; mixed-k (fractional sf / dedupe
        # residue) and k=0 items fall back to per-pair calls — exact
        # same math.
        ks = [len(e[0]) for e in embts]
        r = len(embts)
        res: List = []
        if r and ks[0] > 0 and all(k == ks[0] for k in ks):
            t = jnp.asarray(np.stack([e[0] for e in embts]))
            preds = decPostJit(
                opt.params, pairLevels(featWins), t, pairs, pairNs, meanPairs
            )  # (r, k, H, W, 3)
            for i, embt in enumerate(embts):
                for _ in range(int(embt[1])):
                    res.append(pairs[i, 0].astype(jnp.float32))
                for j in range(ks[0]):
                    res.append(preds[i, j])
                for _ in range(int(embt[2])):
                    res.append(pairs[i, 1].astype(jnp.float32))
            return res
        for i in range(r):
            embt = embts[i]
            k = len(embt[0])
            for _ in range(int(embt[1])):  # keep-first copies
                res.append(pairs[i, 0].astype(jnp.float32))
            if k:
                (pyrL, iL), (pyrR, iR) = featWins[i]
                feat = [
                    jnp.stack([pyrL[l][iL], pyrR[l][iR]]) for l in range(4)
                ]
                dec = decJit(
                    opt.params, feat, jnp.asarray(embt[0]).astype(opt.dtype)
                )
                preds = postJit(
                    opt.params, pairs[i], pairNs[i], meanPairs[i],
                    jnp.asarray(embt[0]), dec,
                )
                for j in range(k):
                    res.append(preds[j])
            for _ in range(int(embt[2])):  # keep-last copies
                res.append(pairs[i, 1].astype(jnp.float32))
        return res

    opt.embt = EmbtState(opt.sf)
    inp = Stream(name="inp")
    pairRaw = Stream(2, name="pairRaw")
    meanPair = Stream(2, name="meanPair")
    pairN = Stream(2, name="pairN")
    pairFeat = Stream(2, tensor=False, batchFunc=listBatch, name="featPair")
    outS = Stream(store=False, name="pred")
    outS.sink = sinkList

    if opt.dedupe:
        inps = [Stream(name="inps0"), Stream(name="inps2")]
        graph.tee(inp, inps)
        mean1 = Stream(name="mean1")
        inpN1 = Stream(name="inpN1")
        ft1 = Stream(tensor=False, batchFunc=listBatch, name="ft1")
        graph.stage(
            nodes[0].bindFunc(makeEncode(mean1, inpN1)), [inps[0]], [ft1],
            size=Chunk,
        )
        dedupeOut = [
            Stream(tensor=False, batchFunc=listBatch, name=f"dd{i}") for i in range(5)
        ]
        deduper = Deduper(opt.dedupeLow, opt.dedupeHigh)
        graph.stage(
            deduper, [ft1, opt.embt, inps[1], inpN1, mean1], dedupeOut,
            flushOnce=True,
        )
        extract = lambda n: (
            lambda items, last=None: [
                item[n] for item in items if item[n] is not None
            ]
        )
        emb1 = Stream(tensor=False, batchFunc=listBatch, name="emb1")
        for i, tgt in enumerate((pairFeat, emb1, pairRaw, pairN, meanPair)):
            graph.stage(extract(i), [dedupeOut[i]], [tgt])
        embSource = emb1
    else:
        inps0 = Stream(name="inps0")
        graph.tee(inp, [inps0, pairRaw])
        graph.stage(
            nodes[0].bindFunc(makeEncode(meanPair, pairN)), [inps0],
            [pairFeat], size=Chunk,
        )
        embSource = opt.embt

    graph.stage(
        nodes[1].bindFunc(decodePost),
        [pairFeat, embSource, pairRaw, pairN, meanPair],
        [outS],
        size=Chunk,
    )

    def initFunc(o, x):
        o.padF, o.unpadF, size = alignPad(x, 16)
        o.pad = lambda f: o.padF(f)
        h, w_ = x.shape[0], x.shape[1]
        o.unpad = lambda f: f[:h, :w_]
        o.embt.count = o.start
        o.end = 0
        return size

    return makeStreamFunc(
        func, node, opt, nodes, "slomo", [], initFunc,
        lambda x: inp.put([x]), graph, sinkList,
    )
