"""ESTRNN recurrent video deblur (reference ``python/ESTRNN.py``;
Zhong et al., ECCV 2020).

Dataflow: per-frame RDBCell with carried hidden state -> 5-frame window
of features + pooled weights -> GSA global spatio-temporal attention ->
transposed-conv reconstructor.  The reference's StreamState graph
(``doESTRNN`` :209-224) maps to a 4-stage :class:`StreamGraph`; the
recurrent cell is a jitted function with the hidden state carried on
the host side between calls.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from moephoto_tpu.config import config
from moephoto_tpu.engine.stream import Stream, StreamGraph
from moephoto_tpu.models.api import (
    Params,
    conv2d,
    convTranspose2d,
    linear,
    sigmoid,
)
from moephoto_tpu.models.streamcommon import StreamOpt, alignPad, makeStreamFunc
from moephoto_tpu.parallel.temporal import stageJit
from moephoto_tpu.progress import Node

NumFeat = 16
RefTime = 5  # past 2 + current + future 2 (ESTRNN.py:21-27)
pastFrames = 2
futureFrames = 2
DS_ratio = 2
nBlocks = 15

gelu = lambda x: jax.nn.gelu(x, approximate=False)


def _rdb(params: Params, p: str, x: jnp.ndarray, numLayer: int = 3) -> jnp.ndarray:
    """Residual dense block (ESTRNN.py:60-74): dense GELU convs + 1x1,
    residual.  Children: 0..numLayer-1 dense layers, numLayer = conv1x1."""
    h = x
    for i in range(numLayer):
        y = gelu(conv2d(params, f"{p}.{i}.conv", h, padding=1))
        h = jnp.concatenate([h, y], axis=-1)
    return x + conv2d(params, f"{p}.{numLayer}", h)


def _rdbDS(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """RDB + stride-2 conv5x5 downsample (ESTRNN.py:94-97)."""
    y = _rdb(params, p + ".0", x)
    return conv2d(params, p + ".1", y, stride=2, padding=2)


def _rdnet(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """RDNet (ESTRNN.py:77-91): 15 RDBs, concat all, 1x1 + 3x3."""
    outs = []
    h = x
    for i in range(nBlocks):
        h = _rdb(params, f"{p}.RDBs.{i}", h)
        outs.append(h)
    cat = jnp.concatenate(outs, axis=-1)
    y = conv2d(params, p + ".conv1x1", cat)
    return conv2d(params, p + ".conv3x3", y, padding=1)


def cellApply(params: Params, x: jnp.ndarray, hidden: jnp.ndarray):
    """RDBCell (ESTRNN.py:140-164): returns (features, new_hidden)."""
    out = conv2d(params, "cell.F_B0", x, padding=2)
    out = _rdbDS(params, "cell.F_B1", out)
    out = _rdbDS(params, "cell.F_B2", out)
    out = jnp.concatenate([out, hidden], axis=-1)
    h = _rdnet(params, "cell.F_R", out)
    newHidden = conv2d(params, "cell.F_h.0", out, padding=1)
    newHidden = _rdb(params, "cell.F_h.1", newHidden)
    newHidden = conv2d(params, "cell.F_h.2", newHidden, padding=1)
    return h, newHidden


def gsaApply(params: Params, hs: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """GSA fusion (ESTRNN.py:100-137).

    hs: (b, 5, h, w, c); weight: (b, 5, c).  Channel-last layout;
    channel concat of (ref, neighbour) matches the torch dim-1 concat.
    """
    b, n, h, w, c = hs.shape
    center = pastFrames
    ids = [i for i in range(n) if i != center]
    ref = hs[:, center]  # (b, h, w, c)
    wRef = weight[:, center]
    cor = jnp.stack(
        [jnp.concatenate([ref, hs[:, i]], axis=-1) for i in ids], axis=1
    )  # (b, 4, h, w, 2c)
    wCat = jnp.stack(
        [jnp.concatenate([wRef, weight[:, i]], axis=-1) for i in ids], axis=1
    )  # (b, 4, 2c)
    wf = linear(params, "fusion.F_f.0", wCat)
    wf = gelu(wf)
    wf = linear(params, "fusion.F_f.2", wf)
    wf = sigmoid(wf)  # (b, 4, 2c)
    corF = cor.reshape(b * 4, h, w, 2 * c)
    corF = conv2d(params, "fusion.F_p.0", corF)
    corF = conv2d(params, "fusion.F_p.1", corF)
    corF = wf.reshape(b * 4, 1, 1, 2 * c) * corF
    corF = conv2d(params, "fusion.condense", corF)  # (b*4, h, w, c)
    corL = jnp.concatenate(
        [corF.reshape(b, 4, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b, h, w, 4 * c), ref],
        axis=-1,
    )
    return conv2d(params, "fusion.fusion", corL)


def reconsApply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Reconstructor (ESTRNN.py:166-172): two stride-2 ConvT + conv5x5."""
    y = convTranspose2d(params, "recons.0", x, stride=2, padding=1, output_padding=1)
    y = convTranspose2d(params, "recons.1", y, stride=2, padding=1, output_padding=1)
    return conv2d(params, "recons.2", y, padding=2)


modelPaths = {
    "1ms8ms": "model/ESTRNN/ESTRNN_C80B15_BSD_1ms8ms.pth",
    "2ms16ms": "model/ESTRNN/ESTRNN_C80B15_BSD_2ms16ms.pth",
    "3ms24ms": "model/ESTRNN/ESTRNN_C80B15_BSD_3ms24ms.pth",
}


class ESTRNNOpt(StreamOpt):
    pass


def getOpt(option: dict) -> ESTRNNOpt:
    from moephoto_tpu.pipeline.registry import modelPath

    opt = ESTRNNOpt()
    path = modelPath(modelPaths[option["model"]])
    # checkpoint is a dict of per-module state dicts (runSlomo.py:20-31)
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    from moephoto_tpu.models.api import convertStateDict

    dtype = config.dtype()
    params = {}
    for mod in ("cell", "fusion", "recons"):
        sd = {f"{mod}.{k}": v.numpy() for k, v in raw[mod].items()}
        isConvT = (lambda k, s: k.startswith("recons.") and k in
                   ("recons.0.weight", "recons.1.weight"))
        conv = convertStateDict(sd, isConvT)
        params.update({k: jnp.asarray(v, dtype=dtype if v.dtype.kind == "f" else None)
                       for k, v in conv.items()})
    opt.params = params
    opt.dtype = dtype
    return opt


def synthParams(seed: int = 0, dtype=jnp.float32) -> Params:
    """Random-init parameters in the checkpoint layout (reference
    ESTRNN.py:100-172 modules cell/fusion/recons), run through the same
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
        sd[name + ".bias"] = rng.randn(shape[0]).astype(np.float32) * 0.01

    def rdb(prefix, g, c0):
        # 3 dense conv layers growing by g, then a 1x1 condenser
        for i in range(3):
            t(f"{prefix}.{i}.conv", g, c0 + i * g, 3, 3)
        return c0 + 3 * g

    t("cell.F_B0", 16, 3, 5, 5)
    t("cell.F_B1.0.3", 16, rdb("cell.F_B1.0", 16, 16), 1, 1)
    t("cell.F_B1.1", 32, 16, 5, 5)
    t("cell.F_B2.0.3", 32, rdb("cell.F_B2.0", 24, 32), 1, 1)
    t("cell.F_B2.1", 64, 32, 5, 5)
    for b in range(15):
        t(f"cell.F_R.RDBs.{b}.3", 80, rdb(f"cell.F_R.RDBs.{b}", 32, 80), 1, 1)
    t("cell.F_R.conv1x1", 80, 15 * 80, 1, 1)
    t("cell.F_R.conv3x3", 80, 80, 3, 3)
    t("cell.F_h.0", 16, 80, 3, 3)
    t("cell.F_h.1.3", 16, rdb("cell.F_h.1", 16, 16), 1, 1)
    t("cell.F_h.2", 16, 16, 3, 3)
    t("fusion.F_f.0", 320, 160)
    t("fusion.F_f.2", 160, 320)
    t("fusion.F_p.0", 320, 160, 1, 1)
    t("fusion.F_p.1", 160, 320, 1, 1)
    t("fusion.condense", 80, 160, 1, 1)
    t("fusion.fusion", 400, 400, 1, 1)

    def tT(name, cin, cout, k):
        # ConvTranspose2d: weight (in, out, kh, kw), bias (out,)
        sd[name + ".weight"] = (
            rng.randn(cin, cout, k, k) / np.sqrt(k * k * cin) * 0.5
        ).astype(np.float32)
        sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.01

    tT("recons.0", 400, 32, 3)
    tT("recons.1", 32, 16, 3)
    t("recons.2", 3, 16, 5, 5)
    isConvT = lambda k, s: k in ("recons.0.weight", "recons.1.weight")
    conv = convertStateDict(sd, isConvT)
    return {k: jnp.asarray(v, dtype=dtype) for k, v in conv.items()}


def cellScanApply(params: Params, frames: jnp.ndarray, hidden: jnp.ndarray):
    """RDBCell recurrence over a chunk of ``T`` frames as ONE program
    (``lax.scan`` carrying the hidden state).  Same sequential math as
    T ``cellApply`` calls — chunking only cuts dispatch count: each
    device round-trip costs ~31 ms through the tunnel, and the per-frame
    graph spent 4 dispatches + a sync per frame (docs/PERF.md round 3).

    frames: (T, H, W, 3); hidden: (1, h, w, c) -> ((T, h, w, c), hidden')
    """

    def step(h, frame):
        feat, h2 = cellApply(params, frame[None], h)
        return h2, feat[0]

    hidden, hs = jax.lax.scan(step, hidden, frames)
    return hs, hidden


def cellScanPoolApply(params: Params, frames: jnp.ndarray, hidden: jnp.ndarray):
    """Recurrence + the GSA pooling weights in ONE program (the separate
    pooling stage cost a ~26 ms param-marshal dispatch per chunk for a
    (r, c) mean)."""
    hs, hidden = cellScanApply(params, frames, hidden)
    w = jnp.mean(hs.astype(jnp.float32), axis=(1, 2)).astype(hs.dtype)
    return hs, w, hidden


def gsaReconsApply(params: Params, hsB: jnp.ndarray, wB: jnp.ndarray):
    """GSA fusion + reconstructor in ONE program, including the
    reference's doCrop path (ESTRNN.py:223: align=32 reflect pad, output
    cropped); no clamp — the reference clamps only at bit-depth
    conversion."""
    x = gsaApply(params, hsB, wB)
    b, h, w, c = x.shape
    H = -(-h // 32) * 32
    W = -(-w // 32) * 32
    if (H, W) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, H - h), (0, W - w), (0, 0)), mode="reflect")
    return reconsApply(params, x)[:, : h * 4, : w * 4].astype(jnp.float32)


# module-level stage jits: executables persist across graph instances,
# so per-task pipeline rebuilds don't re-trace/re-compile known shapes
# stageJit == plain jax.jit single-device; with config.meshShape set the
# stages run row-sharded over the mesh (parallel/temporal.py)
cellJit = stageJit(cellApply, (None, 1, 1), outHAxes=(1, 1))  # x/hidden
cellScanJit = stageJit(cellScanApply, (None, 1, 1), outHAxes=(1, 1))
gsaJit = stageJit(gsaApply, (None, 2, None), outHAxes=(1,))  # hs (b,5,h,w,c)
reconsJit = stageJit(reconsApply, (None, 1), outHAxes=(1,))
cellScanPoolJit = stageJit(cellScanPoolApply, (None, 1, 1), outHAxes=(1, None, 1))
gsaReconsJit = stageJit(gsaReconsApply, (None, 2, None), outHAxes=(1,))

# frames per stage dispatch: the recurrence runs as scan chunks and the
# batch stages (pooling/GSA/recons) pop up to this many items at once.
# Latency-neutral for offline video; tail pops compile once per size.
Chunk = 8


def doESTRNN(func, node, opt: ESTRNNOpt):
    """Assemble the stream graph (reference ``doESTRNN`` :209-224)."""
    nodes = [Node({"ESTRNN": key}) for key in ("forward", "fusion")]
    graph = StreamGraph()
    sinkList: List = []

    hiddenBox = {"h": None}

    w = Stream(RefTime, reserve=1, name="w")

    def calcForward(x, last=None):
        # x: (r, H, W, 3) batch (inp is a tensor stream — pop stacks up
        # to ``Chunk`` frames); the whole chunk runs as one scan program
        # (cellScanPoolApply) with the hidden carry threaded across
        # chunks — identical math to per-frame calls.  The GSA pooling
        # weights come out of the same dispatch and go straight to the
        # ``w`` stream (put here, not via a second stage — a stage
        # broadcasts ONE output to all outs).
        frames = x.astype(opt.dtype)
        if hiddenBox["h"] is None:
            H, W = frames.shape[1] >> DS_ratio, frames.shape[2] >> DS_ratio
            hiddenBox["h"] = jnp.zeros((1, H, W, NumFeat), opt.dtype)
        hs, wArr, hiddenBox["h"] = cellScanPoolJit(
            opt.params, frames, hiddenBox["h"]
        )
        w.put(wArr)
        return hs  # (r, h, w, c) -> r items

    def fusionStage(hsB, wB, last=None):
        # hsB: (r, 5, h, w, c); wB: (r, 5, c) -> final frames (one
        # GSA+recons dispatch; sink slices per frame)
        out = gsaReconsJit(opt.params, hsB, wB)
        return [out[i] for i in range(out.shape[0])]

    inp = Stream(name="inp")
    hs = Stream(RefTime, reserve=1, name="hs")
    outS = Stream(store=False, name="out")
    outS.sink = sinkList

    graph.stage(nodes[0].bindFunc(calcForward), [inp], [hs], size=Chunk)
    graph.stage(nodes[1].bindFunc(fusionStage), [hs, w], [outS], size=Chunk)

    def initFunc(o, x):
        o.padF, o.unpadF, size = alignPad(x, 8)
        o.pad = lambda f: o.padF(f)
        h, w_ = x.shape[0], x.shape[1]
        o.unpad = lambda f: f[:h, :w_]
        return size

    return makeStreamFunc(
        func, node, opt, nodes, "ESTRNN", [hs, w], initFunc,
        lambda x: inp.put([x]), graph, sinkList,
    )
