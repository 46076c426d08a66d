"""Step-JSON pipeline compiler.

Byte-compatible with the reference's step protocol (``procedure.py``):
a JSON list of ``{'op': ..., ...}`` dicts compiles to a composed
function plus a progress-Node list.  Ops: ``file``, ``buffer``, ``SR``,
``resize``, ``DN``, ``dehaze``, ``output``, ``slomo``, ``VSR``,
``demob``.

In-pipeline image representation: **jnp float32 HWC in [0, 1]** (device
resident between steps — no host round trips mid-chain).  ``channel``
in the out-type dict tracks BGR order for video buffers, exactly like
the reference (``procedure.py:57-60,129-135``).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from moephoto_tpu.config import config
from moephoto_tpu.engine.executor import ModelExec, rgbFilter
from moephoto_tpu.pipeline import registry
from moephoto_tpu.progress import Node
from moephoto_tpu.runtime.context import context
from moephoto_tpu.utils import imageio

videoOps = {"slomo", "VSR", "demob"}
apply_ = lambda v, f: f(v)
identity = lambda x, *_, **__: x
NonNullWrap = lambda f: lambda x: f(x) if x is not None else None
applyNonNull = lambda v, f: NonNullWrap(f)(v)
newNode = lambda opt, op, load=1, total=1: Node(op, load, total, name=opt.get("name", None))


def convertValues(T, o, keys):
    for key in keys:
        if key in o:
            o[key] = T(o[key])


def appendFuncs(f, node, funcs, wrap=True):
    g = node.bindFunc(f)
    funcs.append(NonNullWrap(g) if wrap else g)
    return node


BGR2RGB = lambda im: im[..., ::-1]


def toDevice(im) -> jnp.ndarray:
    """Host HWC uint/float -> device float32 HWC in [0, 1]."""
    arr = np.asarray(im)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65536.0
    elif arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    return jnp.asarray(arr)


def execFilter(exec_: ModelExec) -> Callable:
    if getattr(exec_, "noTile", False):
        def f(im):
            out = exec_.applyWhole(im)
            return out

        return f
    return rgbFilter(exec_)


# --------------------------------------------------------------------------
# step builders: (opt, outType, nodes) -> (funcs, nodes, outType)
# --------------------------------------------------------------------------


def procInput(source, bitDepth, fs, out):
    out["load"], out["sf"] = 1, 1
    node = Node({"op": "toTorch", "bits": bitDepth})
    fs.append(NonNullWrap(node.bindFunc(toDevice)))
    return fs, [node], out


def procDN(opt, out, *_):
    exec_ = opt["opt"]
    node = newNode(opt, dict(op="DN", model=opt["model"]), out["load"])
    return [NonNullWrap(node.bindFunc(execFilter(exec_)))], [node], out


def convertChannel(out):
    out["channel"] = 0
    fs = []
    return fs, [appendFuncs(BGR2RGB, Node(dict(op="Channel")), fs)]


def procSR(opt, out, *_):
    load = out["load"]
    scale = opt["scale"]
    mode = opt["model"]
    exec_ = opt["opt"]
    es = exec_.ensemble + 1
    if not scale > 1:
        raise TypeError("Invalid scale setting for SR.")
    out["load"] = load * scale * scale
    fs, ns = convertChannel(out) if out["channel"] and mode == "gan" else ([], [])
    ns.append(
        appendFuncs(
            execFilter(exec_),
            newNode(opt, dict(op="SR", model=mode, scale=scale), load * es),
            fs,
        )
    )
    return fs, ns, out


def procDehaze(opt, out, *_):
    load = out["load"]
    exec_ = opt["opt"]
    model = opt.get("model", "dehaze")
    fs, ns = convertChannel(out) if out["channel"] else ([], [])
    node = newNode(opt, dict(op=model), load)
    ns.append(appendFuncs(execFilter(exec_), node, fs))
    return fs, ns, out


def resizeStep(opt, out, pos=0, nodes=[]):
    """Bilinear/nearest/bicubic resize (reference ``resize``
    imageProcess.py:174-194), updating downstream node loads once."""
    from moephoto_tpu.models.api import resizeBilinear, resizeNearest

    opt_ = dict(opt)
    opt_.setdefault("method", "bilinear")
    state = {"update": True, "h": 1, "w": 1}

    def f(im):
        if state["update"]:
            h, w = im.shape[0], im.shape[1]
            oriLoad = h * w
            nh = round(h * opt_["scaleH"]) if "scaleH" in opt_ else opt_["height"]
            nw = round(w * opt_["scaleW"]) if "scaleW" in opt_ else opt_["width"]
            state["h"], state["w"] = nh, nw
            newLoad = nh * nw / oriLoad
            if len(nodes):
                nodes[pos].load = im.size
                for n in nodes[pos + 1 :]:
                    n.multipleLoad(newLoad)
            if out["source"]:
                state["update"] = False
        nh, nw = state["h"], state["w"]
        x = im[None]
        if opt_["method"] == "nearest":
            y = resizeNearest(x, nh, nw)
        elif opt_["method"] == "bicubic":
            # Keys cubic (a=-0.5) vs torch bicubic (a=-0.75): visually
            # equivalent smooth kernel, slight tap-weight difference
            import jax.image

            y = jax.image.resize(x, x.shape[:-3] + (nh, nw, x.shape[-1]), "cubic")
        else:
            y = resizeBilinear(x, nh, nw)
        return y[0]

    return f


def procResize(opt, out, nodes):
    load = out["load"]
    node = newNode(opt, dict(op="resize", mode=opt.get("method", "bilinear")), load)
    return [node.bindFunc(NonNullWrap(resizeStep(opt, out, len(nodes), nodes)))], [node], out


def restrictSize(maxSide: int):
    """Downscale to fit within maxSide (preview helper, reference
    ``restrictSize`` imageProcess.py:197-214)."""
    from moephoto_tpu.models.api import resizeBilinear

    def f(im):
        h, w = im.shape[0], im.shape[1]
        if h <= maxSide and w <= maxSide:
            return im
        s = min(maxSide / h, maxSide / w)
        return resizeBilinear(im[None], round(h * s), round(w * s))[0]

    return f


def toFloatHost(im) -> np.ndarray:
    return np.asarray(im, dtype=np.float32)


def _writePreview(im):
    """Write a preview JPEG of the current frame into the shared-memory
    exchange and notify the client (reference ``fPreview/funcPreview``
    procedure.py:36-44): restrict to 2048px, 8-bit, RGB order."""
    if config.videoPreview and context.shared is not None and context.root is not None:
        try:
            small = restrictSize(2048)(im)
            arr = imageio.toOutput(np.asarray(small, dtype=np.float32), 8)
            context.shared.seek(0)
            imageio.writeFile(arr, context.shared, context, config.videoPreview)
            context.root.trace(
                0,
                preview="{}/.preview.{}".format(config.outDir, config.videoPreview),
                fileSize=context.shared.tell(),
            )
        except Exception:
            pass
    return im


def procOutput(opt, out, *_):
    load = out["load"]
    bitDepthOut = out["bitDepth"]
    node0 = Node(dict(op="toFloat"), load)
    node1 = newNode(opt, dict(op="toOutput", bits=bitDepthOut), load)
    fOutput = node1.bindFunc(lambda im: imageio.toOutput(im, bitDepthOut))
    fs = [NonNullWrap(node0.bindFunc(toFloatHost)), NonNullWrap(fOutput)]
    ns = [node0, node1]
    if out["source"]:  # video: emit raw buffers for the encode pipe
        incomingBGR = bool(out["channel"])
        fTrace = lambda x: context.root.trace(1 / out["sf"]) or x
        fs1 = [node0.bindFunc(toFloatHost), fOutput]
        if not out["channel"]:
            ns.append(appendFuncs(BGR2RGB, Node(dict(op="Channel")), fs1, False))
            out["channel"] = 1
        ns.append(
            appendFuncs(
                lambda im: imageio.toBuffer(im, bitDepthOut),
                Node(dict(op="toBuffer", bits=bitDepthOut), load),
                fs1,
                False,
            )
        )
        state = {"i": 0}

        def o(im):
            res = reduce(applyNonNull, fs1, im)
            if im is not None and state["i"] % 30 == 0:
                # preview wants RGB; the frame is BGR iff no model
                # converted it upstream
                rgb = im[..., ::-1] if incomingBGR else im
                _writePreview(rgb)
            state["i"] += 1
            return [res]

        fs = [o, fTrace]
    return fs, ns, out


def procVideo(op):
    """slomo / VSR / demob step builders — resolved lazily so image-only
    deployments never import the temporal models."""

    def f(opt, out, *_):
        load = out["load"]
        fs, ns = convertChannel(out) if out["channel"] else ([], [])
        if op == "SR" or op == "VSR":
            out["load"] = load * 16
        if op == "slomo":
            out["sf"] *= opt["sf"]
            node = newNode(opt, dict(op="slomo"), load, opt["sf"])
            from moephoto_tpu.models.ifrnet import doSlomo

            return fs + [doSlomo], ns + [node], out
        if op == "VSR":
            ns.append(newNode(opt, dict(op="VSR", learn=0), load))
            from moephoto_tpu.models.iconvsr import doVSR

            return fs + [doVSR], ns, out
        if op == "demob":
            ns.append(newNode(opt, dict(op="ESTRNN", learn=0), out["load"]))
            from moephoto_tpu.models.estrnn import doESTRNN

            return fs + [doESTRNN], ns, out
        raise KeyError(op)

    return f


def _getOptVideo(op):
    def f(opt):
        if op == "slomo":
            from moephoto_tpu.models import ifrnet

            return ifrnet.getOpt(opt)
        if op == "VSR":
            from moephoto_tpu.models import iconvsr

            return iconvsr.getOpt(opt)
        from moephoto_tpu.models import estrnn

        return estrnn.getOpt(opt)

    return f


procs: Dict[str, Callable] = dict(
    file=(
        lambda _, _0, nodes: procInput(
            "file",
            8,
            [context.getFile, lambda f: imageio.readFile(f, context)],
            dict(bitDepth=8, channel=0, source=0),
        )
    ),
    buffer=(
        lambda opt, *_: procInput(
            "buffer",
            opt["bitDepth"],
            [lambda args: imageio.fromBuffer(*args, bitDepth=opt["bitDepth"])],
            dict(bitDepth=opt["bitDepth"], channel=1, source=1),
        )
    ),
    DN=procDN,
    SR=procSR,
    output=procOutput,
    dehaze=procDehaze,
    resize=procResize,
    slomo=procVideo("slomo"),
    VSR=procVideo("VSR"),
    demob=procVideo("demob"),
)

stepOpts = dict(
    SR={"toInt": ["scale", "ensemble"], "getOpt": registry.getSR},
    resize={"toInt": ["width", "height"], "toFloat": ["scaleW", "scaleH"]},
    DN={"toFloat": ["strength"], "getOpt": registry.getDN},
    dehaze={"toFloat": ["strength"], "getOpt": registry.getDehaze},
    slomo={
        "toInt": ["ensemble"],
        "toFloat": ["sf", "high", "low"],
        "isEnabled": ["dedupe"],
        "getOpt": _getOptVideo("slomo"),
    },
    VSR={"getOpt": _getOptVideo("VSR")},
    demob={"getOpt": _getOptVideo("demob")},
)


def genProcess(steps: List[dict], root: bool = True, outType: Optional[dict] = None):
    """Compile a step list into (process, nodes) — reference
    ``genProcess`` procedure.py:156-202."""
    funcs: List[Callable] = []
    nodes: List[Node] = []
    last = identity
    rf = lambda im: reduce(apply_, funcs, im)
    if root:
        stepOffset = 0 if steps[0]["op"] == "file" else 2
        for i, opt in enumerate(steps):
            opt["name"] = i + stepOffset
            if opt["op"] in stepOpts:
                so = stepOpts[opt["op"]]
                convertValues(int, opt, so.get("toInt", []))
                convertValues(float, opt, so.get("toFloat", []))
                convertValues(
                    lambda obj: obj.get("enable", 0) if isinstance(obj, dict) else obj,
                    opt,
                    so.get("isEnabled", []),
                )
                if "getOpt" in so:
                    opt["opt"] = so["getOpt"](opt)
        if steps[-1]["op"] != "output":
            steps.append(dict(op="output"))
        process = lambda im, name=None: last(rf(im), name, context)
    else:
        process = rf
    for i, opt in enumerate(steps):
        op = opt["op"]
        fs, ns, outType = procs[op](opt, outType, nodes)
        funcs.extend(fs)
        nodes.extend(ns)
        if op in videoOps:
            if i + 1 < len(steps):
                f, nodesAfter = genProcess(steps[i + 1 :], False, outType)
            else:
                f = identity
                nodesAfter = []
            videoOpt = opt["opt"]
            funcs[-1] = funcs[-1](f, nodes[-1], videoOpt)
            nodeAfter = Node({}, total=opt.get("sf", 1), learn=0)
            for node in nodesAfter:
                nodeAfter.append(node)
            nodes.append(nodeAfter)
            break
    if root and steps[0]["op"] == "file":
        n = Node({"op": "write"}, outType["load"])
        nodes.append(n)
        last = n.bindFunc(imageio.writeFile)
    else:
        context.imageMode = "RGB"
    return process, nodes
