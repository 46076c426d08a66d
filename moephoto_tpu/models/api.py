"""Parameter convention and layer primitives.

Parameters are a **flat dict** ``{torch_state_dict_key: jnp.ndarray}``
pre-transformed to TPU layouts at load time:

  - Conv2d weight      OIHW -> HWIO
  - ConvTranspose2d    IOHW -> HWIO of the equivalent direct conv
                       (spatially flipped, in/out swapped), applied via
                       ``lax.conv_general_dilated`` with lhs dilation
  - Linear weight      (out, in) -> (in, out)
  - 1D params (bias, PReLU slope, norm scale) unchanged

Keeping torch key names makes weight conversion mechanical and lets
golden tests diff layer-by-layer against the reference checkpoints
(e.g. ``model/lite/model.pth``).  All activations are NHWC; matmuls and
convs accumulate in fp32 (``preferred_element_type``).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

# MXU precision for fp32 inputs: 'default' lets the MXU run bf16 passes
# (fast, ~1e-3 per-layer error), 'highest' runs the fp32-equivalent
# multi-pass.  When the compute dtype is bf16 this is irrelevant; when a
# model is pinned fp32 (parity mode) we want exactness.
_precision = ["default"]

# Conv accumulation dtype.  Inference pins ``preferred_element_type``
# to fp32 (the repo convention).  Under reverse-mode AD, though, JAX's
# conv *transpose* rule feeds the fp32 cotangent back into a conv whose
# other operand is still bf16 and ``conv_general_dilated`` rejects the
# dtype mix — so the mixed-precision train step (parallel/sharded.py
# makeOptaxTrainStep computeDtype=bf16) traces its forward/backward
# inside :func:`trainAccum`, which drops the pin and lets convs
# accumulate to the operand dtype.  The MXU still accumulates fp32
# internally; only the inter-op activations round to bf16, which is the
# standard mixed-precision training contract.
_convPET = [jnp.float32]


class trainAccum:
    """Context manager: trace convs without the fp32 output pin (see
    ``_convPET``).  Use only around train-step tracing."""

    def __enter__(self):
        self._prev = _convPET[0]
        _convPET[0] = None
        return self

    def __exit__(self, *exc):
        _convPET[0] = self._prev
        return False


def setPrecision(p: str) -> None:
    assert p in ("default", "high", "highest")
    _precision[0] = p


def getPrecision() -> str:
    return _precision[0]


def conv2d(
    params: Params,
    key: str,
    x: jnp.ndarray,
    stride: int = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    groups: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Torch-semantics Conv2d on NHWC input with HWIO weight."""
    w = params[key + ".weight"]
    if isinstance(padding, int):
        padding = (padding, padding)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=dn,
        feature_group_count=groups,
        precision=_precision[0],
        preferred_element_type=_convPET[0],
    )
    b = params.get(key + ".bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def convTranspose2d(
    params: Params,
    key: str,
    x: jnp.ndarray,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 0,
) -> jnp.ndarray:
    """Torch ConvTranspose2d as a fractionally-strided direct conv.

    The weight in ``params`` is already the equivalent direct-conv HWIO
    kernel (see :func:`convertStateDict`); here we dilate the input by
    ``stride`` and pad by ``k - 1 - padding`` (+ output_padding on the
    trailing edges).
    """
    w = params[key + ".weight"]
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=dn,
        precision=_precision[0],
        preferred_element_type=_convPET[0],
    )
    b = params.get(key + ".bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def linear(params: Params, key: str, x: jnp.ndarray) -> jnp.ndarray:
    w = params[key + ".weight"]  # (in, out)
    y = jnp.dot(
        x, w.astype(x.dtype), precision=_precision[0], preferred_element_type=jnp.float32
    )
    b = params.get(key + ".bias")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def prelu(params: Params, key: str, x: jnp.ndarray) -> jnp.ndarray:
    a = params[key + ".weight"].astype(x.dtype)
    if a.ndim == 1 and a.shape[0] > 1:
        a = a.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, a * x)


def scaleLayer(params: Params, key: str, x: jnp.ndarray) -> jnp.ndarray:
    """Learned scalar multiplier (reference ``ScaleLayer`` models.py:66-73)."""
    return x * params[key + ".scale"].astype(x.dtype)


leakyRelu = lambda x, slope=0.2: jnp.where(x >= 0, x, x * slope)
relu = jax.nn.relu
sigmoid = jax.nn.sigmoid


def layerNorm2d(params: Params, key: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the channel axis (reference ``LayerNorm2d``
    models.py:62-64 permutes to channels-last; we are already there)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params[key + ".weight"].astype(jnp.float32) + params[key + ".bias"].astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def pixelShuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Torch pixel_shuffle on NHWC: channel index c*r^2 + i*r + j."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


def pixelUnshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    if r == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # b, h', w', c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)


def globalAvgPool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) on NHWC -> (B, 1, 1, C)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)


def avgPool2d(x: jnp.ndarray, k: int, stride: int, padding: int = 0, count_include_pad: bool = True) -> jnp.ndarray:
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1), pads
    )
    if count_include_pad or padding == 0:
        return (s / (k * k)).astype(x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, stride, stride, 1), pads
    )
    return (s / cnt).astype(x.dtype)


def maxPool2d(x: jnp.ndarray, k: int, stride: int, padding: int = 0) -> jnp.ndarray:
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype in (jnp.float32, jnp.bfloat16) else x.dtype.type(-(2**30)),
        jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), pads
    )


def resizeBilinear(x: jnp.ndarray, h: int, w: int, align_corners: bool = False) -> jnp.ndarray:
    """Torch ``F.interpolate(mode='bilinear')`` on NHWC (no antialias).

    Deliberately does NOT auto-dispatch exact-2x upsamples to
    ``resizeBilinear2x``: the phase form only wins where the
    surrounding program fuses its shifted adds (EDVR PCD/TSA, which
    call it explicitly); auto-dispatching it everywhere measured
    IconVSR 1.199 -> 1.151 and IFRNet 14.95 -> 14.32 Mpx/s — the
    C<=3 fine-res interleaves cost more than the dense dots they
    replace (round 5, docs/PERF.md)."""
    if align_corners:
        return _resizeAlignCorners(x, h, w)
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=False).astype(x.dtype)


def resizeBilinear2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample (half-pixel centers, edge clamp) by
    PHASE adds + reshape interleave on NHWC ``(..., H, W, C)``.

    Numerically identical to ``jax.image.resize(..., 'bilinear',
    antialias=False)`` at scale 2 (maxabs 6e-8 in f32): for output row
    ``2k`` the source coordinate is ``k - 0.25`` (weights 0.25/0.75 on
    rows ``k-1``/``k``, edge-clamped) and for ``2k+1`` it is ``k + 0.25``
    — two fixed 2-tap filters per axis, one per output phase.

    Why not ``jax.image.resize``: XLA lowers that to dense (out, in)
    interpolation-matrix dot_generals, which measure FAST standalone
    (5 ms at (14, 192, 320, 64) -> 2x) but poison fusion inside large
    programs — patching only this formulation into the EDVR slab
    program cut it 664 -> 544 ms/slab while the nearest-resize control
    put the total in-situ resize cost at 183 ms/slab (round 5,
    docs/PERF.md).  Shifted adds + an interleave reshape fuse with the
    surrounding convs instead.
    """
    f = x.astype(jnp.float32)
    B = f.shape[:-3]
    H, W, C = f.shape[-3], f.shape[-2], f.shape[-1]

    # rows
    up = jnp.concatenate([f[..., :1, :, :], f[..., :-1, :, :]], axis=-3)
    dn = jnp.concatenate([f[..., 1:, :, :], f[..., -1:, :, :]], axis=-3)
    even = 0.25 * up + 0.75 * f
    odd = 0.75 * f + 0.25 * dn
    f = jnp.stack([even, odd], axis=-3).reshape(B + (2 * H, W, C))
    # cols
    lf = jnp.concatenate([f[..., :, :1, :], f[..., :, :-1, :]], axis=-2)
    rt = jnp.concatenate([f[..., :, 1:, :], f[..., :, -1:, :]], axis=-2)
    even = 0.25 * lf + 0.75 * f
    odd = 0.75 * f + 0.25 * rt
    f = jnp.stack([even, odd], axis=-2).reshape(B + (2 * H, 2 * W, C))
    return f.astype(x.dtype)


def resizeNearest(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest").astype(x.dtype)


def _resizeAlignCorners(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (corner-pixel alignment)."""
    ih, iw = x.shape[-3], x.shape[-2]
    dt = jnp.float32
    ys = jnp.linspace(0.0, ih - 1.0, h, dtype=dt) if h > 1 else jnp.zeros((1,), dt)
    xs = jnp.linspace(0.0, iw - 1.0, w, dtype=dt) if w > 1 else jnp.zeros((1,), dt)
    y0 = jnp.clip(jnp.floor(ys), 0, ih - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, iw - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0).astype(dt)
    wx = (xs - x0).astype(dt)
    xf = x.astype(dt)
    top = xf[..., y0, :, :] * (1 - wy)[..., :, None, None] + xf[..., y1, :, :] * wy[..., :, None, None]
    out = (
        top[..., :, x0, :] * (1 - wx)[..., None, :, None]
        + top[..., :, x1, :] * wx[..., None, :, None]
    )
    return out.astype(x.dtype)


def interpolateScale(x: jnp.ndarray, scale: float, mode: str = "bilinear", align_corners: bool = False) -> jnp.ndarray:
    h = int(x.shape[-3] * scale)
    w = int(x.shape[-2] * scale)
    if mode == "nearest":
        return resizeNearest(x, h, w)
    return resizeBilinear(x, h, w, align_corners)


def reflectPad2d(x: jnp.ndarray, pads: Tuple[int, int, int, int]) -> jnp.ndarray:
    """Torch ReflectionPad2d (left, right, top, bottom) on NHWC."""
    l, r, t, b = pads
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


def deferredSubpixelConv(
    wf: jnp.ndarray, x: jnp.ndarray, bias=None
) -> jnp.ndarray:
    """KxK (odd) conv on the *fine* grid, computed on a deferred
    sub-pixel layout without ever materializing the interleaved image.

    x:  (b, h, w, R, C, cin) representing fine[(R*i + r), (C*j + s)].
    wf: (K, K, cin, cout) fine-grid kernel, SAME padding.
    Returns (b, h, w, R, C, cout).

    The fine conv becomes a 3x3 coarse conv over R*C*cin -> R*C*cout
    channels whose weights scatter the original taps by phase — bigger
    matmuls at coarse resolution, which the MXU likes far better than
    strided pixel-shuffle transposes.
    """
    K = wf.shape[0]
    p = K // 2
    b, h, w, R, C, cin = x.shape
    cout = wf.shape[-1]
    # scatter the fine taps into the coarse kernel; static indices so the
    # few-hundred tiny updates fuse into one cheap device-side assembly
    Wc = jnp.zeros((3, 3, R, C, cin, R, C, cout), x.dtype)
    for r in range(R):  # output sub-row
        for dy in range(K):
            u = r + dy - p
            ci = u // R
            rp = u % R
            if not (-1 <= ci <= 1):
                raise ValueError("kernel too large for deferred layout")
            for s in range(C):
                for dx in range(K):
                    v = s + dx - p
                    cj = v // C
                    sp = v % C
                    Wc = Wc.at[ci + 1, cj + 1, rp, sp, :, r, s, :].set(
                        wf[dy, dx].astype(x.dtype)
                    )
    Wc = Wc.reshape(3, 3, R * C * cin, R * C * cout)
    xi = x.reshape(b, h, w, R * C * cin)
    dn = jax.lax.conv_dimension_numbers(xi.shape, Wc.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xi, Wc, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        precision=_precision[0], preferred_element_type=_convPET[0],
    )
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), R * C)
    return y.astype(x.dtype).reshape(b, h, w, R, C, cout)


def interleaveDeferred(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, R, C, c) deferred layout -> (b, h*R, w*C, c)."""
    b, h, w, R, C, c = x.shape
    y = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h * R, w * C, c)


def interleaveNested(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Nested deferred layout -> spatial.

    x: (b, h, w, 2, 2, ..., 2, 2, c) with ``n`` (row, col) sub-position
    axis pairs appended in stage order (earlier stages outermost: fine
    row = ((a1*2 + a2)*2 + ...)).  One transpose at the very end — run
    it on the 1-channel output so the strided copy is tiny.
    """
    b, h, w = x.shape[:3]
    c = x.shape[-1]
    rows = [3 + 2 * i for i in range(n)]
    cols = [4 + 2 * i for i in range(n)]
    y = jnp.transpose(x, (0, 1, *rows, 2, *cols, 3 + 2 * n))
    return y.reshape(b, h << n, w << n, c)


# --------------------------------------------------------------------------
# Weight conversion
# --------------------------------------------------------------------------

def convertStateDict(
    stateDict: Dict[str, "np.ndarray"],
    convTPattern: Optional[Union[str, Callable[[str], bool]]] = None,
) -> Dict[str, np.ndarray]:
    """Transform a torch state dict (numpy values) to TPU layouts.

    ``convTPattern``: regex or predicate ``(key, shape) -> bool`` selecting
    ConvTranspose2d weight keys, which need the flipped/swapped kernel
    transform instead of the plain OIHW->HWIO transpose.
    """
    if isinstance(convTPattern, str):
        pat = re.compile(convTPattern)
        isConvT = lambda k, s: bool(pat.search(k))
    elif convTPattern is None:
        isConvT = lambda k, s: False
    else:
        isConvT = convTPattern

    out: Dict[str, np.ndarray] = {}
    for k, v in stateDict.items():
        v = np.asarray(v)
        if v.ndim == 4 and k.endswith("weight"):
            if isConvT(k, v.shape):
                # IOHW -> flip spatial, swap in/out -> HWIO
                v = v[:, :, ::-1, ::-1]
                v = np.transpose(v, (2, 3, 0, 1))  # H W I(=torch in) O(=torch out)
            else:
                v = np.transpose(v, (2, 3, 1, 0))  # OIHW -> HWIO
        elif v.ndim == 2 and k.endswith("weight"):
            v = np.transpose(v)  # (out, in) -> (in, out)
        out[k] = np.ascontiguousarray(v)
    return out


def saveParams(params: Params, path: str) -> None:
    """Save converted params as a torch-free native checkpoint (.npz)."""
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def loadParams(path: str, dtype=None) -> Params:
    """Load a native .npz checkpoint saved by :func:`saveParams`."""
    with np.load(path) as z:
        return {
            k: jnp.asarray(
                z[k], dtype=dtype if np.issubdtype(z[k].dtype, np.floating) else None
            )
            for k in z.files
        }


def loadTorchWeights(
    path: str,
    convTPattern=None,
    dtype=None,
    subKey: Optional[str] = None,
) -> Params:
    """Load a checkpoint into the flat param convention.

    ``.npz`` native checkpoints (see :func:`saveParams` /
    ``tools/convert_checkpoints.py``) load without torch; ``.pth`` uses
    torch (CPU build) purely as a deserializer — everything after
    ``numpy()`` is JAX.  ``subKey`` selects a nested sub-dict (e.g. the
    per-module groups in the IconVSR checkpoint, ``runSlomo.py:26-31``).
    """
    npzPath = path[: -len(".pth")] + ".npz" if path.endswith(".pth") else path
    if npzPath.endswith(".npz") and os.path.exists(npzPath) and subKey is None:
        return loadParams(npzPath, dtype)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "params" in sd and all(
        not torch.is_tensor(v) for k, v in list(sd.items())[:1]
    ):
        if not torch.is_tensor(sd["params"]):
            sd = sd["params"]
    if subKey is not None:
        sd = sd[subKey]
    npd = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    converted = convertStateDict(npd, convTPattern)
    if dtype is not None:
        converted = {k: jnp.asarray(v, dtype=dtype if np.issubdtype(v.dtype, np.floating) else None) for k, v in converted.items()}
    else:
        converted = {k: jnp.asarray(v) for k, v in converted.items()}
    return converted


def packBlockDiag(params: Params, pack: int = 3) -> Params:
    """Expand every conv/linear weight to a block-diagonal over ``pack``
    independent copies (channels cin*pack -> cout*pack).

    Y-channel models process R, G, B as independent planes; running them
    as batch entries leaves the MXU at 48/128 lanes.  Packing the three
    planes into the channel dimension with block-diagonal weights costs
    3x FLOPs but runs at ~5x the MXU efficiency (48 -> 144 channels) —
    a measured ~2x end-to-end win.  Channel-local ops (PReLU scalar
    slopes, per-channel pooling, sigmoid gates, residuals) are exactly
    preserved; biases tile per block.
    """
    out: Params = {}
    for k, v in params.items():
        if v.ndim == 4 and k.endswith(".weight"):
            kh, kw, cin, cout = v.shape
            w = jnp.zeros((kh, kw, cin * pack, cout * pack), v.dtype)
            for p in range(pack):
                w = w.at[:, :, p * cin : (p + 1) * cin, p * cout : (p + 1) * cout].set(v)
            out[k] = w
        elif v.ndim == 1 and (k.endswith(".bias") or k.endswith(".scale")):
            out[k] = jnp.tile(v, pack) if v.shape[0] > 1 or k.endswith(".bias") else v
        else:
            out[k] = v
    return out


def castParams(params: Params, dtype) -> Params:
    return {
        k: (v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v)
        for k, v in params.items()
    }
