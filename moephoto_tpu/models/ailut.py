"""AiLUT adaptive-interval 3D LUT retouching (reference
``python/AiLUT.py``; AdaInt, CVPR 2022).

Backbone (TPAMI 5-conv or ResNet-18) runs on a fixed 256/224 px resize,
produces the LUT-generator weights and the adaptive vertices; the LUT is
applied to the full-resolution image by :func:`ops.lut.ailutTransform`
(the reference's CUDA extension, rebuilt as XLA/Pallas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    leakyRelu,
    linear,
    maxPool2d,
    relu,
    resizeBilinear,
)
from moephoto_tpu.ops.lut import ailutTransform


def instanceNorm2d(params: Params, key: str, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    f = x.astype(jnp.float32)
    mean = jnp.mean(f, axis=(1, 2), keepdims=True)
    var = jnp.var(f, axis=(1, 2), keepdims=True)
    y = (f - mean) * jax.lax.rsqrt(var + eps)
    y = y * params[key + ".weight"].astype(jnp.float32) + params[key + ".bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def adaptiveAvgPool2d(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d for divisible sizes (backbone is 8x8 -> 2x2)."""
    b, h, w, c = x.shape
    kh, kw = h // out, w // out
    x = x.reshape(b, out, kh, out, kw, c)
    return jnp.mean(x.astype(jnp.float32), axis=(2, 4)).astype(x.dtype)


def _tpamiBackbone(params: Params, x: jnp.ndarray, extraPooling: bool) -> jnp.ndarray:
    """5 stride-2 Conv+LeakyReLU(0.2)[+InstanceNorm] blocks (AiLUT.py:28-48)."""
    for i in range(5):
        p = f"backbone.{i}"
        x = leakyRelu(conv2d(params, p + ".0", x, stride=2, padding=1), 0.2)
        if i < 4:
            x = instanceNorm2d(params, p + ".2", x)
    if extraPooling:
        x = adaptiveAvgPool2d(x, 2)
    return x


def _res18Backbone(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ResNet-18 trunk (AiLUT.py:50-56); BN folded at eval time uses the
    running stats from the checkpoint."""

    def bn(key, v):
        f = v.astype(jnp.float32)
        mean = params[key + ".running_mean"].astype(jnp.float32)
        var = params[key + ".running_var"].astype(jnp.float32)
        w = params[key + ".weight"].astype(jnp.float32)
        b = params[key + ".bias"].astype(jnp.float32)
        return ((f - mean) * jax.lax.rsqrt(var + 1e-5) * w + b).astype(v.dtype)

    def block(p, v, stride):
        idn = v
        y = relu(bn(p + ".bn1", conv2d(params, p + ".conv1", v, stride=stride, padding=1)))
        y = bn(p + ".bn2", conv2d(params, p + ".conv2", y, padding=1))
        if (p + ".downsample.0.weight") in params:
            idn = bn(p + ".downsample.1", conv2d(params, p + ".downsample.0", v, stride=stride))
        return relu(y + idn)

    x = relu(bn("backbone.bn1", conv2d(params, "backbone.conv1", x, stride=2, padding=3)))
    x = maxPool2d(x, 3, 2, 1)
    for li, stride in zip(range(1, 5), (1, 2, 2, 2)):
        x = block(f"backbone.layer{li}.0", x, stride)
        x = block(f"backbone.layer{li}.1", x, 1)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)


def makeAiLUT(nRanks: int = 3, nVertices: int = 33, backbone: str = "tpami"):
    inputSize = (256, 256) if backbone == "tpami" else (224, 224)

    def apply(params: Params, imgs: jnp.ndarray) -> jnp.ndarray:
        b = imgs.shape[0]
        codes = resizeBilinear(imgs, inputSize[0], inputSize[1])
        # the backbone traces at precision 'highest' REGARDLESS of the
        # session default: AiLUT is fp32 by design (reference AiLUT.py:
        # 157) and the codes drive LUT GENERATION — default-precision
        # TPU convs truncate f32 operands to bf16, and a ~0.2% code
        # perturbation moves LUT slopes enough to cost ~2 dB through
        # the chain-4 gate (docs/PERF.md round-4 attribution).  The net
        # is 5 convs on a fixed 256px input; the cost is negligible.
        from moephoto_tpu.models.api import getPrecision, setPrecision

        prev = getPrecision()
        setPrecision("highest")
        try:
            if backbone == "tpami":
                feat = _tpamiBackbone(params, codes, extraPooling=True)
            else:
                feat = _res18Backbone(params, codes)
        finally:
            setPrecision(prev)
        feat = feat.astype(jnp.float32)
        # torch flattens NCHW as (C, H, W); permute before flattening
        codesVec = jnp.transpose(feat, (0, 3, 1, 2)).reshape(b, -1)
        weights = linear(params, "lut_generator.weights_generator", codesVec)
        luts = linear(params, "lut_generator.basis_luts_bank", weights)
        luts = luts.reshape(b, -1, nVertices, nVertices, nVertices)
        intervals = linear(params, "adaint.intervals_generator", codesVec)
        intervals = intervals.reshape(b, -1, nVertices - 1)
        intervals = jax.nn.softmax(intervals, axis=-1)
        vertices = jnp.pad(jnp.cumsum(intervals, axis=-1), ((0, 0), (0, 0), (1, 0)))
        # TPU production path: the Pallas hat-matmul kernel (no binning
        # matrix, no XLA gathers — ops/lutkernel.py); fp32/CPU parity
        # runs keep the exact XLA transform.  Row-sharded SPMD stage
        # traces keep the Pallas tier via the shard_map'd wrapper
        # (pointwise — no halo; ops/lutkernel.ailutTransformPallasSpmd).
        # Semantics note: the lanes-major kernel EXTRAPOLATES outside
        # the vertex range exactly like the CUDA reference (edge-row
        # clip-bound tables, ops/lutkernel.py) — this matters because
        # upstream stages (AOD dehaze) emit unclipped values; the
        # legacy pixel-major kernel still clamps.
        from moephoto_tpu.parallel.temporal import pallasSpmdMode, spmdTracing

        # AiLUT is fp32 by design (reference pins it — AiLUT.py:157), so
        # unlike the bf16 warp/DCN gates there is no dtype proxy for "on
        # the TPU": check the pinned default device too, else CPU-pinned
        # parity runs in a TPU-registered process would trace the Mosaic
        # kernel for a CPU device and fail to lower.
        pinned = jax.config.jax_default_device
        onCpu = jax.default_backend() == "cpu" or (
            pinned is not None and pinned.platform == "cpu"
        )
        if spmdTracing():
            pm = pallasSpmdMode()
            if pm and (not onCpu or pm == "interpret"):
                from moephoto_tpu.ops.lutkernel import ailutTransformPallasSpmd

                return ailutTransformPallasSpmd(
                    imgs, luts, vertices, interpret=pm == "interpret"
                )
        elif not onCpu:
            # lanes-major variant: dense (3, T) pixel DMAs instead of
            # (T, 3) blocks at 3/128 lane fill — 14.7 -> 10.4 ms @1080p
            # (round-4 chip A/B, ops/lutkernel.py _TLX note)
            from moephoto_tpu.ops.lutkernel import ailutTransformPallasT

            return ailutTransformPallasT(imgs, luts, vertices)
        return ailutTransform(imgs, luts, vertices)

    return apply


ailutTPAMI = makeAiLUT(3, 33, "tpami")
ailutRes18 = makeAiLUT(5, 33, "res18")
