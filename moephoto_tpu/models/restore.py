"""RGB restoration models: AODnet (dehaze), RRDBNet (Real-ESRGAN),
RealBasicVSR ImageCleaning.

Reference: ``python/models.py:82-106`` (AODnet), ``:460-551`` (RRDB
family), ``:618-630`` (ImageCleaning).
"""

from __future__ import annotations

import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    interpolateScale,
    leakyRelu,
    pixelUnshuffle,
    relu,
)
from moephoto_tpu.models.blocks import residualBlocksWithInputConv


def aodNet(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Tiny dehaze net with K-estimation output (models.py:82-106)."""
    x1 = relu(conv2d(params, "conv1", x))
    x2 = relu(conv2d(params, "conv2", x1, padding=1))
    x3 = relu(conv2d(params, "conv3", jnp.concatenate([x1, x2], -1), padding=2))
    x4 = relu(conv2d(params, "conv4", jnp.concatenate([x2, x3], -1), padding=3))
    k = relu(conv2d(params, "conv5", jnp.concatenate([x1, x2, x3, x4], -1), padding=1))
    return relu(k * x - k + 1.0)


def _rdb(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """Residual dense block (models.py:460-485): 5 convs, dense concat."""
    a = [x]
    t = x
    for i in range(5):
        t = conv2d(params, f"{p}.conv.{i}", jnp.concatenate(a, -1) if i else x, padding=1)
        if i < 4:
            t = leakyRelu(t)
        a.append(t)
    return a[-1] * 0.2 + x


def _rrdb(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    out = _rdb(params, p + ".rdb1", x)
    out = _rdb(params, p + ".rdb2", out)
    out = _rdb(params, p + ".rdb3", out)
    return out * 0.2 + x


def makeRRDBNet(scale: int = 4, numBlock: int = 23):
    """RRDBNet with pixel-unshuffle input trick for scale<4
    (models.py:509-551)."""
    unshuffleR = 4 // scale

    def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
        feat = pixelUnshuffle(x, unshuffleR)
        feat = conv2d(params, "conv_first", feat, padding=1)
        body = feat
        for i in range(numBlock):
            body = _rrdb(params, f"body.{i}", body)
        body = conv2d(params, "conv_body", body, padding=1)
        feat = feat + body
        feat = leakyRelu(
            conv2d(params, "conv_up1", interpolateScale(feat, 2, "nearest"), padding=1)
        )
        feat = leakyRelu(
            conv2d(params, "conv_up2", interpolateScale(feat, 2, "nearest"), padding=1)
        )
        out = conv2d(params, "conv_hr", feat, padding=1)
        return conv2d(params, "conv_last", leakyRelu(out), padding=1)

    return apply


rrdbNetX4 = makeRRDBNet(4, 23)
rrdbNetX2 = makeRRDBNet(2, 23)
rrdbNetX4Anime = makeRRDBNet(4, 6)


def imageCleaning(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """RealBasicVSR image-cleaning prefilter (models.py:623-630)."""
    y = residualBlocksWithInputConv(params, "0", x, 20)
    return conv2d(params, "1", y, padding=1) + x
