"""Shared building blocks (reference ``python/models.py`` assorted).

All functions follow the flat-param convention of ``models/api.py``:
``prefix`` addresses the torch submodule, e.g. ``FRM`` under torch key
``se`` reads ``se.conv_du.0.weight`` etc.
"""

from __future__ import annotations

import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    globalAvgPool,
    leakyRelu,
    prelu,
    relu,
    scaleLayer,
    sigmoid,
)


def frm(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Feature recalibration (SE) module (reference models.py:270-287):
    gap -> 1x1 conv -> relu -> 1x1 conv -> sigmoid -> channel scale."""
    y = globalAvgPool(x)
    y = conv2d(params, prefix + ".conv_du.0", y)
    y = relu(y)
    y = conv2d(params, prefix + ".conv_du.2", y)
    return x * sigmoid(y)


def arsb(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """Automatic residual scaling block (reference models.py:76-80).

    Torch keys: ``{prefix}.0.conv_1/relu/conv_2/scale`` (the Residual
    wrapper registers its single sequential as module '0')."""
    p = prefix + ".0"
    y = conv2d(params, p + ".conv_1", x, padding=1)
    y = prelu(params, p + ".relu", y)
    y = conv2d(params, p + ".conv_2", y, padding=1)
    y = scaleLayer(params, p + ".scale", y)
    return x + y


def carbf(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """One CARB half: Residual(conv1 -> PReLU -> conv2 -> FRM)
    (reference models.py:289-290)."""
    p = prefix + ".0"
    y = conv2d(params, p + ".conv1", x, padding=1)
    y = prelu(params, p + ".relu", y)
    y = conv2d(params, p + ".conv2", y, padding=1)
    y = frm(params, p + ".ca", y)
    return x + y


def carb(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """CARB = two stacked CARBF blocks (reference models.py:291)."""
    x = carbf(params, prefix + ".0", x)
    return carbf(params, prefix + ".1", x)


def upsampleBlock(params: Params, prefix: str, x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """conv3x3 -> PixelShuffle(r) -> PReLU (reference models.py:29-33)."""
    from moephoto_tpu.models.api import pixelShuffle

    y = conv2d(params, prefix + ".0", x, padding=1)
    y = pixelShuffle(y, r)
    return prelu(params, prefix + ".2", y)


def upsampleBlockV1(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv -> PixelShuffle(2) -> PReLU (MoeNet_lite2.py:5-6)."""
    from moephoto_tpu.models.api import pixelShuffle

    y = conv2d(params, prefix + ".0", x)
    y = pixelShuffle(y, 2)
    return prelu(params, prefix + ".2", y)


def residualBlockNoBN(params: Params, prefix: str, x: jnp.ndarray) -> jnp.ndarray:
    """conv-relu-conv residual (reference models.py:439-458)."""
    y = conv2d(params, prefix + ".conv1", x, padding=1)
    y = relu(y)
    y = conv2d(params, prefix + ".conv2", y, padding=1)
    return x + y


def residualBlocksWithInputConv(
    params: Params, prefix: str, x: jnp.ndarray, numBlocks: int
) -> jnp.ndarray:
    """conv 3x3 -> lrelu(0.1) -> N ResidualBlockNoBN (models.py:618-622)."""
    x = conv2d(params, prefix + ".0", x, padding=1)
    x = leakyRelu(x, 0.1)
    for i in range(numBlocks):
        x = residualBlockNoBN(params, f"{prefix}.2.{i}", x)
    return x
