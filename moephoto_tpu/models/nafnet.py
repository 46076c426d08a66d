"""NAFNet denoise/deblur U-Net (reference ``python/NAFNet.py``).

The reference builds the U-Net by nesting ``UNetLayer`` modules whose
``bottom`` is a closure over the next-inner layer while all layers sit
flat in ``self.layers`` — so the torch keys are ``layers.{i}.*`` with
``layers[0]`` outermost and ``layers[L]`` the middle block stack.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    globalAvgPool,
    layerNorm2d,
    pixelShuffle,
)


def _nafBlock(params: Params, p: str, x: jnp.ndarray, dwExpand: int = 2) -> jnp.ndarray:
    """NAFBlock (NAFNet.py:11-60): LN -> 1x1 -> dw3x3 -> SimpleGate ->
    SCA -> 1x1, then LN -> 1x1 -> SimpleGate -> 1x1, residual beta/gamma."""
    c = x.shape[-1]
    dw = c * dwExpand
    y = layerNorm2d(params, p + ".norm1", x)
    y = conv2d(params, p + ".conv1", y)
    y = conv2d(params, p + ".conv2", y, padding=1, groups=dw)
    y1, y2 = jnp.split(y, 2, axis=-1)
    y = y1 * y2  # SimpleGate
    sca = conv2d(params, p + ".sca.1", globalAvgPool(y))
    y = y * sca
    y = conv2d(params, p + ".conv3", y)
    beta = params[p + ".beta"].reshape(1, 1, 1, -1).astype(x.dtype)
    gamma = params[p + ".gamma"].reshape(1, 1, 1, -1).astype(x.dtype)
    z = x + y * beta
    y = conv2d(params, p + ".conv4", layerNorm2d(params, p + ".norm2", z))
    y1, y2 = jnp.split(y, 2, axis=-1)
    y = conv2d(params, p + ".conv5", y1 * y2)
    return z + y * gamma


def makeNAFNet(
    width: int = 16,
    middleBlkNum: int = 1,
    encBlkNums: Sequence[int] = (),
    decBlkNums: Sequence[int] = (),
):
    encBlkNums = list(encBlkNums)
    decBlkNums = list(decBlkNums)
    L = len(encBlkNums)
    # layers[i] (i < L) is the UNetLayer at channel width << i; the
    # encoder block count at depth i comes from encBlkNums[i].
    encCounts = encBlkNums
    decCounts = decBlkNums[::-1]  # dec list pairs with reversed enc in ref

    def unet(params: Params, i: int, x: jnp.ndarray) -> jnp.ndarray:
        if i == L:
            for b in range(middleBlkNum):
                x = _nafBlock(params, f"layers.{L}.{b}", x)
            return x
        p = f"layers.{i}"
        x1 = x
        for b in range(encCounts[i]):
            x1 = _nafBlock(params, f"{p}.encoder.{b}", x1)
        down = conv2d(params, p + ".down", x1, stride=2)
        mid = unet(params, i + 1, down)
        up = conv2d(params, p + ".up.0", mid)
        up = pixelShuffle(up, 2)
        y = up + x1
        for b in range(decCounts[i]):
            y = _nafBlock(params, f"{p}.decoder.{b}", y)
        return y

    def apply(params: Params, inp: jnp.ndarray) -> jnp.ndarray:
        x = conv2d(params, "intro", inp, padding=1)
        x = unet(params, 0, x)
        x = conv2d(params, "ending", x, padding=1)
        return x + inp

    return apply


# Registry configurations (reference runDN.py:18-19, dehaze.py:24-26)
nafNetSIDD32 = makeNAFNet(32, 12, [2, 2, 4, 8], [2, 2, 2, 2])
nafNetSIDD64 = makeNAFNet(64, 12, [2, 2, 4, 8], [2, 2, 2, 2])
nafNetGoPro32 = makeNAFNet(32, 1, [1, 1, 1, 28], [1, 1, 1, 1])
nafNetGoPro64 = makeNAFNet(64, 1, [1, 1, 1, 28], [1, 1, 1, 1])
