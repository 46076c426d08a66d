"""Bilinear warping (grid_sample) for optical-flow models.

TPU-native replacement for ``torch.nn.functional.grid_sample`` as used
by the reference backwarp modules (``videoSR.py:15-72``,
``IFRNet.py:19-35``): a gather-based bilinear sampler.  Gathers are
expressed as flat ``take`` so XLA lowers them to efficient dynamic
slices/gathers on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def gridSample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Torch-semantics bilinear grid_sample on NHWC.

    Args:
      img:  (B, H, W, C)
      grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], (x, y) order.
    """
    B, H, W, C = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    Ho, Wo = gx.shape[1], gx.shape[2]
    # channel-major gather (table (C, B*H*W), one flat index vector) runs
    # ~2x the row-form take_along_axis once B*C is large (batched feature
    # warps); for small B*C the two lower identically (docs/PERF.md)
    channelMajor = B * C >= 64
    if channelMajor:
        tableT = jnp.transpose(img.reshape(B * H * W, C))
        bOff = (jnp.arange(B, dtype=jnp.int32) * (H * W)).reshape(B, 1, 1)

    def sample(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        if channelMajor:
            got = tableT[:, (bOff + yc * W + xc).reshape(-1)]  # (C, B*Ho*Wo)
            got = jnp.transpose(got).reshape(B, Ho, Wo, C)
        else:
            flatIdx = yc * W + xc  # (B, Ho, Wo)
            flatImg = img.reshape(B, H * W, C)
            got = jnp.take_along_axis(
                flatImg, flatIdx.reshape(B, -1, 1), axis=1
            )  # (B, Ho*Wo, C)
            got = got.reshape(flatIdx.shape + (C,))
        if padding_mode == "zeros":
            valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            got = got * valid[..., None].astype(got.dtype)
        return got

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)

    wxc = wx[..., None].astype(img.dtype)
    wyc = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wxc) + v01 * wxc
    bot = v10 * (1 - wxc) + v11 * wxc
    return top * (1 - wyc) + bot * wyc


def backWarp(
    img: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Backwarp by a pixel-unit flow field (reference ``backWarp``
    videoSR.py:43-72: grid + flow normalized to [-1, 1], grid_sample
    with align_corners=True).

    Args:
      img:  (B, H, W, C)
      flow: (B, H, W, 2), (u, v) in pixels.
    """
    B, H, W, _ = img.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx = xs[None, None, :] + flow[..., 0].astype(jnp.float32)
    gy = ys[None, :, None] + flow[..., 1].astype(jnp.float32)
    nx = 2.0 * (gx / W - 0.5)
    ny = 2.0 * (gy / H - 0.5)
    grid = jnp.stack([nx, ny], axis=-1)
    return gridSample(img, grid, align_corners=True, padding_mode=padding_mode)
