"""Modulated deformable convolution (DCNv2) for PCD alignment.

TPU-native replacement for ``torchvision.ops.deform_conv2d`` as used by
the reference's ``ModulatedDeformConvPack`` (``models.py:553-616``):
per kernel position, offsets shift the sampling grid per deformable
group; samples are bilinearly gathered, modulated by a sigmoid mask and
contracted with the kernel via 1x1 matmuls (9 gathers + 9 MXU matmuls
for a 3x3 kernel — gathers ride the same ``take_along_axis`` lowering
as ``ops/warp.py``).

Offset layout follows torchvision: channel ``g*2*K + 2*k`` is the y
offset and ``+1`` the x offset for group ``g``, kernel position ``k``.
"""

from __future__ import annotations

import jax.numpy as jnp

from moephoto_tpu.models.api import Params, conv2d, sigmoid


def deformConv2d(
    x: jnp.ndarray,  # (B, H, W, Cin)
    offset: jnp.ndarray,  # (B, H, W, 2*dg*K)
    mask: jnp.ndarray,  # (B, H, W, dg*K) already sigmoid-ed
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout) HWIO
    bias,  # (Cout,) or None
    deformableGroups: int,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    dg = deformableGroups
    cg = Cin // dg

    off = offset.reshape(B, H, W, dg, K, 2).astype(jnp.float32)
    m = mask.reshape(B, H, W, dg, K).astype(jnp.float32)

    # grouped image: (B*dg, H, W, cg)
    imgG = x.reshape(B, H, W, dg, cg).transpose(0, 3, 1, 2, 4).reshape(B * dg, H, W, cg)
    flatImg = imgG.reshape(B * dg, H * W, cg)

    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]

    out = jnp.zeros((B, H, W, Cout), jnp.float32)
    for k in range(K):
        ky, kx = divmod(k, kw)
        py = ys + (ky * dilation - padding) + off[..., k, 0]  # (B, H, W, dg)
        px = xs + (kx * dilation - padding) + off[..., k, 1]
        py = py.transpose(0, 3, 1, 2).reshape(B * dg, H, W)
        px = px.transpose(0, 3, 1, 2).reshape(B * dg, H, W)

        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        wy = py - y0
        wx = px - x0
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)

        def gather(yi, xi):
            valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            xc = jnp.clip(xi, 0, W - 1)
            idx = (yc * W + xc).reshape(B * dg, H * W, 1)
            got = jnp.take_along_axis(flatImg, idx, axis=1).reshape(B * dg, H, W, cg)
            return got * valid[..., None].astype(got.dtype)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x0i + 1)
        v10 = gather(y0i + 1, x0i)
        v11 = gather(y0i + 1, x0i + 1)
        wyc = wy[..., None].astype(x.dtype)
        wxc = wx[..., None].astype(x.dtype)
        samp = (
            v00 * (1 - wyc) * (1 - wxc)
            + v01 * (1 - wyc) * wxc
            + v10 * wyc * (1 - wxc)
            + v11 * wyc * wxc
        )  # (B*dg, H, W, cg)
        samp = samp.reshape(B, dg, H, W, cg).transpose(0, 2, 3, 1, 4).reshape(B, H, W, Cin)
        mk = m[..., k]  # (B, H, W, dg)
        samp = samp * jnp.repeat(mk, cg, axis=-1).astype(samp.dtype)
        out = out + jnp.dot(
            samp, weight[ky, kx].astype(samp.dtype), preferred_element_type=jnp.float32
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def modulatedDeformConvPack(
    params: Params, key: str, x: jnp.ndarray, feat: jnp.ndarray,
    deformableGroups: int = 8,
) -> jnp.ndarray:
    """ModulatedDeformConvPack.forward (models.py:610-616): offsets and
    mask predicted from ``feat`` by ``conv_offset``, chunked into
    (o1, o2, mask) thirds and concatenated torchvision-style."""
    out = conv2d(params, key + ".conv_offset", feat, padding=1)
    C = out.shape[-1] // 3
    o1, o2, m = out[..., :C], out[..., C : 2 * C], out[..., 2 * C :]
    offset = jnp.concatenate([o1, o2], axis=-1)
    mask = sigmoid(m)
    return deformConv2d(
        x,
        offset,
        mask,
        params[key + ".weight"],
        params.get(key + ".bias"),
        deformableGroups,
    )
