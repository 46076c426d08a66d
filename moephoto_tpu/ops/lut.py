"""Adaptive-interval 3D LUT transform.

TPU-native equivalent of the reference's only first-party CUDA kernel
(``site-packages/ailut/csrc/ailut_transform_cuda.cu:88-159``): per pixel,
binary-search each channel value in its sorted adaptive vertex list,
then trilinearly interpolate the 3D LUT at the resulting cell.

The XLA formulation vectorizes the binary search as a comparison count
over the 33-entry vertex table and the trilinear gather as 8 flat
``take`` ops — all fusible, no host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ailutTransform(
    img: jnp.ndarray, lut: jnp.ndarray, vertices: jnp.ndarray
) -> jnp.ndarray:
    """Apply an adaptive 3D LUT.

    Args:
      img:      (B, H, W, 3) input in [0, 1].
      lut:      (B, C, D, D, D) lookup table, last axis indexed by the
                red channel (CUDA kernel layout: ``id = rid + D*gid +
                D^2*bid``, i.e. lut[b, c, bid, gid, rid]).
      vertices: (B, 3, D) sorted sampling coordinates per channel.

    Returns:
      (B, H, W, C) transformed image.
    """
    eps = 1e-10
    B, H, W, _ = img.shape
    C = lut.shape[1]
    D = lut.shape[-1]

    f32 = jnp.float32
    imgf = img.astype(f32)
    vert = vertices.astype(f32)  # (B, 3, D)

    def perImage(im, vt, lt):
        # im: (H, W, 3); vt: (3, D); lt: (C, D, D, D)
        def channelBin(v, val):
            # lower_bound semantics (cuda kernel :34-53): first idx with
            # v[idx] >= val, minus one, clamped to [0, D-2].  Computed as
            # a vectorized comparison count — jnp.searchsorted lowers to
            # a serial binary search on TPU (~300x slower here).
            flat = val.reshape(-1)
            cnt = jnp.sum(
                (v[:, None] < flat[None, :]).astype(jnp.int32), axis=0
            ).reshape(val.shape)
            return jnp.clip(cnt - 1, 0, D - 2)

        r, g, b = im[..., 0], im[..., 1], im[..., 2]
        rid = channelBin(vt[0], r)
        gid = channelBin(vt[1], g)
        bid = channelBin(vt[2], b)

        r0, r1 = vt[0][rid], vt[0][rid + 1]
        g0, g1 = vt[1][gid], vt[1][gid + 1]
        b0, b1 = vt[2][bid], vt[2][bid + 1]
        rd = (r - r0) / (r1 - r0 + eps)
        gd = (g - g0) / (g1 - g0 + eps)
        bd = (b - b0) / (b1 - b0 + eps)

        flat = lt.reshape(C, D * D * D).astype(f32)
        base = rid + D * gid + D * D * bid  # (H, W)

        def corner(dr, dg, db):
            idx = base + dr + D * dg + D * D * db
            vals = flat[:, idx.reshape(-1)]  # (C, H*W)
            return vals.reshape(C, H, W)

        w000 = (1 - rd) * (1 - gd) * (1 - bd)
        w100 = rd * (1 - gd) * (1 - bd)
        w010 = (1 - rd) * gd * (1 - bd)
        w110 = rd * gd * (1 - bd)
        w001 = (1 - rd) * (1 - gd) * bd
        w101 = rd * (1 - gd) * bd
        w011 = (1 - rd) * gd * bd
        w111 = rd * gd * bd

        out = (
            w000 * corner(0, 0, 0)
            + w100 * corner(1, 0, 0)
            + w010 * corner(0, 1, 0)
            + w110 * corner(1, 1, 0)
            + w001 * corner(0, 0, 1)
            + w101 * corner(1, 0, 1)
            + w011 * corner(0, 1, 1)
            + w111 * corner(1, 1, 1)
        )  # (C, H, W)
        return jnp.transpose(out, (1, 2, 0))

    # batch via a static Python loop (B is 1 per retouch call): vmap of
    # fancy-index gathers lowers to a much slower batched-gather on TPU
    outs = [perImage(imgf[b], vert[b], lut[b]) for b in range(B)]
    out = jnp.stack(outs)
    return out.astype(img.dtype)
