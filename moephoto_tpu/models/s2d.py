"""Space-to-depth execution domain for small-channel conv trunks.

The v5e MXU lane-pads both conv contraction and output channels to 128:
a 48-ch 3x3 conv runs at ~17 TF/s vs ~78 TF/s at 192 ch (measured,
tools/microbench_conv.py).  Running a stride-1 trunk in the
space-to-depth domain — (H, W, C) -> (H/2, W/2, 4C) — quadruples the
issued FLOPs through a zero-structured dense kernel but more than wins
it back in lane-block efficiency: per original pixel the 48-ch trunk
conv drops 38.6 -> 33.5 ms, and composed with pack=2 plane packing
(96 -> 384 ch) 44.8 -> 30.2 ms (1.48x).

Math: an output pixel (2i+a, 2j+b) of a stride-1 3x3 conv reads input
rows 2i+a-1 .. 2i+a+1, all of which live in s2d rows i-1 .. i+1.  So
the conv is EXACTLY a 3x3 conv on the s2d domain whose (4cin, 4cout)
kernel has one original tap per valid (subpos_in, subpos_out, dy, dx)
combination and zeros elsewhere (25% density).  Zero padding of one
s2d ring reproduces 'SAME' padding of the original (the taps that
would touch original rows -2/H+1 are structurally zero).

Channel packing is subpos-major: s2d channel = (sa*2 + sb)*C + c.
No reference analog — this is a TPU-specific weight/layout transform;
the transformed model is bit-compatible with the reference graph up to
f32 summation order (parity tests in tests/test_s2d.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from moephoto_tpu.models.api import Params


def spaceToDepth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), subpos-major channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depthToSpace2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`spaceToDepth2`."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, 2 * h, 2 * w, c)


def s2dConv3x3Weight(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) stride-1 SAME conv -> (3, 3, 4cin, 4cout)."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    w2 = jnp.zeros((3, 3, 4, cin, 4, cout), w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                ty = a + dy
                sa, ry = ty % 2, (ty - ty % 2) // 2 + 1
                for dx in (-1, 0, 1):
                    tx = b + dx
                    sb, rx = tx % 2, (tx - tx % 2) // 2 + 1
                    w2 = w2.at[ry, rx, sa * 2 + sb, :, a * 2 + b, :].set(
                        w[dy + 1, dx + 1]
                    )
    return w2.reshape(3, 3, 4 * cin, 4 * cout)


def s2dConv1x1Weight(w: jnp.ndarray) -> jnp.ndarray:
    """(1, 1, cin, cout) -> (1, 1, 4cin, 4cout) block-diagonal."""
    _, _, cin, cout = w.shape
    w2 = jnp.zeros((1, 1, 4, cin, 4, cout), w.dtype)
    for sp in range(4):
        w2 = w2.at[0, 0, sp, :, sp, :].set(w[0, 0])
    return w2.reshape(1, 1, 4 * cin, 4 * cout)


def s2dTileVec(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel vector (bias / PReLU slope) -> subpos-major 4C.
    Scalar (shape-(1,)) PReLU slopes broadcast unchanged, mirroring
    packBlockDiag's rule."""
    return jnp.tile(v, 4) if v.shape[0] > 1 else v


def s2dTransform(params: Params, conv3x3: list, conv1x1: list = (),
                 vecs: list = ()) -> Params:
    """Return a params dict with the listed keys transformed for s2d
    execution (eager, done once at load — keeps the jit graph free of
    the 36-tap scatter construction).  Keys not listed pass through."""
    out = dict(params)
    for k in conv3x3:
        out[k + ".weight"] = s2dConv3x3Weight(params[k + ".weight"])
        b = params.get(k + ".bias")
        if b is not None:
            out[k + ".bias"] = s2dTileVec(b)
    for k in conv1x1:
        out[k + ".weight"] = s2dConv1x1Weight(params[k + ".weight"])
        b = params.get(k + ".bias")
        if b is not None:
            out[k + ".bias"] = s2dTileVec(b)
    for k in vecs:
        out[k] = s2dTileVec(params[k])
    return out
