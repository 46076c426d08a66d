"""Measure candidate gather formulations for the DCN/warp hot path.

Shapes model EDVR's dcn_pack.l1 batched over 7 neighbors @360p:
gather 7*8g*(384*640) bilinear corner samples of an 8-ch grouped image
(equivalently 7*(384*640) samples of 64 ch).  Each candidate computes
the same quantity; we time one corner gather and the full 36-position
set where the formulation allows fusing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from moephoto_tpu.config import enableCompilationCache

enableCompilationCache()

import jax
import jax.numpy as jnp
from jax import lax

B, H, W = 7, 384, 640
DG, CG = 8, 8
C = DG * CG
N = H * W


def timeIt(name, fn, iters=4):
    red = timeIt.red
    float(red(fn()))
    float(red(fn()))
    t0 = time.perf_counter()
    vals = [red(fn()) for _ in range(iters)]
    _ = sum(float(v) for v in vals)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


timeIt.red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
    # smooth bounded offsets, per group
    off = jnp.asarray((rng.rand(B, H, W, DG, 2) * 6 - 3).astype(np.float32))
    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None, None]
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :, None]
    y0 = jnp.clip(ys + jnp.floor(off[..., 0]).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(xs + jnp.floor(off[..., 1]).astype(jnp.int32), 0, W - 1)
    flatG = y0 * W + x0  # (B, H, W, DG)

    # 1. row-form take_along_axis on grouped image (current deform.py)
    imgG = img.reshape(B, H, W, DG, CG).transpose(0, 3, 1, 2, 4).reshape(B * DG, N, CG)
    idxG = flatG.transpose(0, 3, 1, 2).reshape(B * DG, N, 1)

    @jax.jit
    def rowForm(t, i):
        return jnp.take_along_axis(t, i, axis=1)

    timeIt("1 corner row-form TAA (B*dg,N,cg)", lambda: rowForm(imgG, idxG))

    # 2. channel-major table t[:, idx]
    tableT = jnp.transpose(imgG.reshape(B * DG * N, CG))  # (CG, B*DG*N)
    bOff = (jnp.arange(B * DG, dtype=jnp.int32) * N).reshape(B * DG, 1)
    flatAbs = (idxG[..., 0] + bOff).reshape(-1)

    @jax.jit
    def chanMajor(t, i):
        return t[:, i]

    timeIt("1 corner channel-major (cg, B*dg*N)", lambda: chanMajor(tableT, flatAbs))

    # 3. whole-row take: table (B*N, 64) rows, but per-group indices
    #    differ -> only valid if offsets shared across groups; measure the
    #    shape anyway (cost model for a group-collapsed design)
    tableR = img.reshape(B * N, C)
    flat1 = (flatG[..., 0] + jnp.arange(B, dtype=jnp.int32)[:, None, None] * N).reshape(-1)

    @jax.jit
    def rowTake(t, i):
        return jnp.take(t, i, axis=0)

    timeIt("1 corner row-take (B*N, 64) full rows", lambda: rowTake(tableR, flat1))

    # 3b. same but gathering 4 corners x 9 positions in ONE call
    idx36 = jnp.concatenate([flat1] * 36)
    timeIt("36 gathers fused row-take (B*N,64)", lambda: rowTake(tableR, idx36))

    # 4. roll/select: 25-term (M=2) shifted accumulate, all 4 corners
    #    folded into bilinear weights, per-group weights broadcast
    offC = jnp.clip(off, -2.0, 2.0)

    @jax.jit
    def rollSelect(im, o):
        acc = jnp.zeros(im.shape, jnp.float32)
        oy = o[..., 0]
        ox = o[..., 1]
        for dy in range(-2, 3):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - dy))  # (B,H,W,DG)
            if not np.any(np.arange(1)):
                pass
            ry = jnp.roll(im, -dy, axis=1)
            for dx in range(-2, 3):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(ox - dx))
                w = (wy * wx)  # (B,H,W,DG)
                w64 = jnp.repeat(w, CG, axis=-1)
                acc = acc + w64 * jnp.roll(ry, -dx, axis=2).astype(jnp.float32)
        return acc

    timeIt("roll/select M=2 (25 terms, =4corner full)", lambda: rollSelect(img, offC))

    # 5. one-hot matmul over a 64-wide window: patches via 64 rolls then
    #    per-pixel mult-reduce is same as (4); skip.

    # 6. XLA gather of (8,128)-aligned rows: table (B*N, 128) padded
    tableP = jnp.pad(tableR, ((0, 0), (0, 64)))
    timeIt("1 corner row-take (B*N, 128) padded", lambda: rowTake(tableP, flat1))


if __name__ == "__main__":
    main()
