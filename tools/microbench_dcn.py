"""Isolated DCN path timings @360p L1 shapes (B=7 neighbors, 64ch, dg=8).

Calls the dense / gather implementations DIRECTLY (no lax.cond) so each
branch compiles alone and is timed alone.
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

from moephoto_tpu.ops.deform import _deformConvDense, _deformConvGather

B, H, W = 7, 384, 640
DG, K, C = 8, 9, 64

red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))


def timeIt(name, fn, iters=3):
    float(red(fn()))
    float(red(fn()))
    t0 = time.perf_counter()
    vals = [red(fn()) for _ in range(iters)]
    _ = sum(float(v) for v in vals)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
    off = jnp.asarray((rng.rand(B, H, W, DG, K, 2) * 4 - 2).astype(np.float32))
    m = jnp.asarray(rng.rand(B, H, W, DG, K).astype(np.float32))
    wgt = jnp.asarray(rng.rand(3, 3, C, C).astype(np.float32) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.rand(C).astype(np.float32), jnp.bfloat16)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("pallas", "all"):
        from moephoto_tpu.ops.dcnkernel import dcnDensePallas

        offP = off.reshape(B, H, W, DG, K, 2)
        mP = m.reshape(B, H, W, DG, K)
        pj = jax.jit(
            lambda a, o, mm: dcnDensePallas(a, o, mm, wgt, bias, DG, margin=3)
        )
        timeIt("pallas dense margin3 B=7 L1", lambda: pj(x, offP, mP))
    if which in ("dense", "all"):
        for mg in (2, 3):
            dj = jax.jit(
                lambda a, o, mm, mg=mg: _deformConvDense(
                    a, o, mm, wgt, bias, DG, 1, 1, mg
                )
            )
            timeIt(f"dense margin{mg} B=7 L1", lambda: dj(x, off, m))
    if which in ("gather", "all"):
        gj = jax.jit(
            lambda a, o, mm: _deformConvGather(a, o, mm, wgt, bias, DG, 1, 1)
        )
        timeIt("gather B=7 L1", lambda: gj(x, off, m), iters=2)
    if which in ("gather1", "all"):
        gj = jax.jit(
            lambda a, o, mm: _deformConvGather(a, o, mm, wgt, bias, DG, 1, 1)
        )
        timeIt(
            "gather B=1 L1",
            lambda: gj(x[:1], off[:1], m[:1]),
            iters=2,
        )


if __name__ == "__main__":
    main()
