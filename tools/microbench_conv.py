"""Area-normalized conv3x3 throughput across channel widths on the chip:
the space-to-depth decision data.  Each case processes the SAME original
pixel count; s2d variants trade 4x channel width for 1/4 area (and 4x
FLOPs through the zero-structured dense kernel).

Prints ms per (24, 256, 256, C-equivalent) stack of 10 chained convs and
the effective TF/s of the dense math actually issued.
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

DEPTH = 10
REPS = 4


def convChain(x, w):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    k = w.shape[0]
    pads = ((1, 1), (1, 1)) if k == 3 else ((0, k - 1), (0, k - 1))

    def body(i, v):
        return lax.conv_general_dilated(
            v, w, (1, 1), pads, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    return lax.fori_loop(0, DEPTH, body, x)


red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))


def run(name, b, h, w_, c, k=3):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w_, c).astype(np.float32), jnp.bfloat16)
    wt = jnp.asarray(rng.rand(k, k, c, c).astype(np.float32) * 0.02, jnp.bfloat16)
    f = jax.jit(convChain)
    float(red(f(x, wt)))
    float(red(f(x, wt)))
    t0 = time.perf_counter()
    vals = [red(f(x, wt)) for _ in range(REPS)]
    _ = sum(float(v) for v in vals)
    dt = (time.perf_counter() - t0) / REPS
    flops = 2 * b * h * w_ * k * k * c * c * DEPTH
    print(f"{name:34s} {dt*1e3:8.2f} ms   {flops/dt/1e12:6.1f} TF/s", flush=True)
    return dt


def main():
    # baseline 48-ch family tile stack (24 planes of 256^2)
    run("conv3x3  48ch 24x256^2", 24, 256, 256, 48)
    run("conv3x3  96ch 24x256^2 (pack2)", 24, 256, 256, 96)
    # s2d: same original pixels, 1/4 area, 4x channels.  NOTE the
    # s2d-of-96 comparison partner for case 2 is the 128^2 row — an
    # earlier 64^2 "s2d+pack2" row covered only 1/4 of case 2's pixels
    # and made s2d+pack look 1.48x faster when it is really ~1.7x
    # SLOWER (confirmed against the real netDN model; docs/PERF.md)
    run("conv3x3 192ch 24x128^2 (s2d)", 24, 128, 128, 192)
    run("conv3x3 384ch 24x128^2 (s2d of 96)", 24, 128, 128, 384)
    # reference points
    run("conv3x3 128ch 24x256^2", 24, 256, 256, 128)
    run("conv3x3 256ch 24x128^2", 24, 128, 128, 256)
    run("conv2x2 192ch 24x128^2", 24, 128, 128, 192, k=2)


if __name__ == "__main__":
    main()
