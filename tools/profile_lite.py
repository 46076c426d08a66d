#!/usr/bin/env python3
"""Phase profile of the headline bench (lite2 x4, 1080p): full pipeline
vs model-only chunks vs tiling/canvas overhead, using pipelined
dispatches synced through a jitted scalar reduce (CLAUDE.md: tunnel
block_until_ready returns early)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moephoto_tpu.config import enableCompilationCache

enableCompilationCache()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _lite2Params
from moephoto_tpu.engine.executor import ModelExec
from moephoto_tpu.engine.tiling import TileSpec, tiledApply
from moephoto_tpu.models import sr as S
from moephoto_tpu.models.api import conv2d, prelu
from moephoto_tpu.models.sr import moeNetLite2x4

REPS = 10
red = jax.jit(lambda v: jnp.mean(v))


def timeIt(name, fn, *args):
    float(red(fn(*args)))  # compile
    float(red(fn(*args)))  # warm
    t0 = time.perf_counter()
    vals = [red(fn(*args)) for _ in range(REPS)]
    _ = sum(float(v) for v in vals)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:44s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    params = _lite2Params(4)
    spec = TileSpec(tile=256, pad=5, align=8, scale=4.0, batch=8)
    ex = ModelExec(moeNetLite2x4, params, spec, channelSplit=True, name="lite4")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1080, 1920, 3).astype(np.float32))
    dt16 = jnp.bfloat16
    p = ex.params

    full = timeIt("full tiled pipeline (1080p x4)", ex, x)

    planes = jnp.asarray(rng.rand(24, 256, 256, 1).astype(np.float32)).astype(dt16)
    mdl = jax.jit(lambda t: moeNetLite2x4(p, t))
    chunk = timeIt("model chunk (24x256^2 planes)", mdl, planes)
    print(f"{'  => x5 chunks':44s} {5 * chunk:8.1f} ms")

    def trunk(t):
        out = prelu(p, "relu", conv2d(p, "conv_input", t))
        conv1 = conv2d(p, "conv_input2", out)
        f = S._lb(p, "convt_F11", conv1)
        f = S._lb(p, "convt_F12", f)
        return S._lb(p, "convt_F13", f) + out

    tchunk = timeIt("  trunk only", jax.jit(trunk), planes)

    print(f"{'  up+heads+interleave (chunk-trunk)':44s} {chunk - tchunk:8.1f} ms")

    def fakeModel(t):  # ~free x4 model: broadcast each pixel to 4x4
        return jnp.repeat(jnp.repeat(t, 4, axis=1), 4, axis=2)

    tiler = jax.jit(lambda v: tiledApply(v.astype(dt16), fakeModel, spec, 3))
    timeIt("tiler w/ repeat model (slice+canvas+blend)", tiler, x)

    # input conversion + executor wrapper overhead
    noTile = jax.jit(lambda t: mdl(t))
    timeIt("model chunk again (dispatch sanity)", noTile, planes)


if __name__ == "__main__":
    main()
