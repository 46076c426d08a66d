"""Benchmark: 4x SR (MoeNet_lite2 x4, real checkpoint) throughput on the
TPU chip via the tiled engine, vs the reference's torch path on this
host's CPU (no CUDA device exists here; the CUDA north star is tracked
by the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpx/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H, W = 1080, 1920
WARMUP = 2
ITERS = 10


def benchTPU():
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import packBlockDiag
    from moephoto_tpu.models.sr import moeNetLite2x4
    from __graft_entry__ import _lite2Params

    params = _lite2Params(4)
    spec = TileSpec(tile=256, pad=5, align=8, scale=4.0, batch=8)  # calibrated
    ex = ModelExec(moeNetLite2x4, params, spec, channelSplit=True, name="lite4")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    # NOTE: on the tunneled axon platform block_until_ready returns
    # early and full readback measures tunnel bandwidth, so execution is
    # forced through a jitted scalar reduction of the output.
    reduceJit = jax.jit(lambda v: jnp.mean(v))
    force = lambda: float(reduceJit(ex(x)))
    force()  # compile
    for _ in range(WARMUP):
        force()
    # pipeline the iterations and sync once: per-dispatch tunnel latency
    # (~31 ms) amortizes instead of adding to every frame
    t0 = time.perf_counter()
    vals = [reduceJit(ex(x)) for _ in range(ITERS)]
    _ = sum(float(v) for v in vals)
    dt = (time.perf_counter() - t0) / ITERS
    return (H * W / 1e6) / dt


def benchTorchCPU():
    """Reference torch path on CPU, timed on one tile and scaled."""
    try:
        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from refshim import importReference

        importReference()
        cwd = os.getcwd()
        os.chdir("/root/reference")
        try:
            from MoeNet_lite2 import Net
        finally:
            os.chdir(cwd)
        net = Net(upscale=4)
        path = "/root/reference/model/lite/model_4.pth"
        if os.path.exists(path):
            net.load_state_dict(torch.load(path, map_location="cpu", weights_only=False))
        net.eval()
        tile = 256
        x = torch.rand(3, 1, tile, tile)
        with torch.no_grad():
            net(x)
            t0 = time.perf_counter()
            n = 3
            for _ in range(n):
                net(x)
            dt = (time.perf_counter() - t0) / n
        return (tile * tile / 1e6) / dt
    except Exception:
        return None


def main():
    value = benchTPU()
    base = benchTorchCPU()
    vs = value / base if base else 0.0
    print(
        json.dumps(
            {
                "metric": "lite_4x_SR_throughput_1080p",
                "value": round(value, 3),
                "unit": "Mpx/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
