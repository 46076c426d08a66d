"""Stage-level profile of IconVSR @360p on the real chip.

Times each module-level stage jit with pipelined dispatches (CLAUDE.md
timing rules: sync via a jitted scalar mean; amortize the ~31 ms
per-dispatch tunnel latency over several queued iterations).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import numpy as np

from moephoto_tpu.config import enableCompilationCache

enableCompilationCache()

import jax
import jax.numpy as jnp

from moephoto_tpu.models import iconvsr as JV

H, W = 384, 640  # 360p alignPad(64)


def params():
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    from moephoto_tpu.config import referenceRoot

    cwd = os.getcwd()
    os.chdir(referenceRoot() or ".")
    try:
        import videoSR as RV
    finally:
        os.chdir(cwd)
    from bench import _refVideoParams

    mods = dict(
        edvr=RV.EDVRFeatureExtractor(7, 64),
        spynet=RV.SpyNet(),
        backward_trunk=RV.ConvResidualBlocks(64 + 3, 64, 30),
        forward_trunk=RV.ConvResidualBlocks(2 * 64 + 3, 64, 30),
        upsample=RV.Upsample(),
        backward_fusion=RV.newFusion(),
        forward_fusion=RV.newFusion(),
    )
    with torch.no_grad():  # see bench.py: undamped random init -> NaN;
        for m in mods.values():  # DCN weights are UNINITIALIZED memory
            for prm in m.parameters():
                if not torch.isfinite(prm).all() or prm.abs().max() > 1e3:
                    prm.normal_(0, 0.05)
                prm.mul_(float(os.environ.get("DAMP", "0.2")))
    return _refVideoParams([(k, m) for k, m in mods.items()], convT=None)


def timeIt(name, fn, iters=4):
    red = timeIt.red
    float(red(fn()))  # compile
    float(red(fn()))
    t0 = time.perf_counter()
    vals = [red(fn()) for _ in range(iters)]
    _ = sum(float(v) for v in vals)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


timeIt.red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))


def main():
    p = params()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    pair4 = jnp.asarray(rng.rand(4, 2, H, W, 3).astype(np.float32), dt)
    clip = jnp.asarray(rng.rand(1, 7, H, W, 3).astype(np.float32), dt)
    feat64 = jnp.asarray(rng.rand(1, H, W, 64).astype(np.float32), dt)

    timeIt("spynet batch4", lambda: JV.spyJit(p, pair4))
    timeIt("edvr clip7 (keyframe)", lambda: JV.edvrJit(p, clip))

    # scanned recurrences over a full backward chunk / forward chunk
    TB, TF = JV.BackwardChunk, JV.ForwardChunk
    inpB = jnp.asarray(rng.rand(TB, H, W, 3).astype(np.float32), dt)
    flowB = jnp.asarray((rng.rand(TB, H, W, 2) * 2 - 1).astype(np.float32))
    kfStack = jnp.asarray(rng.rand(4, H, W, 64).astype(np.float32), dt)
    kfIdx = jnp.asarray((np.arange(TB) % 4).astype(np.int32))
    kfM = jnp.asarray(np.arange(TB) % 7 == 0)
    ones = jnp.asarray(np.ones(TB, bool))
    timeIt(
        f"backward scan chunk{TB}",
        lambda: JV.bScanJit(p, inpB, flowB, kfStack, kfIdx, kfM, ones, ones),
        iters=2,
    )
    inpF = inpB[:TF]
    bwdF = jnp.asarray(rng.rand(TF, H, W, 64).astype(np.float32), dt)
    timeIt(
        f"forward scan chunk{TF}",
        lambda: JV.fScanJit(
            p, feat64, inpF, bwdF, flowB[:TF], kfStack, kfIdx[:TF],
            ones[:TF], kfM[:TF], ones[:TF],
        )[0],
        iters=2,
    )
    up4i = jnp.asarray(rng.rand(4, H, W, 3).astype(np.float32), dt)
    up4f = jnp.asarray(rng.rand(4, H, W, 64).astype(np.float32), dt)
    timeIt("upsample batch4", lambda: JV.upJit(p, up4i, up4f))

    # DCN at L1 resolution: dense (bounded) vs gather path
    from moephoto_tpu.ops.deform import deformConv2d

    feat7 = jnp.asarray(rng.rand(7, H, W, 64).astype(np.float32), dt)
    offB = jnp.asarray((rng.rand(7, H, W, 144) * 4 - 2).astype(np.float32), dt)
    mskB = jnp.asarray(rng.rand(7, H, W, 72).astype(np.float32), dt)
    wDcn = p["edvr.pcd_align.dcn_pack.l1.weight"]
    bDcn = p.get("edvr.pcd_align.dcn_pack.l1.bias")
    dJit = jax.jit(lambda x, o, m: deformConv2d(x, o, m, wDcn, bDcn, 8, margin=3))
    gJit = jax.jit(lambda x, o, m: deformConv2d(x, o, m, wDcn, bDcn, 8, margin=0))
    timeIt("dcn.l1 B=7 dense margin3", lambda: dJit(feat7, offB, mskB))
    timeIt("dcn.l1 B=7 gather", lambda: gJit(feat7, offB, mskB), iters=2)


if __name__ == "__main__":
    main()
