"""Time EDVR's internal stages @360p to locate the non-DCN cost."""

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

H, W = 384, 640
red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))


def timeIt(name, fn, iters=3):
    float(red(fn()))
    float(red(fn()))
    t0 = time.perf_counter()
    vals = [red(fn()) for _ in range(iters)]
    _ = sum(float(v) for v in vals)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)


def main():
    from profile_iconvsr import params

    p = params()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    n = 7
    l1 = jnp.asarray(rng.rand(n, H, W, 64).astype(np.float32), dt)
    l2 = jnp.asarray(rng.rand(n, H // 2, W // 2, 64).astype(np.float32), dt)
    l3 = jnp.asarray(rng.rand(n, H // 4, W // 4, 64).astype(np.float32), dt)

    pcdJit = jax.jit(
        lambda pp, a, b, c: JV._pcdAlign(
            pp, "edvr.pcd_align", [a, b, c], [a, b, c]
        )
    )
    timeIt("pcd batched B=7 (4 DCN + convs)", lambda: pcdJit(p, l1, l2, l3), iters=2)

    aligned = jnp.asarray(rng.rand(1, n, H, W, 64).astype(np.float32), dt)
    tsaJit = jax.jit(lambda pp, a: JV._tsaFusion(pp, "edvr.fusion", a, n // 2))
    timeIt("tsa fusion", lambda: tsaJit(p, aligned))

    from moephoto_tpu.models.api import resizeBilinear
    o128 = jnp.asarray(rng.rand(n, H // 2, W // 2, 128).astype(np.float32), dt)
    rsJit = jax.jit(lambda a: resizeBilinear(a, H, W))
    timeIt("resizeBilinear 128ch L2->L1 B=7", lambda: rsJit(o128))

    from moephoto_tpu.models.api import conv2d
    from moephoto_tpu.models.blocks import residualBlockNoBN

    def featx(pp, x):
        import jax as _jax
        y = _jax.nn.leaky_relu(conv2d(pp, "edvr.conv_first", x, padding=1), 0.1)
        for i in range(5):
            y = residualBlockNoBN(pp, f"edvr.feature_extraction.{i}", y)
        return y

    clip = jnp.asarray(rng.rand(n, H, W, 3).astype(np.float32), dt)
    fxJit = jax.jit(featx)
    timeIt("feature extraction B=7", lambda: fxJit(p, clip))


def packTests():
    """Isolate modulatedDeformConvPack and composition effects."""
    from profile_iconvsr import params
    from moephoto_tpu.ops.deform import modulatedDeformConvPack

    p = params()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    n = 7
    l1 = jnp.asarray(rng.rand(n, H, W, 64).astype(np.float32), dt)
    feat = jnp.asarray(rng.rand(n, H, W, 64).astype(np.float32), dt)

    mp = jax.jit(
        lambda pp, x, f: modulatedDeformConvPack(pp, "edvr.pcd_align.dcn_pack.l1", x, f)
    )
    timeIt("dcnPack l1 B=7 (cond dispatch)", lambda: mp(p, l1, feat), iters=2)

    def two(pp, x, f):
        a = modulatedDeformConvPack(pp, "edvr.pcd_align.dcn_pack.l1", x, f)
        return modulatedDeformConvPack(pp, "edvr.pcd_align.cas_dcnpack", a, f)

    twoJit = jax.jit(two)
    timeIt("two chained dcnPacks B=7", lambda: twoJit(p, l1, feat), iters=2)


def bisectPcd():
    """PCD with DCN stubbed out vs full: isolates the non-DCN cost."""
    from profile_iconvsr import params
    import moephoto_tpu.models.iconvsr as mod

    p = params()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    n = 7
    l1 = jnp.asarray(rng.rand(n, H, W, 64).astype(np.float32), dt)
    l2 = jnp.asarray(rng.rand(n, H // 2, W // 2, 64).astype(np.float32), dt)
    l3 = jnp.asarray(rng.rand(n, H // 4, W // 4, 64).astype(np.float32), dt)

    import moephoto_tpu.ops.deform as D

    orig = mod.modulatedDeformConvPack
    mod.modulatedDeformConvPack = lambda pp, key, x, feat, deformableGroups=8: x
    try:
        j = jax.jit(lambda pp, a, b, c: mod._pcdAlign(pp, "edvr.pcd_align", [a, b, c], [a, b, c]))
        timeIt("pcd NO dcn", lambda: j(p, l1, l2, l3), iters=2)
    finally:
        mod.modulatedDeformConvPack = orig

    # full pcd again for the same-session baseline
    j2 = jax.jit(lambda pp, a, b, c: mod._pcdAlign(pp, "edvr.pcd_align", [a, b, c], [a, b, c]))
    timeIt("pcd full", lambda: j2(p, l1, l2, l3), iters=2)

    # margin=0 (pure gather, no cond) for reference
    oldM = D.DCN_MARGIN
    D.DCN_MARGIN = 0

    def packM0(pp, key, x, feat, deformableGroups=8):
        return orig(pp, key, x, feat, deformableGroups)

    mod.modulatedDeformConvPack = packM0
    try:
        pass  # too slow to time the full gather PCD; skip
    finally:
        mod.modulatedDeformConvPack = orig
        D.DCN_MARGIN = oldM


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "pack":
        packTests()
    elif len(sys.argv) > 1 and sys.argv[1] == "bisect":
        bisectPcd()
    else:
        main()
