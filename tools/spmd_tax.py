"""8-chip projection measurements for the row-sharded IconVSR path
(VERDICT round-3 task 1c).  Single real chip; measurements:

  1. full-H fused chunk programs (the production Pallas tier) — the
     single-chip baseline the projection divides.  H=384 (the bench
     360p row rounds to sublane-aligned 384 here), W=640, T=20.
  2. per-shard compute: the same programs at H = 64, 128, 192 rows.
     SpyNet's 6-level pyramid needs H % 64 == 0, so H/8 = 48 of the
     384-row clip cannot trace as a standalone program; instead the
     measured points fit t(H) = a + b*H (they are conv stacks, linear
     in rows) and the fit extrapolates the 48-row shard.  8-chip time
     ~= per-shard time + halo collectives (estimated analytically in
     PERF.md from bytes-on-ICI; the kernels' halos are 4-8 rows).
  3. the same programs with spmdTracing forced ON while no multi-device
     mesh exists — this takes the XLA-tier fallbacks (dense DCN,
     XLA-gather warps), i.e. the tax round-3's SPMD path paid before
     the shard_map'd Pallas tiers landed (round 4).  Measured at H=192
     against a same-H Pallas run so the ratio is apples-to-apples
     (the dense-DCN program at 384 is too big for the remote compile
     helper).

All device arrays are passed as jit ARGUMENTS — closing over them bakes
them into the HLO as literals and a T=20 384x640 clip's worth of
constants (~150 MB with the keyframe stack) exceeds the remote compile
helper's request-body limit (HTTP 413).

Run: python tools/spmd_tax.py   (chip job — run alone, see CLAUDE.md)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from refshim import importReference

importReference()
import torch

from moephoto_tpu.models import iconvsr as JV
from moephoto_tpu.parallel import temporal as PT

torch.manual_seed(0)
cwd = os.getcwd()
os.chdir(bench._refRoot())
try:
    import videoSR as RV
finally:
    os.chdir(cwd)
mods = dict(
    edvr=RV.EDVRFeatureExtractor(7, 64),
    spynet=RV.SpyNet(),
    backward_trunk=RV.ConvResidualBlocks(64 + 3, 64, 30),
    forward_trunk=RV.ConvResidualBlocks(2 * 64 + 3, 64, 30),
    upsample=RV.Upsample(),
    backward_fusion=RV.newFusion(),
    forward_fusion=RV.newFusion(),
)
with torch.no_grad():
    for m in mods.values():
        for prm in m.parameters():
            if not torch.isfinite(prm).all() or prm.abs().max() > 1e3:
                prm.normal_(0, 0.05)
            prm.mul_(0.2)
params = bench._refVideoParams([(k, m) for k, m in mods.items()], convT=None)
params = {
    k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
    for k, v in params.items()
}

W = 640
T = 20
dt = jnp.bfloat16
rng = np.random.RandomState(0)


def mkArgs(H):
    r = lambda *s: jnp.asarray(rng.rand(*s).astype(np.float32)).astype(dt)
    inp = r(T, H, W, 3)
    pairs = r(T, 2, H, W, 3)
    clipsFlat = r(4 * JV.RefTime, H, W, 3)  # 4 keyframes x 7-frame clips
    kfStack = r(5, H, W, 64)
    kfIdx = jnp.asarray(
        np.array([1, 0, 0, 0, 0, 2, 0, 0, 0, 0, 3, 0, 0, 0, 0, 4, 0, 0, 0, 0], np.int32)
    )
    kfMask = jnp.asarray(kfIdx > 0)
    warpM = jnp.asarray(np.ones(T, bool))
    validM = jnp.asarray(np.ones(T, bool))
    featProp = r(1, H, W, 64)
    bwd = r(T, H, W, 64)
    flowM = jnp.asarray(np.r_[False, np.ones(T - 1, bool)])
    return dict(
        inp=inp, pairs=pairs, clipsFlat=clipsFlat, kfStack=kfStack,
        kfIdx=kfIdx, kfMask=kfMask, warpM=warpM, validM=validM,
        featProp=featProp, bwd=bwd, flowM=flowM,
    )


def timeLoop(name, fn, prm, a, n=2):
    """Time fn(params, args) via an in-program fori_loop repetition.

    params/args enter as jit ARGUMENTS (not closure constants) so the
    serialized HLO stays small enough for the remote compile helper.

    The loop body MUST depend on the carry: XLA hoists a loop-invariant
    body out of the fori_loop (LICM), so the naive repetition executes
    the workload ~once-or-twice regardless of n and the per-call
    division under-reports by up to n/2 (measured round 5,
    docs/PERF.md "in-program timing loops must be carry-dependent").
    We thread the accumulator into the "inp" leaf (consumed by BOTH
    fused programs — a leaf the timed fn ignores would be a dead
    dependency XLA hoists anyway) scaled by 1e-30 — numerically a
    no-op, structurally a serial dependency.
    """

    def run(prm, a):
        def body(i, acc):
            if isinstance(a, dict) and "inp" in a:
                a2 = dict(a)
                a2["inp"] = a["inp"] + (acc * 1e-30).astype(a["inp"].dtype)
            else:
                leaves, treedef = jax.tree_util.tree_flatten(a)
                out_leaves, bumped = [], False
                for l in leaves:
                    if not bumped and hasattr(l, "dtype") and jnp.issubdtype(
                            l.dtype, jnp.floating):
                        out_leaves.append(l + (acc * 1e-30).astype(l.dtype))
                        bumped = True
                    else:
                        out_leaves.append(l)
                a2 = jax.tree_util.tree_unflatten(treedef, out_leaves)
            out = fn(prm, a2)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run)
    t0 = time.time()
    float(f(prm, a))
    print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(f(prm, a))
        best = min(best, (time.time() - t0) / n * 1000)
    print(f"{name}: {best:.1f} ms/call", flush=True)
    return best


def runB(prm, a):
    # the production program: EDVR keyframe feats + SpyNet + backward
    # recurrence fused (2 dispatches/clip)
    return JV._backwardScanPairsEdvr(
        prm, a["inp"], a["pairs"], a["clipsFlat"], a["kfIdx"], a["kfMask"],
        a["warpM"], a["validM"]
    )


def runF(prm, a):
    return JV._forwardScanPairsUp(
        prm, a["featProp"], a["inp"], a["bwd"], a["pairs"], a["kfStack"],
        a["kfIdx"], a["flowM"], a["kfMask"], a["validM"]
    )


def measure(tag, H, forceSpmd=False, n=2):
    a = mkArgs(H)
    fb, ff = runB, runF
    if forceSpmd:
        def wrap(fn):
            def g(prm, aa):
                PT._spmdTracing[0] = True
                try:
                    return fn(prm, aa)
                finally:
                    PT._spmdTracing[0] = False
            return g
        fb, ff = wrap(runB), wrap(runF)
    b = timeLoop(f"backward_T20 {tag} H={H}", fb, params, a, n=n)
    f = timeLoop(f"forward_up_T20 {tag} H={H}", ff, params, a, n=n)
    print(f"{tag} H={H}: backward+forward = {b + f:.0f} ms / 20 frames", flush=True)
    return b, f


if __name__ == "__main__":
    full = measure("pallas", 384)
    # per-shard points (SpyNet pyramid needs H % 64 == 0; H/8 = 48 of
    # the 384-row clip is extrapolated from the linear row fit below)
    shardPts = {}
    for Hs in (192, 128, 64):
        shardPts[Hs] = measure("pallas-shard", Hs)
    # the XLA-tier tax ratio, apples-to-apples at H=192 (dense-DCN HLO at
    # 384 exceeds the compile helper's request limit)
    tax192 = measure("spmd-XLA-tier", 192, forceSpmd=True)

    print("\n== summary ==", flush=True)
    print(f"full 384:           {sum(full):.0f} ms", flush=True)
    for Hs, v in sorted(shardPts.items()):
        print(
            f"per-shard H={Hs:<4d}: {sum(v):.0f} ms  -> ideal-less-halo "
            f"speedup vs 384 {sum(full)/sum(v):.2f}x", flush=True)
    # least-squares t(H) = a + b*H over all four points
    hs = np.array([384] + sorted(shardPts), np.float64)
    ts = np.array(
        [sum(full)] + [sum(shardPts[h]) for h in sorted(shardPts)], np.float64
    )
    b, a = np.polyfit(hs, ts, 1)
    t48 = a + b * 48
    print(f"row fit: t(H) = {a:.0f} + {b:.2f}*H ms  (t(48) ~= {t48:.0f} ms)",
          flush=True)
    print(
        f"projected 8-chip compute speedup (no halo): "
        f"{sum(full)/t48:.2f}x", flush=True)
    pal192 = shardPts[192]
    print(
        f"XLA-tier tax @192:  {sum(tax192):.0f} ms vs pallas "
        f"{sum(pal192):.0f} ms ({sum(tax192)/sum(pal192):.2f}x)", flush=True)
