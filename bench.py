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

# bench compares against reference checkpoints: the dev-only reference
# fallback is enabled by __graft_entry__'s guarded env setdefault (the
# single place that knows the dev mount path)
import __graft_entry__  # noqa: F401

from moephoto_tpu.config import enableCompilationCache, referenceRoot
from moephoto_tpu.pipeline.registry import modelPath

enableCompilationCache()


def _refRoot() -> str:
    ref = referenceRoot()
    if not ref:
        raise RuntimeError("reference checkout not configured "
                           "(MOEPHOTO_REFERENCE_ROOT / config.referenceRoot)")
    return ref


def _torchLoad(path):
    """State-dict load, safe mode first: some reference checkpoints use
    pickle protocol 4 which the weights_only unpickler rejects."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)

H, W = 1080, 1920
WARMUP = 2
ITERS = 10


def benchTPU():
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import packBlockDiag
    from moephoto_tpu.models.sr import moeNetLite2x4F
    from __graft_entry__ import _lite2Params

    params = packBlockDiag(_lite2Params(4), 2)  # 96-ch plane packing
    spec = TileSpec(tile=256, pad=5, align=8, scale=4.0, batch=10)  # calibrated
    ex = ModelExec(moeNetLite2x4F, params, spec, channelSplit=False, pack=2, name="lite4")
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
        os.chdir(_refRoot())
        try:
            from MoeNet_lite2 import Net
        finally:
            os.chdir(cwd)
        net = Net(upscale=4)
        path = modelPath("model/lite/model_4.pth")
        if os.path.exists(path):
            net.load_state_dict(_torchLoad(path))
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


def benchDetail():
    """Extra real-weight configs (BASELINE.md configs 1/2/4 analogs);
    written to BENCH_DETAIL.json, never printed to stdout."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.pipeline import registry

    red = jax.jit(lambda v: jnp.mean(v))
    rng = np.random.RandomState(0)

    def timeEx(ex, h, w, iters=5):
        x = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
        float(red(ex(x)))
        t0 = time.perf_counter()
        vals = [red(ex(x)) for _ in range(iters)]
        _ = sum(float(v) for v in vals)
        return round(h * w / 1e6 / ((time.perf_counter() - t0) / iters), 3)

    detail = {}
    cases = [
        ("SR_lite_x2_1080p", lambda: registry.getSR({"model": "lite", "scale": 2}), 1080, 1920),
        ("SR_a_x2_1080p", lambda: registry.getSR({"model": "a", "scale": 2}), 1080, 1920),
        ("DN_lite5_1080p", lambda: registry.getDN({"model": "lite5"}), 1080, 1920),
        ("dehaze_AOD_1080p", lambda: registry.getDehaze({"model": "dehaze"}), 1080, 1920),
        ("demoire_sun_1024", lambda: registry.getDehaze({"model": "sun"}), 1024, 1024),
    ]
    for name, build, h, w in cases:
        try:
            detail[name] = {"Mpx_per_s": timeEx(build(), h, w)}
        except Exception as e:
            detail[name] = {"error": str(e).splitlines()[0][:120]}
    # chained config 2 analog: DN lite5 -> SR lite x4, tiled 1080p
    try:
        dn = registry.getDN({"model": "lite5"})
        sr = registry.getSR({"model": "lite", "scale": 4})
        import jax.numpy as jnp2

        x = jnp2.asarray(rng.rand(1080, 1920, 3).astype(np.float32))
        chain = lambda v: sr(dn(v))
        float(red(chain(x)))
        t0 = time.perf_counter()
        vals = [red(chain(x)) for _ in range(3)]
        _ = sum(float(v) for v in vals)
        detail["chain_DNlite5_SRlite4_1080p"] = {
            "Mpx_per_s": round(1080 * 1920 / 1e6 / ((time.perf_counter() - t0) / 3), 3)
        }
    except Exception as e:
        detail["chain_DNlite5_SRlite4_1080p"] = {"error": str(e).splitlines()[0][:120]}
    for name, fn in (
        ("retouch_AiLUT_1080p", _benchAiLUT),
        ("DN_NAFNet32_1080p", _benchNAFNet),
        ("DN_SEDN_1080p", _benchSEDN),
        ("video_ESTRNN_720p", _benchESTRNN),
        ("video_IFRNet_slomo2x_720p", _benchIFRNet),
        ("video_IconVSR_4x_360p", _benchIconVSR),
        # steady-state length: the reference's full [20, 20, tail]
        # backward-chunk schedule (the 14-frame row keeps round-1/2
        # comparability; real clips amortize per-clip boundary work)
        ("video_IconVSR_4x_360p_45f", lambda: _benchIconVSR(n=45)),
        # BASELINE config 5: real-media end-to-end through the
        # production engine + OpenCV-backed codec shim (no ffmpeg binary
        # or egress here — see _benchRealClip docstring)
        ("video_e2e_realclip", _benchRealClip),
    ):
        try:
            r = fn()
            # video benches return median/spread rows; scalar benches a rate
            detail[name] = r if isinstance(r, dict) else {"Mpx_per_s": r}
        except Exception as e:
            detail[name] = {"error": str(e).splitlines()[0][:120]}
    detail["psnr_bf16_vs_torch_fp32_dB"] = psnrVsReference()
    detail["psnr_chains_dB"] = psnrChains()
    # on-chip Pallas kernel sanity: every kernel vs its interpret-mode
    # (XLA-exact) execution; a Mosaic miscompile fails the sweep loudly
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import chipparity

        parity = chipparity.runAll()
        chipparity.assertAll(parity)
        detail["kernel_parity_maxabs"] = {k: round(v, 5) for k, v in parity.items()}
    except Exception as e:
        detail["kernel_parity_maxabs"] = {"error": str(e).splitlines()[0][:160]}
    with open("BENCH_DETAIL.json", "w") as fp:
        json.dump(detail, fp, indent=2)
        fp.write("\n")


def _psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)


def psnrChains():
    """BASELINE configs 2-4 as CHAINED pipelines vs the torch chain
    (catches chained-step regressions the per-model tests can't).
    Real checkpoints for DN lite5 / SR lite4 / sun / AOD; seeded random
    weights where the reference mirror is LFS-stripped."""
    import torch

    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    from moephoto_tpu.pipeline import registry

    out = {}
    rng = np.random.RandomState(11)
    img = rng.rand(120, 104, 3).astype(np.float32)

    def torchNet(modName, builder, ckpt=None):
        cwd = os.getcwd()
        os.chdir(_refRoot())
        try:
            mod = __import__(modName)
        finally:
            os.chdir(cwd)
        torch.manual_seed(0)
        net = builder(mod)
        if ckpt and os.path.exists(ckpt):
            net.load_state_dict(_torchLoad(ckpt))
        net.eval()
        return net

    first = lambda y: y[0] if isinstance(y, (tuple, list)) else y

    # config 2: DN lite5 -> SR lite x4 (real checkpoints; Y-channel nets
    # run per-channel like the reference's runDN/runSR channel fold)
    try:
        dnT = torchNet("models", lambda m: m.NetDN(),
                       modelPath("model/dn_lite5/model_new.pth"))
        srT = torchNet("MoeNet_lite2", lambda m: m.Net(upscale=4),
                       modelPath("model/lite/model_4.pth"))
        x = torch.from_numpy(img.transpose(2, 0, 1)).unsqueeze(1)  # (3,1,H,W)
        with torch.no_grad():
            ref = first(srT(first(dnT(x))))
        ref = ref.squeeze(1).numpy().transpose(1, 2, 0)
        dn = registry.getDN({"model": "lite5"})
        sr = registry.getSR({"model": "lite", "scale": 4})
        ours = np.asarray(sr(dn(jnp.asarray(img))))
        out["chain2_DNlite5_SRlite4"] = _psnr(ours, ref)
    except Exception as e:
        out["chain2_DNlite5_SRlite4"] = f"error: {str(e).splitlines()[0][:90]}"

    # config 3: MPRNet denoise -> NAFNet-32 (both checkpoints
    # LFS-stripped upstream: seeded random reference weights on BOTH
    # sides — still catches chained-step regressions)
    try:
        from moephoto_tpu.engine.executor import ModelExec
        from moephoto_tpu.engine.tiling import TileSpec
        from moephoto_tpu.models.mprnet import makeMPRNet
        from moephoto_tpu.models.nafnet import nafNetSIDD32

        img3 = rng.rand(128, 112, 3).astype(np.float32)
        # reduced MPRNet config (the parity-test convention for the
        # LFS-stripped checkpoint): same graph, faster seeded-random run
        mprT = torchNet("MPRNet", lambda m: m.MPRNet(n_feat=16, scale_unetfeats=8,
                                                     scale_orsnetfeats=8, num_cab=2))
        nafT = torchNet("NAFNet", lambda m: m.NAFNet(
            width=32, middle_blk_num=12, enc_blk_nums=[2, 2, 4, 8],
            dec_blk_nums=[2, 2, 2, 2]))
        x = torch.from_numpy(img3.transpose(2, 0, 1)).unsqueeze(0)
        with torch.no_grad():
            ref = first(nafT(first(mprT(x))))
        ref = ref.squeeze(0).numpy().transpose(1, 2, 0)
        mprP = _refVideoParams([("", mprT)], convT=None)
        mprP = {k.lstrip("."): v for k, v in mprP.items()}
        nafP = _refVideoParams([("", nafT)], convT=None)
        nafP = {k.lstrip("."): v for k, v in nafP.items()}
        mpr = ModelExec(makeMPRNet(16, 8, 8, 2), mprP, TileSpec(256, 8, 8, 1.0, 2), name="mpr3")
        naf = ModelExec(nafNetSIDD32, nafP, TileSpec(256, 16, 16, 1.0, 4), name="naf3")
        ours = np.asarray(naf(mpr(jnp.asarray(img3))))
        out["chain3_MPRNet_NAFNet"] = _psnr(ours, ref)
    except Exception as e:
        out["chain3_MPRNet_NAFNet"] = f"error: {str(e).splitlines()[0][:90]}"

    # config 4: sun demoire -> AOD dehaze -> AiLUT retouch (BASELINE
    # config 4; real checkpoints for sun/AOD, AiLUT absent from the
    # mirror -> seeded random weights on both sides, the chain-3
    # convention).  The raw torch sun net needs /16 spatial dims (its
    # runner normally pads via imageProcess): 256x224 is a tiled-scale
    # input (sun's tile is 128 -> a real 2x2+blend tiling on our side).
    # The torch ailut_transform extension is not built on this host; the
    # torch target applies OUR fp32 XLA transform (bit-matched to the
    # CUDA kernel algorithm by tests/test_ops.py::
    # test_ailut_matches_cuda_algorithm) to the TORCH-generated
    # luts/vertices — reference semantics AiLUT.py:125-173.
    try:
        import torch.nn.functional as TF

        from moephoto_tpu.ops.lut import ailutTransform

        img4 = rng.rand(256, 224, 3).astype(np.float32)
        sunT = torchNet("sun_demoire", lambda m: m.Net(),
                        modelPath("model/demoire/sun_epoch_200.pth"))
        aodT = torchNet("models", lambda m: m.AODnet(),
                        modelPath("model/dehaze/AOD_net_epoch_relu_10.pth"))
        lutT = torchNet("AiLUT", lambda m: m.AiLUT(backbone="tpami"))
        x = torch.from_numpy(img4.transpose(2, 0, 1)).unsqueeze(0)
        with torch.no_grad():
            mid = first(sunT(x))
            refAod = first(aodT((mid - 0.5) / 0.5))
            codes = TF.interpolate(refAod, size=lutT.input_size,
                                   mode="bilinear", align_corners=False)
            codes = lutT.backbone(codes).view(1, -1)
            luts = lutT.lut_generator(codes)
            vertices = lutT.adaint(codes)
        refNHWC = refAod.numpy().transpose(0, 2, 3, 1)
        ref = np.asarray(
            ailutTransform(jnp.asarray(refNHWC), jnp.asarray(luts.numpy()),
                           jnp.asarray(vertices.numpy()))
        )[0]
        sun = registry.getDehaze({"model": "sun"})
        aod = registry.getDehaze({"model": "dehaze"})

        from moephoto_tpu.engine.executor import ModelExec
        from moephoto_tpu.engine.tiling import TileSpec
        from moephoto_tpu.models.ailut import ailutTPAMI

        from moephoto_tpu.models.api import convertStateDict

        lutP = convertStateDict(
            {k: v.numpy() for k, v in lutT.state_dict().items()}, None
        )
        lutP = {k: jnp.asarray(v, jnp.float32) for k, v in lutP.items()}
        lutEx = ModelExec(ailutTPAMI, lutP, TileSpec(256, 8, 8, 1.0, 1),
                          dtype=jnp.float32, name="lut4")
        ours = np.asarray(lutEx.applyWhole(aod(sun(jnp.asarray(img4)))))
        out["chain4_sun_AOD_AiLUT"] = _psnr(ours, ref)
    except Exception as e:
        out["chain4_sun_AOD_AiLUT"] = f"error: {str(e).splitlines()[0][:90]}"

    return out


def _refVideoParams(modules, convT):
    """Random-init reference torch modules -> converted param dict
    (ESTRNN/IFRNet checkpoints are LFS-stripped in the mirror, so video
    throughput is measured with seeded random weights — same FLOPs)."""
    import jax.numpy as jnp

    from moephoto_tpu.models.api import convertStateDict

    params = {}
    for prefix, mod in modules:
        flat = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        conv = convertStateDict(flat, convT)
        params.update({k: jnp.asarray(v, jnp.bfloat16) for k, v in conv.items()})
    return params


def _refModules():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(_refRoot())
    try:
        import ESTRNN as RE
        import IFRNet as RI
    finally:
        os.chdir(cwd)
    return RE, RI


def _timeStream(g, frames, warm, passes=3):
    """Wall-clock frames through a stream graph, syncing once per frame
    (one stacked reduce per frame: a real pipeline reads every frame
    back anyway, and unsynced feeding lets stream-stage batch sizes grow
    into fresh shapes that recompile inside the timed window).

    The steady-state window after ``warm`` is split into ``passes``
    equal groups timed independently so callers can report
    median + spread instead of a single noisy pass (tunnel RPC jitter
    produced 1.6x run-to-run swings on identical code in round 2)."""
    import jax.numpy as jnp

    def step(fr):
        vals = g(fr)
        if vals:
            _ = float(jnp.stack(vals).sum())

    for fr in frames[:warm]:
        step(fr)
    rest = frames[warm:]
    k = max(1, len(rest) // passes)
    dts = []
    for p in range(passes):
        group = rest[p * k:(p + 1) * k]
        if not group:
            break
        t0 = time.perf_counter()
        for fr in group:
            step(fr)
        dts.append((time.perf_counter() - t0, len(group)))
    return dts


def _medianRow(rates):
    """BENCH_DETAIL row from per-pass Mpx/s rates: median + spread
    (max-min as a fraction of the median)."""
    rates = sorted(rates)
    med = rates[len(rates) // 2] if len(rates) % 2 else 0.5 * (
        rates[len(rates) // 2 - 1] + rates[len(rates) // 2])
    spread = (rates[-1] - rates[0]) / med if med else 0.0
    return {
        "Mpx_per_s": round(med, 3),
        "median": round(med, 3),
        "spread_pct": round(100 * spread, 1),
        "passes": [round(r, 3) for r in rates],
    }


def _benchAiLUT(h=1080, w=1920):
    """AiLUT retouch at 1080p (checkpoint absent from the mirror: seeded
    random torch weights; backbone codes + the Pallas hat-matmul
    transform — ops/lutkernel.py, VERDICT round-2 item 5)."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.ailut import ailutTPAMI
    from moephoto_tpu.models.api import convertStateDict

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(_refRoot())
    try:
        import AiLUT as RA
    finally:
        os.chdir(cwd)
    net = RA.AiLUT(backbone="tpami")
    params = convertStateDict(
        {k: v.numpy() for k, v in net.state_dict().items()}, None
    )
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    ex = ModelExec(ailutTPAMI, params, TileSpec(256, 8, 8, 1.0, 1),
                   dtype=jnp.float32, name="ailutBench")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    red = jax.jit(lambda v: jnp.mean(v))
    float(red(ex.applyWhole(x)))
    t0 = time.perf_counter()
    vals = [red(ex.applyWhole(x)) for _ in range(5)]
    _ = sum(float(v) for v in vals)
    return round(h * w / 1e6 / ((time.perf_counter() - t0) / 5), 3)


def _benchNAFNet(h=1080, w=1920):
    """NAFNet-SIDD-32 restore at 1080p (checkpoint LFS-stripped: seeded
    random weights from the reference module, same FLOPs)."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.nafnet import nafNetSIDD32

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(_refRoot())
    try:
        from NAFNet import NAFNet
    finally:
        os.chdir(cwd)
    net = NAFNet(width=32, middle_blk_num=12, enc_blk_nums=[2, 2, 4, 8],
                 dec_blk_nums=[2, 2, 2, 2])
    params = _refVideoParams([("", net)], convT=None)
    params = {k.lstrip("."): v for k, v in params.items()}
    ex = ModelExec(nafNetSIDD32, params, TileSpec(256, 16, 16, 1.0, 4), name="naf32")
    red = jax.jit(lambda v: jnp.mean(v))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    float(red(ex(x)))
    t0 = time.perf_counter()
    vals = [red(ex(x)) for _ in range(4)]
    _ = sum(float(v) for v in vals)
    return round(h * w / 1e6 / ((time.perf_counter() - t0) / 4), 3)


def _benchSEDN(h=1080, w=1920):
    """SEDN strong denoise at 1080p, plane-packed (l15/l25/l50
    checkpoints are LFS-stripped: seeded random reference weights)."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import packBlockDiag
    from moephoto_tpu.models.sr import sedn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(_refRoot())
    try:
        from models import SEDN
    finally:
        os.chdir(cwd)
    params = _refVideoParams([("", SEDN())], convT=None)
    params = packBlockDiag({k.lstrip("."): v for k, v in params.items()}, 2)
    ex = ModelExec(sedn, params, TileSpec(256, 7, 8, 1.0, 8), pack=2, name="sedn")
    red = jax.jit(lambda v: jnp.mean(v))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    float(red(ex(x)))
    t0 = time.perf_counter()
    vals = [red(ex(x)) for _ in range(4)]
    _ = sum(float(v) for v in vals)
    return round(h * w / 1e6 / ((time.perf_counter() - t0) / 4), 3)


def _benchESTRNN(h=720, w=1280, n=72, warm=24):
    # warm must cover every stream-stage batch shape: late shapes would
    # otherwise compile inside the timed window (first-run 6.9 vs
    # steady-state 17.4 Mpx/s).  warm=24 / 16-frame groups align with
    # the 8-frame stage-chunk cadence (the IFRNet spread fix, round 3):
    # warm=20 straddled a chunk boundary and left the largest spread in
    # the sweep (5.3% — VERDICT round-3 weak #5 / task 8)
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models import estrnn as JE
    from moephoto_tpu.progress import Node

    RE, _ = _refModules()
    params = _refVideoParams(
        [("cell", RE.RDBCell(RE.para)), ("fusion", RE.GSA(RE.para)),
         ("recons", RE.Reconstructor())],
        convT=lambda k, s: k in ("recons.0.weight", "recons.1.weight"),
    )
    opt = JE.ESTRNNOpt()
    opt.params = params
    opt.dtype = jnp.bfloat16
    opt.start = 0
    opt.end = 0
    red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))
    g = JE.doESTRNN(lambda x: [red(x)], Node({"op": "t"}), opt)
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(h, w, 3).astype(np.float32)) for _ in range(n)]
    dts = _timeStream(g, frames, warm)
    return _medianRow([cnt * h * w / 1e6 / dt for dt, cnt in dts])


def _benchIFRNet(h=720, w=1280, n=80, warm=32):
    # round-2 passes rose monotonically (8.4 -> 9.3, 10.9% spread):
    # warm=20 left warm-up inside the first timed group and 8-frame
    # groups beat against the 8-frame stage-chunk cadence.  warm=24
    # (3 full chunk cycles) + 16-frame groups (2 chunks each) measured
    # steady state — mostly: the round-4 sweep still had pass 1 at
    # 15.18 vs 15.67/15.69 (3.3% spread, above the <=3% bar), so warm
    # is now 32 (4 cycles).
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models import ifrnet as JI
    from moephoto_tpu.progress import Node

    _, RI = _refModules()
    chs = RI.Channels["M"]
    params = _refVideoParams(
        [("encoder", RI.IFRNetEncoder(None, chs, 1e-3)),
         ("decoder", RI.IFRNetDecoder(None, chs, RI.SideChannels["M"], 0, 1e-3))],
        convT=lambda k, s: k.startswith("decoder.decoders.") and k.endswith(".2.weight"),
    )
    opt = JI.IFRNetOpt()
    opt.params = params
    opt.dtype = jnp.bfloat16
    opt.chs = chs
    opt.side = RI.SideChannels["M"]
    opt.sf = 2.0
    opt.dedupe = False
    opt.ensemble = 0
    opt.start = 0
    opt.end = 0
    red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))
    g = JI.doSlomo(lambda x: [red(x)], Node({"op": "t"}), opt)
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(h, w, 3).astype(np.float32)) for _ in range(n)]
    dts = _timeStream(g, frames, warm)
    return _medianRow([cnt * h * w / 1e6 / dt for dt, cnt in dts])


def psnrVsReference():
    """bf16 TPU pipeline output vs the reference torch fp32 output on a
    small image (the BASELINE quality gate: <=0.05 dB PSNR deviation —
    outputs this close shift PSNR-vs-GT by far less)."""
    try:
        import jax.numpy as jnp
        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from refshim import importReference

        importReference()
        cwd = os.getcwd()
        os.chdir(_refRoot())
        try:
            from MoeNet_lite2 import Net
        finally:
            os.chdir(cwd)
        from moephoto_tpu.pipeline import registry

        net = Net(upscale=2)
        net.load_state_dict(_torchLoad(modelPath("model/lite/model.pth")))
        net.eval()
        rng = np.random.RandomState(7)
        img = rng.rand(96, 80, 3).astype(np.float32)
        x = torch.from_numpy(img.transpose(2, 0, 1)).unsqueeze(1)
        with torch.no_grad():
            ref = net(x)[0].squeeze(1).numpy().transpose(1, 2, 0)
        ref = np.clip(ref, 0, 1)
        ex = registry.getSR({"model": "lite", "scale": 2})
        ours = np.clip(np.asarray(ex(jnp.asarray(img))), 0, 1)
        mse = float(np.mean((ours - ref) ** 2))
        return round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)
    except Exception as e:
        return f"error: {str(e).splitlines()[0][:80]}"


def _benchIconVSR(h=360, w=640, n=14, warm=0):
    """IconVSR 4x video SR on 360p LR frames (checkpoint LFS-stripped:
    seeded random reference-module weights)."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models import iconvsr as JV
    from moephoto_tpu.progress import Node

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    from refshim import importReference

    importReference()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir(_refRoot())
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
    # damp: plain random init explodes to NaN through the PCD cascade,
    # and NaN offsets would unrealistically force the unbounded-offset
    # DCN fallback (real checkpoints keep offsets small).  Also sanitize
    # UNINITIALIZED params first: the reference's ModulatedDeformConvPack
    # allocates weight/bias via torch.Tensor() with no reset_parameters
    # (models.py:596-599), i.e. raw memory (1e34/NaN) unless a real
    # checkpoint overwrites it — garbage there poisons the PCD cascade
    # and routes every DCN to the slow gather fallback.
    with torch.no_grad():
        for m in mods.values():
            for prm in m.parameters():
                if not torch.isfinite(prm).all() or prm.abs().max() > 1e3:
                    prm.normal_(0, 0.05)
                prm.mul_(0.2)
    params = _refVideoParams([(k, m) for k, m in mods.items()], convT=None)
    opt = JV.VSROpt()
    opt.params = params
    opt.dtype = jnp.bfloat16
    opt.start = 0
    opt.end = 0
    redJ = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))
    # the stream forwards the end-of-stream sentinel to its consumer
    # (chained temporal steps flush on it; engine sinks NonNullWrap it)
    red = lambda v: [] if v is None else [redJ(v)]
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(h, w, 3).astype(np.float32)) for _ in range(n)]

    def fullRun():
        # IconVSR buffers whole backward chunks, so the honest unit is a
        # complete clip: feed everything, flush, sync all outputs
        opt2 = JV.VSROpt()
        opt2.params = opt.params
        opt2.dtype = opt.dtype
        opt2.start = 0
        opt2.end = 0
        vals = []
        g = JV.doVSR(red, Node({"op": "t"}), opt2)
        t0 = time.perf_counter()
        for fr in frames:
            vals.extend(g(fr))
        vals.extend(g(None))
        _ = float(jnp.stack(vals).sum())
        return time.perf_counter() - t0, len(vals)

    fullRun()  # compile pass (module-level stage jits persist)
    rates = []
    for _ in range(3):
        dt, outs = fullRun()
        rates.append(outs * h * w / 1e6 / dt)
    return _medianRow(rates)


def _benchRealClip(passes=3, loops=4):
    """BASELINE config 5 analog on REAL media end to end: the production
    video engine (probe/pipes/drain threads/mux — video/engine.py)
    decodes a real mp4v container, runs demob (ESTRNN) -> slomo x2
    (IFRNet) and encodes a playable mp4.  The clip is the committed
    36-frame 320x240 fixture tests/data/shortclip.mp4 looped ``loops``
    times into a longer bench clip at setup (144 frames) so per-pass
    host constants (probe, process spawns, container open/close) stop
    dominating the spread (VERDICT r4 weak #3).  ffmpeg has no binary
    here and no egress to fetch one (docs/PERF.md); the subprocess seam
    runs tools/cvffmpeg.py — the same CLI surface, real decode/encode
    via OpenCV.  Asserts the output container re-decodes with exactly
    2*n-1 frames each pass.  Round-5 fix: the step list was missing the
    positional ``range`` step (video/engine.prepare reads steps[1] as
    range), which silently DROPPED the demob step from the pipeline —
    earlier rows measured slomo only.
    Reference: video.py:323-397, test/test-video.py:1-17."""
    import shutil
    import tempfile

    import cv2

    from moephoto_tpu.config import config
    from moephoto_tpu.models import estrnn as JE
    from moephoto_tpu.models import ifrnet as JI
    from moephoto_tpu.runtime.context import context
    import moephoto_tpu.video.engine as E

    root = os.path.dirname(os.path.abspath(__file__))
    fixture = os.path.join(root, "tests", "data", "shortclip.mp4")
    script = os.path.join(root, "tools", "cvffmpeg.py")

    RE, RI = _refModules()
    import torch

    torch.manual_seed(7)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    ePath = os.path.join(tmp, "estrnn.pth")
    torch.save(
        {"cell": RE.RDBCell(RE.para).state_dict(),
         "fusion": RE.GSA(RE.para).state_dict(),
         "recons": RE.Reconstructor().state_dict()},
        ePath,
    )
    chs = RI.Channels["S"]
    iPath = os.path.join(tmp, "ifrnet.pth")
    torch.save(
        {"encoder": RI.IFRNetEncoder(None, chs, 1e-3).state_dict(),
         "decoder": RI.IFRNetDecoder(None, chs, RI.SideChannels["S"], 0, 1e-3).state_dict()},
        iPath,
    )

    class _Flag:
        _s = False

        def is_set(self):
            return self._s

        def set(self):
            self._s = True

        def clear(self):
            self._s = False

    saved = (config.ffmpegPath, getattr(config, "uploadDir", None),
             E.sp.Popen, JE.modelPaths.get("1ms8ms"), JI.modelPaths.get("S"),
             context.stopFlag, getattr(context, "notifier", None))
    origPopen = E.sp.Popen

    def patched(cmd, **kw):
        if cmd and cmd[0] == sys.executable:
            cmd = [sys.executable, script] + list(cmd[1:])
        return origPopen(cmd, **kw)

    try:
        config.ffmpegPath = sys.executable
        upDir = os.path.join(tmp, "upload")
        os.makedirs(upDir, exist_ok=True)
        config.uploadDir = upDir
        E.sp.Popen = patched
        JE.modelPaths["1ms8ms"] = ePath
        JI.modelPaths["S"] = iPath
        context.stopFlag = _Flag()
        context.notifier = None

        # synthesize the longer bench clip: the fixture looped `loops`
        # times (a real re-encoded container, not a concat of bytes)
        longClip = os.path.join(tmp, "benchclip.mp4")
        capF = cv2.VideoCapture(fixture)
        wri = cv2.VideoWriter(
            longClip, cv2.VideoWriter_fourcc(*"mp4v"),
            capF.get(cv2.CAP_PROP_FPS) or 30.0,
            (int(capF.get(cv2.CAP_PROP_FRAME_WIDTH)),
             int(capF.get(cv2.CAP_PROP_FRAME_HEIGHT))),
        )
        nIn = 0
        for _ in range(loops):
            capF.set(cv2.CAP_PROP_POS_FRAMES, 0)
            while True:
                ok, frame = capF.read()
                if not ok:
                    break
                wri.write(frame)
                nIn += 1
        capF.release()
        wri.release()

        def onePass(idx):
            vid = os.path.join(upDir, "benchclip.mp4")
            shutil.copyfile(longClip, vid)
            outFile = os.path.join(tmp, f"out{idx}.mp4")
            steps = [
                {"op": "decode"},
                {"op": "range"},  # positional: engine reads steps[1]
                {"op": "demob", "model": "1ms8ms"},
                {"op": "slomo", "model": "IFRNet S", "sf": 2},
                {"op": "output", "file": outFile, "frameRate": 60,
                 "codec": "mpeg4"},
            ]
            t0 = time.perf_counter()
            path, nFrames = E.SR_vid(vid, "", *steps)
            dt = time.perf_counter() - t0
            cap = cv2.VideoCapture(path)
            assert cap.isOpened(), "output not a playable container"
            nOut = 0
            while cap.read()[0]:
                nOut += 1
            cap.release()
            assert nOut == 2 * nIn - 1, (nOut, nFrames)
            return dt

        onePass(0)  # compile/warm pass
        rates = []
        for p in range(passes):
            dt = onePass(p + 1)
            rates.append(nIn * 320 * 240 / 1e6 / dt)
        row = _medianRow(rates)
        row["frames_out"] = 2 * nIn - 1
        return row
    finally:
        config.ffmpegPath, config.uploadDir, E.sp.Popen = saved[:3]
        context.stopFlag, context.notifier = saved[5:]
        if saved[3] is not None:
            JE.modelPaths["1ms8ms"] = saved[3]
        if saved[4] is not None:
            JI.modelPaths["S"] = saved[4]
        shutil.rmtree(tmp, ignore_errors=True)


def _claimGuard(totalS=3600, probeS=120, sleepS=180):
    """The axon chip claim can wedge forever (observed 2026-08-17: a
    stale grant left every jax init sleeping in the claim loop — for
    ~7 h).  Probe device init in SUBPROCESSES (a wedged in-process
    ``jax.devices()`` never recovers, so retrying needs a fresh
    interpreter) and only let this process touch jax once a probe
    succeeds; a transient wedge becomes a delayed-but-honest bench.
    After ``totalS`` of failed probes emit the error line instead of
    hanging the driver silently."""
    import subprocess

    deadline = time.time() + totalS
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; ds = jax.devices(); "
                 "assert ds[0].platform == 'tpu', ds"],
                timeout=probeS, capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        left = deadline - time.time()
        if left <= sleepS:
            break
        print(f"# TPU claim probe {attempt} failed; retrying "
              f"({int(left)}s left)", file=sys.stderr, flush=True)
        time.sleep(sleepS)
    print(
        json.dumps(
            {
                "metric": "lite_4x_SR_throughput_1080p",
                "value": 0.0,
                "unit": "Mpx/s",
                "vs_baseline": 0.0,
                "error": f"TPU claim did not complete in {totalS}s (tunnel wedged)",
            }
        ),
        flush=True,
    )
    os._exit(3)


def main():
    _claimGuard()
    value = benchTPU()
    base = benchTorchCPU()
    vs = value / base if base else 0.0
    # emit the driver's line FIRST (benchDetail adds minutes and must
    # never cost us the primary metric if the run is cut short)
    print(
        json.dumps(
            {
                "metric": "lite_4x_SR_throughput_1080p",
                "value": round(value, 3),
                "unit": "Mpx/s",
                "vs_baseline": round(vs, 2),
            }
        ),
        flush=True,
    )
    try:
        benchDetail()
    except Exception:
        pass


if __name__ == "__main__":
    main()
