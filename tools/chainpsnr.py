"""Full-resolution chain PSNR harness (BASELINE configs 2/3/4).

Reproduces the docs/PERF.md "Round 5: full-res chain PSNR
confirmation" table.  Three modes per chain:

  ref    — torch fp32 whole-image chain (pure CPU; saves refs to OUT)
  ours   — our production engine (chip bf16, real tiling) vs the ref
  tiled  — torch fp32 pushed through OUR tiling geometry+blend vs the
           ref: the tiling-policy control (pure CPU)

Chains 3/4 run at 1072x1920: NAFNet's U-Net and sun's stride-16 trunk
need H % 16 == 0 (reference NAFNet.py:72 decoder join fails at 1080).
`ref` must run first (it seeds inputs + torch states into OUT).
Reference chain composition: BASELINE.md configs 2-4; torch models
from /root/reference/python (MPRNet.py, NAFNet.py, sun_demoire.py,
models.py AODnet, AiLUT.py, MoeNet_lite2.py).

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/chainpsnr.py ref
  python tools/chainpsnr.py ours          # chip job - run alone
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/chainpsnr.py tiled
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from bench import _psnr, _refRoot, _refVideoParams, _torchLoad, modelPath
from refshim import importReference

importReference()
import torch

OUT = os.environ.get("CHAINPSNR_OUT", "/tmp/chain34")
first = lambda y: y[0] if isinstance(y, (tuple, list)) else y


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


def chain3Nets(fromState=False):
    cwd = os.getcwd()
    os.chdir(_refRoot())
    try:
        import MPRNet as RM
        import NAFNet as RN
    finally:
        os.chdir(cwd)
    torch.manual_seed(0)
    mprT = RM.MPRNet(n_feat=16, scale_unetfeats=8, scale_orsnetfeats=8, num_cab=2)
    nafT = RN.NAFNet(width=32, middle_blk_num=12, enc_blk_nums=[2, 2, 4, 8],
                     dec_blk_nums=[2, 2, 2, 2])
    if fromState:
        st = torch.load(f"{OUT}/chain3_state.pth", weights_only=True)
        mprT.load_state_dict(st["mpr"])
        nafT.load_state_dict(st["naf"])
    mprT.eval()
    nafT.eval()
    return mprT, nafT


def chain4Nets():
    sunT = torchNet("sun_demoire", lambda m: m.Net(),
                    modelPath("model/demoire/sun_epoch_200.pth"))
    aodT = torchNet("models", lambda m: m.AODnet(),
                    modelPath("model/dehaze/AOD_net_epoch_relu_10.pth"))
    lutT = torchNet("AiLUT", lambda m: m.AiLUT(backbone="tpami"))
    return sunT, aodT, lutT


def lutOutputs(lutT, aodNHWC):
    """codes -> (luts, vertices) from an (1,H,W,3) AOD output."""
    import torch.nn.functional as TF

    x = torch.from_numpy(aodNHWC.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        codes = TF.interpolate(x, size=lutT.input_size, mode="bilinear",
                               align_corners=False)
        codes = lutT.backbone(codes).view(1, -1)
        return lutT.lut_generator(codes).numpy(), lutT.adaint(codes).numpy()


def runRef():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.RandomState(11)

    t0 = time.time()
    img2 = rng.rand(1080, 1920, 3).astype(np.float32)
    np.save(f"{OUT}/img2.npy", img2)
    dnT = torchNet("models", lambda m: m.NetDN(), modelPath("model/dn_lite5/model_new.pth"))
    srT = torchNet("MoeNet_lite2", lambda m: m.Net(upscale=4), modelPath("model/lite/model_4.pth"))
    x = torch.from_numpy(img2.transpose(2, 0, 1)).unsqueeze(1)
    with torch.no_grad():
        ref = first(srT(first(dnT(x))))
    np.save(f"{OUT}/ref2.npy", ref.squeeze(1).numpy().transpose(1, 2, 0))
    print(f"chain2 ref done {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    img3 = rng.rand(1072, 1920, 3).astype(np.float32)
    np.save(f"{OUT}/img3.npy", img3)
    mprT, nafT = chain3Nets()
    torch.save({"mpr": mprT.state_dict(), "naf": nafT.state_dict()},
               f"{OUT}/chain3_state.pth")
    x = torch.from_numpy(img3.transpose(2, 0, 1)).unsqueeze(0)
    with torch.no_grad():
        ref = first(nafT(first(mprT(x))))
    np.save(f"{OUT}/ref3.npy", ref.squeeze(0).numpy().transpose(1, 2, 0))
    print(f"chain3 ref done {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    img4 = rng.rand(1072, 1920, 3).astype(np.float32)
    np.save(f"{OUT}/img4.npy", img4)
    sunT, aodT, lutT = chain4Nets()
    torch.save(lutT.state_dict(), f"{OUT}/chain4_lut.pth")
    x = torch.from_numpy(img4.transpose(2, 0, 1)).unsqueeze(0)
    with torch.no_grad():
        mid = first(sunT(x))
        refAod = first(aodT((mid - 0.5) / 0.5))
    np.save(f"{OUT}/refAod4.npy", refAod.numpy().transpose(0, 2, 3, 1))
    luts, verts = lutOutputs(lutT, refAod.numpy().transpose(0, 2, 3, 1))
    np.save(f"{OUT}/luts4.npy", luts)
    np.save(f"{OUT}/verts4.npy", verts)
    print(f"chain4 ref done {time.time()-t0:.0f}s", flush=True)


def ref4():
    """Whole-image chain-4 reference image: torch LUTs applied (fp32
    XLA transform — bit-matches the CUDA kernel, see ops/lut.py)."""
    import jax.numpy as jnp
    from moephoto_tpu.ops.lut import ailutTransform

    refAod = np.load(f"{OUT}/refAod4.npy")
    luts = np.load(f"{OUT}/luts4.npy")
    verts = np.load(f"{OUT}/verts4.npy")
    return refAod, np.asarray(
        ailutTransform(jnp.asarray(refAod), jnp.asarray(luts), jnp.asarray(verts))
    )[0]


def runOurs():
    import jax.numpy as jnp
    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.models.ailut import ailutTPAMI
    from moephoto_tpu.models.mprnet import makeMPRNet
    from moephoto_tpu.models.nafnet import nafNetSIDD32
    from moephoto_tpu.pipeline import registry

    t0 = time.time()
    img2 = np.load(f"{OUT}/img2.npy")
    dn = registry.getDN({"model": "lite5"})
    sr = registry.getSR({"model": "lite", "scale": 4})
    ours = np.asarray(sr(dn(jnp.asarray(img2))))
    print(f"chain2_fullres_1080p: {_psnr(ours, np.load(f'{OUT}/ref2.npy')):.2f} dB"
          f"  ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    mprT, nafT = chain3Nets(fromState=True)
    mprP = {k.lstrip("."): v for k, v in _refVideoParams([("", mprT)], convT=None).items()}
    nafP = {k.lstrip("."): v for k, v in _refVideoParams([("", nafT)], convT=None).items()}
    mpr = ModelExec(makeMPRNet(16, 8, 8, 2), mprP, TileSpec(256, 8, 8, 1.0, 2), name="mprF")
    naf = ModelExec(nafNetSIDD32, nafP, TileSpec(256, 16, 16, 1.0, 4), name="nafF")
    ours = np.asarray(naf(mpr(jnp.asarray(np.load(f"{OUT}/img3.npy")))))
    print(f"chain3_fullres_1072p: {_psnr(ours, np.load(f'{OUT}/ref3.npy')):.2f} dB"
          f"  ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    _, r4 = ref4()
    sun = registry.getDehaze({"model": "sun"})
    aod = registry.getDehaze({"model": "dehaze"})
    lutSt = torch.load(f"{OUT}/chain4_lut.pth", weights_only=True)
    lutP = convertStateDict({k: v.numpy() for k, v in lutSt.items()}, None)
    lutP = {k: jnp.asarray(v, jnp.float32) for k, v in lutP.items()}
    lutEx = ModelExec(ailutTPAMI, lutP, TileSpec(256, 8, 8, 1.0, 1),
                      dtype=jnp.float32, name="lut4F")
    o = np.asarray(lutEx.applyWhole(aod(sun(jnp.asarray(np.load(f"{OUT}/img4.npy"))))))
    print(f"chain4_fullres_1072p: {_psnr(o, r4):.2f} dB  ({time.time()-t0:.0f}s)",
          flush=True)


def tiledTorch(img, net, spec, prepare=None, channelSplit=False):
    """Our _tiledApplyImpl geometry + blend with a torch per-tile fn
    (engine/tiling.py:190-260 replicated in numpy, fp32)."""
    import jax.numpy as jnp
    from moephoto_tpu.engine.tiling import (
        blendWindow, paddedExtent, planAxis, reflectPadHW,
    )

    h, w, _ = img.shape
    tile, pad, align, sc = spec.tile, spec.pad, spec.align, int(spec.scale)
    ph = paddedExtent(h, tile, pad, align)
    pw = paddedExtent(w, tile, pad, align)
    xp = np.asarray(reflectPadHW(jnp.asarray(img), ph - h, pw - w))
    ys, xs = planAxis(ph, tile, pad), planAxis(pw, tile, pad)
    th, tw = min(tile, ph), min(tile, pw)
    oth, otw, padSc = th * sc, tw * sc, pad * sc
    canvas = np.zeros((ph * sc, pw * sc, 3), np.float64)
    weight = np.zeros((ph * sc, pw * sc, 1), np.float64)
    wins = {}
    for iy, y in enumerate(ys):
        for ix, x0 in enumerate(xs):
            edges = (iy == 0, iy == len(ys) - 1, ix == 0, ix == len(xs) - 1)
            if edges not in wins:
                wins[edges] = np.asarray(
                    blendWindow(oth, otw, padSc, jnp.float32, edges))[:, :, None]
            win = wins[edges]
            t = xp[y : y + th, x0 : x0 + tw, :]
            if prepare is not None:
                t = prepare(t)
            xt = torch.from_numpy(t.transpose(2, 0, 1).copy())
            xt = xt.unsqueeze(1) if channelSplit else xt.unsqueeze(0)
            with torch.no_grad():
                o = first(net(xt))
                o = (o.squeeze(1) if channelSplit else o.squeeze(0)).numpy()
            canvas[y * sc : y * sc + oth, x0 * sc : x0 * sc + otw] += (
                o.transpose(1, 2, 0) * win)
            weight[y * sc : y * sc + oth, x0 * sc : x0 * sc + otw] += win
    out = canvas / np.maximum(weight, 1e-8)
    return out[: h * sc, : w * sc].astype(np.float32)


def runTiled():
    import jax.numpy as jnp
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.ops.lut import ailutTransform

    # registry tile specs (pipeline/registry.py)
    t0 = time.time()
    dnT = torchNet("models", lambda m: m.NetDN(), modelPath("model/dn_lite5/model_new.pth"))
    srT = torchNet("MoeNet_lite2", lambda m: m.Net(upscale=4), modelPath("model/lite/model_4.pth"))
    mid = tiledTorch(np.load(f"{OUT}/img2.npy"), dnT, TileSpec(256, 7, 8, 1.0, 8),
                     channelSplit=True)
    out2 = tiledTorch(mid, srT, TileSpec(256, 5, 8, 4.0, 10), channelSplit=True)
    print(f"chain2 torch-OUR-TILING vs whole: "
          f"{_psnr(out2, np.load(f'{OUT}/ref2.npy')):.2f} dB ({time.time()-t0:.0f}s)",
          flush=True)

    t0 = time.time()
    mprT, nafT = chain3Nets(fromState=True)
    mid = tiledTorch(np.load(f"{OUT}/img3.npy"), mprT, TileSpec(256, 8, 8, 1.0, 2))
    out3 = tiledTorch(mid, nafT, TileSpec(256, 16, 16, 1.0, 4))
    print(f"chain3 torch-OUR-TILING vs whole: "
          f"{_psnr(out3, np.load(f'{OUT}/ref3.npy')):.2f} dB ({time.time()-t0:.0f}s)",
          flush=True)

    t0 = time.time()
    sunT, aodT, lutT = chain4Nets()
    lutT.load_state_dict(torch.load(f"{OUT}/chain4_lut.pth", weights_only=True))
    lutT.eval()
    _, r4 = ref4()
    midS = tiledTorch(np.load(f"{OUT}/img4.npy"), sunT, TileSpec(256, 16, 32, 1.0, 4))
    aodTiled = tiledTorch(midS, aodT, TileSpec(256, 8, 8, 1.0, 8),
                          prepare=lambda t: (t - 0.5) / 0.5)
    luts, verts = lutOutputs(lutT, aodTiled[None])
    out4 = np.asarray(ailutTransform(
        jnp.asarray(aodTiled[None]), jnp.asarray(luts), jnp.asarray(verts)))[0]
    print(f"chain4 torch-OUR-TILING vs whole: {_psnr(out4, r4):.2f} dB "
          f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "ref"
    {"ref": runRef, "ours": runOurs, "tiled": runTiled}[mode]()
