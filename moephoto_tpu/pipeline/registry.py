"""Model registry: step-JSON model names -> executable models.

Mirrors the reference registries ``runSR.py:10-24``, ``runDN.py:10-21``,
``dehaze.py:17-30`` — same model keys, same checkpoint file layout —
but each entry resolves to a :class:`ModelExec` with a **static**
:class:`TileSpec` instead of a free-VRAM-driven ``ramCoef`` plan.

Tile sizes are chosen per family for TPU: large enough to fill the MXU,
bounded for the quadratic-attention demoire models, aligned to each
model's stride pyramid.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from moephoto_tpu.config import config
from moephoto_tpu.engine.executor import ModelExec
from moephoto_tpu.engine.tiling import TileSpec
from moephoto_tpu.models import api as M

log = logging.getLogger("Moe")

_modelCache: Dict[str, ModelExec] = {}
_paramsCache: Dict[str, dict] = {}


def modelPath(rel: str) -> str:
    """Resolve a checkpoint path: ``modelDir`` replaces the leading
    ``model/`` component.  A reference checkout is consulted ONLY when
    explicitly configured (``referenceRoot`` config key or
    ``MOEPHOTO_REFERENCE_ROOT`` env) — no hidden mount dependency."""
    from moephoto_tpu.config import referenceRoot

    if os.path.isabs(rel):  # explicit checkpoint path: use as-is
        return rel
    rel = rel.lstrip("./")
    sub = rel[len("model/"):] if rel.startswith("model/") else rel
    candidates = [os.path.join(config.modelDir, sub), rel]
    ref = referenceRoot()
    if ref:
        candidates.append(os.path.join(ref, rel))
    for cand in candidates:
        if os.path.exists(cand):
            return cand
    return candidates[0]


def _lazyImport(family: str):
    if family == "sr":
        from moephoto_tpu.models import sr

        return sr
    if family == "restore":
        from moephoto_tpu.models import restore

        return restore
    if family == "nafnet":
        from moephoto_tpu.models import nafnet

        return nafnet
    if family == "mprnet":
        from moephoto_tpu.models import mprnet

        return mprnet
    if family == "demoire":
        from moephoto_tpu.models import demoire

        return demoire
    if family == "ailut":
        from moephoto_tpu.models import ailut

        return ailut
    raise KeyError(family)


def _entry(family, fn, path, spec, channelSplit=False, outC=None, prepare=None,
           convT=None, fp32=False, noTile=False, packed=False):
    # packed: Y-channel model executed plane-packed (pack=2 block-diagonal
    # weights) — ~2.3x for conv-heavy trunks (netDN), ~1.35x for MyNet,
    # ~1.13x for lite (conv-bound once its up path moved into the fused
    # Pallas kernel; see docs/PERF.md).
    return dict(family=family, fn=fn, path=path, spec=spec, channelSplit=channelSplit,
                outC=outC, prepare=prepare, convT=convT, fp32=fp32, noTile=noTile,
                packed=packed)


def _normalize05(x):
    """Normalize(mean=.5, std=.5) used by the AOD dehaze entry
    (dehaze.py:12,36-37)."""
    return (x - 0.5) / 0.5


_entry_packed = lambda *a, **k: _entry(*a, **{**k, "packed": True})

# --- SR registry (runSR.py:10-24) -----------------------------------------
_SPEC_Y_SR = lambda sc: TileSpec(tile=256, pad=9 if sc == 3 else 5, align=8, scale=sc, batch=8 if sc <= 2 else 4)
_SPEC_GAN = lambda sc: TileSpec(tile=192, pad=8, align=4, scale=sc, batch=4)
_SPEC_LITE = lambda sc: TileSpec(tile=256, pad=5, align=8, scale=sc, batch=10 if sc <= 4 else 2)  # calibrated (tools/calibrate.py)

SR_REGISTRY = {
    "a2": _entry_packed("sr", "net2x", "model/a2/model_new.pth", _SPEC_Y_SR(2), channelSplit=True),
    "a3": _entry_packed("sr", "net3x", "model/a3/model_new.pth", _SPEC_Y_SR(3), channelSplit=True),
    "a4": _entry_packed("sr", "net4x", "model/a4/model_new.pth", _SPEC_Y_SR(4), channelSplit=True),
    "p2": _entry_packed("sr", "net2x", "model/p2/model_new.pth", _SPEC_Y_SR(2), channelSplit=True),
    "p3": _entry_packed("sr", "net3x", "model/p3/model_new.pth", _SPEC_Y_SR(3), channelSplit=True),
    "p4": _entry_packed("sr", "net4x", "model/p4/model_new.pth", _SPEC_Y_SR(4), channelSplit=True),
    "gan2": _entry("restore", "rrdbNetX2", "model/gan/RealESRGAN_x2plus.pth", _SPEC_GAN(2)),
    "gan4": _entry("restore", "rrdbNetX4", "model/gan/RealESRGAN_x4plus.pth", _SPEC_GAN(4)),
    "gana4": _entry("restore", "rrdbNetX4Anime", "model/gan/RealESRGAN_x4plus_anime_6B.pth", _SPEC_GAN(4)),
    # packed: conv-bound after the nested-deferred up path, so the 96-ch
    # block-diagonal plane packing now wins (6.9 -> 7.8 Mpx/s at x4)
    "lite2": _entry_packed("sr", "moeNetLite2x2", "model/lite/model.pth", _SPEC_LITE(2), channelSplit=True),
    "lite4": _entry_packed("sr", "moeNetLite2x4", "model/lite/model_4.pth", _SPEC_LITE(4), channelSplit=True),
    "lite8": _entry_packed("sr", "moeNetLite2x8", "model/lite/model_8.pth", _SPEC_LITE(8), channelSplit=True),
}

# --- DN registry (runDN.py:10-21) -----------------------------------------
DN_REGISTRY = {
    "15": _entry_packed("sr", "sedn", "model/l15/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "25": _entry_packed("sr", "sedn", "model/l25/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "50": _entry_packed("sr", "sedn", "model/l50/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "lite5": _entry_packed("sr", "netDN", "model/dn_lite5/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "lite10": _entry_packed("sr", "netDN", "model/dn_lite10/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "lite15": _entry_packed("sr", "netDN", "model/dn_lite15/model_new.pth", TileSpec(256, 7, 8, 1.0, 8), channelSplit=True),
    "MPRNet_denoising": _entry("mprnet", "mprNetDenoise", "model/MPRNet/model_denoising.pth", TileSpec(256, 8, 8, 1.0, 2)),
    "NAFNet_32": _entry("nafnet", "nafNetSIDD32", "model/NAFNet/NAFNet-SIDD-width32.pth", TileSpec(256, 16, 16, 1.0, 4)),
    "NAFNet_64": _entry("nafnet", "nafNetSIDD64", "model/NAFNet/NAFNet-SIDD-width64.pth", TileSpec(256, 16, 16, 1.0, 2)),
    "VSR_Cleaning": _entry("restore", "imageCleaning", "model/vsr/RealBasicVSR_ImageCleaning.pth", TileSpec(256, 8, 8, 1.0, 4)),
}

# --- dehaze / deblur / derain / demoire / retouch (dehaze.py:17-30) -------
_sunConvT = lambda k, s: s[2] == 4
DEHAZE_REGISTRY = {
    "dehaze": _entry("restore", "aodNet", "model/dehaze/AOD_net_epoch_relu_10.pth",
                     TileSpec(256, 8, 8, 1.0, 8), prepare=_normalize05),
    "sun": _entry("demoire", "sunDemoire", "model/demoire/sun_epoch_200.pth",
                  TileSpec(256, 16, 32, 1.0, 4), convT=_sunConvT),
    "moire_obj": _entry("demoire", "moireObj", "model/demoire/moire_obj.pth",
                        TileSpec(128, 16, 128, 1.0, 4)),
    "moire_screen_gan": _entry("demoire", "moireScreenGan", "model/demoire/moire_screen_gan.pth",
                               TileSpec(512, 32, 512, 1.0, 1)),
    "MPRNet_deblurring": _entry("mprnet", "mprNet", "model/MPRNet/model_deblurring.pth",
                                TileSpec(256, 8, 8, 1.0, 2)),
    "MPRNet_deraining": _entry("mprnet", "mprNetDerain", "model/MPRNet/model_deraining.pth",
                               TileSpec(256, 8, 8, 1.0, 4)),
    "NAFNet_deblur_32": _entry("nafnet", "nafNetGoPro32", "model/NAFNet/NAFNet-GoPro-width32.pth",
                               TileSpec(256, 16, 16, 1.0, 4)),
    "NAFNet_deblur_64": _entry("nafnet", "nafNetGoPro64", "model/NAFNet/NAFNet-GoPro-width64.pth",
                               TileSpec(256, 16, 16, 1.0, 2)),
    "NAFNet_deblur_JPEG_64": _entry("nafnet", "nafNetGoPro64", "model/NAFNet/NAFNet-REDS-width64.pth",
                                    TileSpec(256, 16, 16, 1.0, 2)),
    "AiLUT_sRGB_3": _entry("ailut", "ailutTPAMI", "model/AiLUT/AiLUT-FiveK-sRGB.pth",
                           TileSpec(256, 8, 8, 1.0, 1), fp32=True, noTile=True),
    "AiLUT_XYZ_3": _entry("ailut", "ailutTPAMI", "model/AiLUT/AiLUT-FiveK-XYZ.pth",
                          TileSpec(256, 8, 8, 1.0, 1), fp32=True, noTile=True),
    "AiLUT_sRGB_5": _entry("ailut", "ailutRes18", "model/AiLUT/AiLUT-PPR10KA-sRGB.pth",
                           TileSpec(256, 8, 8, 1.0, 1), fp32=True, noTile=True),
}


def _applyConfigSpec(entry: dict, kind: str) -> "TileSpec":
    """Apply user tile-size caps (reference ``cropsize`` semantics:
    ``config.py:43-44`` crop_sr/crop_dn/crop_dns + our tileSize/tileBatch
    knobs) to the entry's static spec."""
    from dataclasses import replace

    spec = entry["spec"]
    caps = dict(zip(("sr", "dn", "dns"), config.getConfig()))
    cap = caps.get(kind, 0) or config.tileSize
    if cap:
        tile = max(spec.align, (int(cap) // spec.align) * spec.align)
        if tile > 2 * spec.pad:
            spec = replace(spec, tile=tile)
    if config.tileBatch:
        spec = replace(spec, batch=int(config.tileBatch))
    return spec


def buildExec(entry: dict, strength: float = 1.0, ensemble: int = 0,
              cacheKey: Optional[str] = None, kind: str = "") -> ModelExec:
    """Instantiate (and cache) a ModelExec from a registry entry."""
    import jax.numpy as jnp

    key = cacheKey or entry["path"]
    fullKey = f"{key}|{strength}|{ensemble}"
    if fullKey in _modelCache:
        return _modelCache[fullKey]
    mod = _lazyImport(entry["family"])
    fn = getattr(mod, entry["fn"])
    dtype = jnp.float32 if entry["fp32"] else config.dtype()
    import jax

    onTPU = dtype == jnp.bfloat16 and jax.default_backend() != "cpu"
    if onTPU and hasattr(mod, entry["fn"] + "F"):
        # bf16 production path: Pallas-fused variant (TPU only; fp32
        # parity runs and CPU-only hosts keep the plain XLA path)
        fn = getattr(mod, entry["fn"] + "F")
    # space-to-depth variant hook (models/s2d.py): measured a NET LOSS
    # for the packed 48-ch trunks it was built for (22.8 vs 13.2 ms per
    # netDN chunk — the 4x structural FLOPs outrun the 96->384-lane
    # efficiency gain; docs/PERF.md round 2), so no entry opts in today.
    # The mechanism stays for genuinely narrow unpacked trunks.
    useS2d = onTPU and entry.get("s2d", False) and hasattr(mod, entry["fn"] + "S2d")
    if useS2d:
        fn = getattr(mod, entry["fn"] + "S2d")
    packed = entry.get("packed", False)
    pKey = key + ("|packed" if packed else "") + ("|s2d" if useS2d else "")
    if pKey not in _paramsCache:
        path = modelPath(entry["path"])
        log.info("loading model %s", path)
        params = M.loadTorchWeights(path, entry["convT"], dtype=dtype)
        if packed:
            params = M.packBlockDiag(params, 2)
        if useS2d:
            params = getattr(mod, entry["fn"] + "S2dParams")(params)
        _paramsCache[pKey] = params
    ex = ModelExec(
        fn,
        _paramsCache[pKey],
        _applyConfigSpec(entry, kind),
        channelSplit=entry["channelSplit"] and not packed,
        pack=2 if packed else 0,
        outC=entry["outC"],
        prepare=entry["prepare"],
        strength=strength,
        ensemble=ensemble,
        dtype=dtype,
        name=key,
    )
    if entry["noTile"]:
        ex.noTile = True
    _modelCache[fullKey] = ex
    return ex


def getSR(opt: dict) -> Optional[ModelExec]:
    """SR step options -> ModelExec (reference runSR.getOpt :30-49)."""
    mode = opt["model"]
    scale = int(opt["scale"])
    name = mode + str(scale)
    if name not in SR_REGISTRY:
        return None
    ens = opt.get("ensemble", config.ensembleSR)
    ens = ens if 0 <= int(ens) <= 7 else config.ensembleSR
    return buildExec(SR_REGISTRY[name], ensemble=int(ens), kind="sr")


def getDN(opt: dict) -> ModelExec:
    """DN step options -> ModelExec (reference runDN.getOpt :25-38)."""
    model = opt["model"]
    kind = "dn" if model.startswith("lite") else "dns"
    return buildExec(
        DN_REGISTRY[model], strength=float(opt.get("strength", 1.0)), kind=kind
    )


def getDehaze(opt: dict) -> ModelExec:
    """dehaze/deblur/derain/demoire/retouch options -> ModelExec
    (reference dehaze.getOpt :32-42)."""
    model = opt.get("model", "dehaze")
    return buildExec(
        DEHAZE_REGISTRY[model], strength=float(opt.get("strength", 1.0))
    )
