"""MPRNet multi-stage progressive restoration (reference
``python/MPRNet.py``): two U-Net stages with cross-stage feature fusion
plus an original-resolution ORSNet stage, SAM supervision between
stages.  Input H, W must be multiples of 8 (MPRNet.py:198).
"""

from __future__ import annotations

import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    interpolateScale,
    prelu,
    sigmoid,
)
from moephoto_tpu.models.blocks import frm


def _cab(params: Params, p: str, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Channel attention block: Residual(conv k, PReLU, conv k, FRM)
    (MPRNet.py:14-15); Residual subclasses Sequential so children are
    indexed 0..3."""
    pad = k >> 1
    y = conv2d(params, p + ".0", x, padding=pad)
    y = prelu(params, p + ".1", y)
    y = conv2d(params, p + ".2", y, padding=pad)
    y = frm(params, p + ".3", y)
    return x + y


def _sam(params: Params, p: str, x: jnp.ndarray, xImg: jnp.ndarray):
    """Supervised attention module (MPRNet.py:19-32), kernel size 1."""
    x1 = conv2d(params, p + ".conv1", x)
    img = conv2d(params, p + ".conv2", x) + xImg
    x2 = sigmoid(conv2d(params, p + ".conv3", img))
    return x1 * x2 + x, img


def _upsampleMod(params: Params, p: str, x: jnp.ndarray, sf: float) -> jnp.ndarray:
    """UpSample/DownSample: bilinear rescale then 1x1 conv (MPRNet.py:37-40)."""
    y = interpolateScale(x, sf, "bilinear", align_corners=False)
    return conv2d(params, p + ".1", y)


def _encoder(params: Params, p: str, x: jnp.ndarray, k: int, encOuts=None, decOuts=None):
    """Encoder/ORSNet shared loop (MPRNet.py:89-97): three stages, each a
    Sequential of (resize?, CAB, CAB) with optional CSFF additions."""
    enc = []
    for i in range(3):
        pi = f"{p}.encoder.{i}"
        if i == 0:
            y = x  # nn.Identity at index 0
        else:
            y = _upsampleMod(params, f"{pi}.0", enc[-1], 0.5)
        y = _cab(params, f"{pi}.{1}", y, 3)
        y = _cab(params, f"{pi}.{2}", y, 3)
        if encOuts is not None:
            y = (
                y
                + conv2d(params, f"{p}.csff_enc.{i}", encOuts[i])
                + conv2d(params, f"{p}.csff_dec.{i}", decOuts[i])
            )
        enc.append(y)
    return enc


def _decoder(params: Params, p: str, outs):
    """Decoder (MPRNet.py:99-120)."""
    dec = [None, None, None]
    x = None
    for i in range(2, -1, -1):
        enc = outs[i]
        if i < 2:
            skip = _cab(params, f"{p}.skip_attn.{i}", enc, 3)
            x = _upsampleMod(params, f"{p}.up.{i}.up", x, 2.0) + skip
        else:
            x = enc
        x = _cab(params, f"{p}.decoder.{i}.0", x, 3)
        x = _cab(params, f"{p}.decoder.{i}.1", x, 3)
        dec[i] = x
    return dec


def _orsnet(params: Params, p: str, x: jnp.ndarray, encOuts, decOuts, numCab: int):
    """ORSNet (MPRNet.py:128-145): three ORBs with per-stage 1x1-fused
    encoder/decoder features upsampled to original resolution."""

    def convEncDec(which: str, i: int, feat: jnp.ndarray) -> jnp.ndarray:
        # conv_enc[i] = Sequential(ups... , 1x1 conv); genUps lengths 0,1,2
        nUps = i
        y = feat
        for j in range(nUps):
            y = _upsampleMod(params, f"{p}.{which}.{i}.{j}", y, 2.0)
        return conv2d(params, f"{p}.{which}.{i}.{nUps}", y)

    for i in range(3):
        pi = f"{p}.orb.{i}"
        y = x
        for b in range(numCab):
            y = _cab(params, f"{pi}.{b}", y, 3)
        y = conv2d(params, f"{pi}.{numCab}", y, padding=1)
        x = x + y  # ORB residual
        x = x + convEncDec("conv_enc", i, encOuts[i]) + convEncDec("conv_dec", i, decOuts[i])
    return x


def makeMPRNet(nFeat: int = 96, scaleUnetFeats: int = 48, scaleOrsnetFeats: int = 32, numCab: int = 8):
    def shallow(params: Params, i: int, x: jnp.ndarray) -> jnp.ndarray:
        y = conv2d(params, f"shallow_feat.{i}.0", x, padding=1)
        return _cab(params, f"shallow_feat.{i}.1", y, 3)

    def stage(params: Params, level: int, feat0, feat1, xImg):
        """Stage fusion (MPRNet.py:169-193): concat sibling patch features
        along W (level 0) or H (level 1), decode, SAM, re-encode."""
        axis = 2 if level == 0 else 1  # torch dim 3 - level on NCHW -> NHWC
        feat = [jnp.concatenate([p0, p1], axis=axis) for p0, p1 in zip(feat0, feat1)]
        res = _decoder(params, f"decoder.{level}", feat)
        xSam, stageImg = _sam(params, f"sam.{level}", res[0], xImg)
        x = shallow(params, level + 1, xImg)
        xCat = conv2d(
            params, f"concat.{level}", jnp.concatenate([x, xSam], -1), padding=1
        )
        if level == 0:
            featE = _encoder(params, "encoder.1", xCat, 3, feat, res)
        else:
            featE = _orsnet(params, "encoder.2", xCat, feat, res, numCab)
        return featE, stageImg

    def apply(params: Params, x3: jnp.ndarray) -> jnp.ndarray:
        b, H, W, c = x3.shape
        assert not (H & 7 or W & 7), "MPRNet needs H, W % 8 == 0"
        hh, hw = H >> 1, W >> 1
        x2top, x2bot = x3[:, :hh], x3[:, hh:]
        patches = (
            x2top[:, :, :hw],
            x2top[:, :, hw:],
            x2bot[:, :, :hw],
            x2bot[:, :, hw:],
        )
        feats1 = [
            _encoder(params, "encoder.0", shallow(params, 0, p), 3) for p in patches
        ]
        feat2top, _ = stage(params, 0, feats1[0], feats1[1], x2top)
        feat2bot, _ = stage(params, 0, feats1[2], feats1[3], x2bot)
        x3cat, _ = stage(params, 1, feat2top, feat2bot, x3)
        stage3 = conv2d(params, "tail", x3cat, padding=1)
        return jnp.clip(stage3 + x3, 0.0, 1.0)

    return apply


mprNet = makeMPRNet()  # deblurring default (dehaze.py:22)
mprNetDenoise = makeMPRNet(80, 48, 32)  # runDN.py:17
mprNetDerain = makeMPRNet(40, 20, 16)  # dehaze.py:23
