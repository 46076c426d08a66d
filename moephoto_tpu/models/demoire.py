"""Demoire models: sun_demoire, moire_obj, moire_screen_gan.

Reference: ``python/sun_demoire.py``, ``python/moire_obj.py``,
``python/moire_screen_gan.py``.  The nested functional combinators of
the reference (``toModule``/``UNet``) are flattened here into explicit
key paths; see each function's docstring for the torch key layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from moephoto_tpu.models.api import (
    Params,
    conv2d,
    convTranspose2d,
    prelu,
    scaleLayer,
)
from moephoto_tpu.models.blocks import carb, frm, upsampleBlock

# ---------------------------------------------------------------------------
# sun_demoire
# ---------------------------------------------------------------------------


def sunDemoire(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """5-scale downsample with per-scale upconv branches, summed
    (sun_demoire.py:23-33).

    downs.{i}: Down(cin, cm, cout) — stride 2 iff cin == cm.
    branches.0: Sequential(conv3x3, PReLU); branches.{i>0}: alternating
    (ConvTranspose 4/2/1, PReLU) pairs then conv3x3 to RGB.
    """
    downCfg = [(3, 32, 32), (32, 32, 64), (64, 64, 64), (64, 64, 64), (64, 64, 64)]
    branchLens = [0, 1, 2, 3, 4]  # number of convT stages per branch
    feat = x
    total = 0.0
    for i, ((cin, cm, cout), nUp) in enumerate(zip(downCfg, branchLens)):
        stride = 2 if cin == cm else 1
        p = f"downs.{i}"
        out = prelu(params, p + ".relu", conv2d(params, p + ".down", feat, stride=stride, padding=1))
        feat = conv2d(params, p + ".convt_R1", out, padding=1)
        bp = f"branches.{i}"
        if i == 0:
            b = prelu(params, bp + ".1", conv2d(params, bp + ".0", feat, padding=1))
        else:
            b = feat
            for j in range(nUp):
                b = convTranspose2d(params, f"{bp}.{2 * j}", b, stride=2, padding=1)
                b = prelu(params, f"{bp}.{2 * j + 1}", b)
            b = conv2d(params, f"{bp}.{2 * nUp}", b, padding=1)
        total = total + b
    return total


# ---------------------------------------------------------------------------
# moire_obj
# ---------------------------------------------------------------------------


def _rk3(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """Runge-Kutta-3 block (moire_obj.py:9-22)."""

    def trans(i, v):
        y = prelu(params, f"{p}.ms.{i}.0", v)
        return conv2d(params, f"{p}.ms.{i}.1", y, padding=1)

    sc = lambda i, v: scaleLayer(params, f"{p}.scale.{i}", v)
    k1 = trans(0, x)
    yn1 = sc(0, k1) + x
    k2 = trans(1, yn1)
    yn2 = sc(1, k2) + sc(2, k1) + x
    k3 = trans(2, yn2)
    return sc(3, k2) + sc(4, k3 + k1) + x


def _spaceAttention(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """Space attention, kernel=stride=1 variant (models.py:225-268):
    full softmax attention over spatial positions."""
    b, h, w, c = x.shape
    K = conv2d(params, p + ".K", x)
    Q = conv2d(params, p + ".Q", x)
    V = conv2d(params, p + ".V", x)
    Kr = K.reshape(b, h * w, c)  # (b, hw, c) — torch K_reshape.permute
    Qr = Q.reshape(b, h * w, c)
    Vr = V.reshape(b, h * w, c)
    att = jnp.einsum("bnc,bmc->bnm", Kr, Qr, preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
    O = jnp.einsum("bnm,bmc->bnc", att, Vr, preferred_element_type=jnp.float32).astype(
        x.dtype
    )
    O = O.reshape(b, h, w, c)
    W = conv2d(params, p + ".local_weight", O)
    return x + W


def _cat(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """CAT: FRM then 1x1 halving conv (models.py:293-294)."""
    y = frm(params, p + ".0", x)
    return conv2d(params, p + ".1", y)


def _down2Obj(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """moire_obj Down2 (moire_obj.py:24-29): conv, PReLU, stride-2 conv,
    conv, CARB."""
    y = prelu(params, p + ".relu", conv2d(params, p + ".conv_input", x, padding=1))
    y = conv2d(params, p + ".down", y, stride=2, padding=1)
    y = conv2d(params, p + ".convt_R1", y, padding=1)
    return carb(params, p + ".block", y)


def _objBranch(
    params: Params,
    p: str,
    x: jnp.ndarray,
    deep: Sequence[str],
    t: Optional[Tuple] = None,
    cat: bool = True,
    combine: Optional[Sequence[str]] = None,
    upAfterCombine: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """moire_obj Branch (moire_obj.py:31-56).

    ``deep`` lists the deepF stage kinds in order ('sa'|'carb'|'rk3');
    when ``cat`` the deepF is prefixed by a CAT stage fed with
    concat(shallow features, t[1])."""
    out = prelu(params, p + ".inputF.relu", conv2d(params, p + ".inputF.conv_input", x, padding=1))
    if cat:
        s = out
        for i in range(5):
            s = carb(params, f"{p}.shallowF.{i}", s)
        fu = jnp.concatenate([s, t[1]], axis=-1)
        stages = ["cat"] + list(deep)
    else:
        fu = out
        stages = list(deep)
    y = fu
    for i, kind in enumerate(stages):
        sp = f"{p}.deepF.{i}"
        if kind == "cat":
            y = _cat(params, sp, y)
        elif kind == "sa":
            y = _spaceAttention(params, sp, y)
        elif kind == "carb":
            y = carb(params, sp, y)
        elif kind == "rk3":
            y = _rk3(params, sp, y)
    if combine is not None:
        z = out + y
        z = _spaceAttention(params, f"{p}.combineF.SA2", z)
        z = upsampleBlock(params, f"{p}.combineF.u1", z, 2)
        return z, z
    return y, y


def moireObj(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nested-UNet demoire (moire_obj.py:74-79).

    Key layout (from the toModule combinator): outer level under ``U.``,
    middle under ``U.3.``, inner under ``U.3.3.``; head ``to_clean1``.
    """
    # inner: SA3 -> branch3 (cat=False, no skip input)
    x1 = _down2Obj(params, "U.down2_1", x)
    x2 = _down2Obj(params, "U.3.down2_2", x1)
    x3 = _spaceAttention(params, "U.3.3.SA3", x2)
    t3 = _objBranch(
        params,
        "U.3.3.branch3",
        x3,
        deep=["carb"] * 7 + ["rk3"] * 3,
        cat=False,
        combine=["sa", "up"],
    )
    # middle: branch2(SA2(x1), t3)
    x1d = _spaceAttention(params, "U.3.SA2", x1)
    t2 = _objBranch(
        params,
        "U.3.branch2",
        x1d,
        deep=["sa"] + ["carb"] * 7 + ["rk3"] * 2,
        t=t3,
        cat=True,
        combine=["sa", "up"],
    )
    # outer: branch1(x, t2)
    t1 = _objBranch(
        params,
        "U.branch1",
        x,
        deep=["carb"] * 7 + ["rk3"] * 2,
        t=t2,
        cat=True,
        combine=None,
    )
    y = t1[0]
    # to_clean1 (moire_obj.py:67-72): Residual(gff,relu,se), conv_tail,
    # PReLU, conv_out
    p = "to_clean1"
    r = conv2d(params, p + ".residual.0.gff", y, padding=1)
    r = prelu(params, p + ".residual.0.relu", r)
    r = frm(params, p + ".residual.0.se", r)
    y = y + r
    y = conv2d(params, p + ".conv_tail", y, padding=1)
    y = prelu(params, p + ".relut", y)
    return conv2d(params, p + ".conv_out", y, padding=1)


# ---------------------------------------------------------------------------
# moire_screen_gan
# ---------------------------------------------------------------------------


def _calcMeanStd(feat: jnp.ndarray, eps: float = 1e-4):
    f32 = feat.astype(jnp.float32)
    b, h, w, c = feat.shape
    flat = f32.reshape(b, h * w, c)
    mean = jnp.mean(flat, axis=1, keepdims=True).reshape(b, 1, 1, c)
    # torch .var() default unbiased (N-1)
    var = jnp.var(flat, axis=1, keepdims=True, ddof=1).reshape(b, 1, 1, c)
    return mean, jnp.sqrt(var)


def _din(content: jnp.ndarray, encode: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Dynamic instance normalization (moire_screen_gan.py:16-21)."""
    cMean, cStd = _calcMeanStd(content)
    eMean, eStd = _calcMeanStd(encode)
    norm = (content.astype(jnp.float32) - cMean) / (cStd + eps)
    return (norm * eStd + eMean).astype(content.dtype)


def _nonlocalBlock(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """Embedded-gaussian non-local 2D block, no subsample/bn
    (models.py:317-386 via Nonlocal_CA with sub_sample=False,
    bn_layer=False)."""
    b, h, w, c = x.shape
    g = conv2d(params, p + ".g", x).reshape(b, h * w, -1)
    theta = conv2d(params, p + ".theta", x).reshape(b, h * w, -1)
    phi = conv2d(params, p + ".phi", x).reshape(b, h * w, -1)
    f = jnp.einsum("bnc,bmc->bnm", theta, phi, preferred_element_type=jnp.float32)
    f = jax.nn.softmax(f, axis=-1).astype(x.dtype)
    y = jnp.einsum("bnm,bmc->bnc", f, g, preferred_element_type=jnp.float32).astype(
        x.dtype
    )
    y = y.reshape(b, h, w, -1)
    return conv2d(params, p + ".W", y) + x


def _nonlocalCA(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """Nonlocal_CA (models.py:389-405): quarter the map, nonlocal each."""
    b, h, w, c = x.shape
    h1, w1 = h // 2, w // 2
    quads = [
        x[:, :h1, :w1],
        x[:, :h1, w1:],
        x[:, h1:, :w1],
        x[:, h1:, w1:],
    ]
    outs = [_nonlocalBlock(params, p + ".non_local", q) for q in quads]
    top = jnp.concatenate(outs[:2], axis=2)
    bot = jnp.concatenate(outs[2:], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _down2Gan(params: Params, p: str, x: jnp.ndarray) -> jnp.ndarray:
    """moire_screen_gan Down2 (moire_screen_gan.py:23-27) — no CARB."""
    y = prelu(params, p + ".relu", conv2d(params, p + ".conv_input", x, padding=1))
    y = conv2d(params, p + ".down", y, stride=2, padding=1)
    return conv2d(params, p + ".convt_R1", y, padding=1)


def _ganBranch(
    params: Params, p: str, x: jnp.ndarray, strides: Sequence[int], nUps: int, nonLocal: bool
) -> jnp.ndarray:
    """moire_screen_gan Branch (moire_screen_gan.py:36-61): CARB chain
    coupled with style-encoder convs through DIN."""
    out = prelu(params, p + ".relu", conv2d(params, p + ".conv_input", x, padding=1))
    feat, style = out, out
    for i, s in enumerate(strides):
        feat = carb(params, f"{p}.convt_F.{i}", feat)
        style = conv2d(params, f"{p}.s_conv.{i}", style, stride=s, padding=1)
        feat = _din(feat, style)
    nl = _nonlocalCA(params, p + ".non_local", feat) if nonLocal else feat
    combine = out + nl
    up = combine
    for i in range(nUps):
        up = upsampleBlock(params, f"{p}.u.{i}", up, 2)
    return conv2d(params, p + ".convt_shape1", up, padding=1)


_GAN_BRANCHES = [
    None,  # Branch1 is a plain conv stack
    dict(strides=(1, 2, 2), nUps=1, nonLocal=False),
    dict(strides=(1, 2, 1, 2), nUps=2, nonLocal=True),
    dict(strides=(1, 2, 1, 2, 1, 2), nUps=3, nonLocal=True),
    dict(strides=(1, 2, 1, 2, 1, 2, 1, 2), nUps=4, nonLocal=True),
    dict(strides=(1, 1, 2, 1, 1, 2, 1, 1), nUps=5, nonLocal=True),
]


def makeMoireScreenGan(layers: int = 5):
    def apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
        feat = x
        total = 0.0
        for i in range(layers):
            bp = f"branches.{i}"
            if i == 0:
                b = prelu(params, bp + ".relu", conv2d(params, bp + ".conv_input", feat, padding=1))
                b = conv2d(params, bp + ".conv_input2", b, padding=1)
            else:
                cfg = _GAN_BRANCHES[i]
                b = _ganBranch(params, bp, feat, **cfg)
            total = total + scaleLayer(params, f"scales.{i}", b)
            if i < layers - 1:
                feat = _down2Gan(params, f"_down2.{i}", feat)
        return total

    return apply


moireScreenGan = makeMoireScreenGan(5)
