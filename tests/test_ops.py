"""Custom-op correctness: adaptive LUT, bilinear warp, deformable conv."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_ailut_matches_cuda_algorithm():
    """Exact vs a direct numpy transcription of the reference CUDA
    kernel math (ailut_transform_cuda.cu:88-159)."""
    import jax.numpy as jnp

    from moephoto_tpu.ops.lut import ailutTransform

    rng = np.random.RandomState(0)
    H, W, D = 17, 13, 9
    img = rng.rand(1, H, W, 3).astype(np.float32)
    lut = rng.rand(1, 3, D, D, D).astype(np.float32)
    vert = np.sort(rng.rand(1, 3, D).astype(np.float32), axis=-1)

    out = np.asarray(ailutTransform(jnp.asarray(img), jnp.asarray(lut), jnp.asarray(vert)))

    eps = 1e-10
    ref = np.zeros_like(img)
    for y in range(H):
        for x in range(W):
            ids, ws = [], []
            for c in range(3):
                val = img[0, y, x, c]
                v = vert[0, c]
                idx = np.searchsorted(v, val, side="left")
                i0 = min(max(idx - 1, 0), D - 2)
                ids.append(i0)
                ws.append((val - v[i0]) / (v[i0 + 1] - v[i0] + eps))
            rid, gid, bid = ids
            rd, gd, bd = ws
            for c in range(3):
                L = lut[0, c]
                acc = 0.0
                for db in (0, 1):
                    for dg in (0, 1):
                        for dr in (0, 1):
                            w = (
                                (rd if dr else 1 - rd)
                                * (gd if dg else 1 - gd)
                                * (bd if db else 1 - bd)
                            )
                            acc += w * L[bid + db, gid + dg, rid + dr]
                ref[0, y, x, c] = acc
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_backwarp_zero_flow_identity():
    import jax.numpy as jnp

    from moephoto_tpu.ops.warp import backWarp

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 12, 16, 4).astype(np.float32))
    flow = jnp.zeros((1, 12, 16, 2), jnp.float32)
    out = np.asarray(backWarp(img, flow))
    # the reference normalization has a W/(W-1) quirk: zero flow maps
    # pixel x to x*(W-1)/W — not identity.  Check against the formula.
    xs = np.arange(16) * 15.0 / 16.0
    ys = np.arange(12) * 11.0 / 12.0
    x0 = np.floor(xs).astype(int)
    wx = xs - x0
    ref = np.asarray(img)
    interpX = ref[:, :, x0] * (1 - wx)[None, None, :, None] + ref[
        :, :, np.minimum(x0 + 1, 15)
    ] * wx[None, None, :, None]
    y0 = np.floor(ys).astype(int)
    wy = ys - y0
    interp = interpX[:, y0] * (1 - wy)[None, :, None, None] + interpX[
        :, np.minimum(y0 + 1, 11)
    ] * wy[None, :, None, None]
    np.testing.assert_allclose(out, interp, atol=1e-5)


def test_warp_exact_shift():
    """IFRNet-style exact-pixel warp: integer flow == array roll."""
    import jax.numpy as jnp

    from moephoto_tpu.models.ifrnet import warpExact

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 8, 10, 3).astype(np.float32))
    flow = jnp.full((1, 8, 10, 2), 0.0, jnp.float32).at[..., 0].set(2.0)
    out = np.asarray(warpExact(img, flow))
    ref = np.asarray(img)
    np.testing.assert_allclose(out[0, :, :7], ref[0, :, 2:9], atol=1e-6)


def test_deform_conv_matches_shim():
    from tests.conftest import hasReference

    if not hasReference():
        pytest.skip("no reference")
    from refshim import installStubs

    installStubs()
    import jax.numpy as jnp
    import torch
    from torchvision.ops import deform_conv2d

    from moephoto_tpu.ops.deform import deformConv2d

    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout, dg = 1, 10, 8, 8, 8, 2
    x = rng.rand(B, Cin, H, W).astype(np.float32)
    off = (rng.rand(B, 2 * dg * 9, H, W).astype(np.float32) - 0.5) * 3
    mask = rng.rand(B, dg * 9, H, W).astype(np.float32)
    wgt = rng.rand(Cout, Cin, 3, 3).astype(np.float32) * 0.1
    bias = rng.rand(Cout).astype(np.float32)
    ref = deform_conv2d(
        torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(wgt),
        torch.from_numpy(bias), stride=(1, 1), padding=(1, 1), dilation=(1, 1),
        mask=torch.from_numpy(mask),
    ).numpy()
    out = deformConv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(off.transpose(0, 2, 3, 1)),
        jnp.asarray(mask.transpose(0, 2, 3, 1)),
        jnp.asarray(wgt.transpose(2, 3, 1, 0)),
        jnp.asarray(bias),
        dg,
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_deform_conv_dense_equals_gather():
    """The bounded dense (shift-window) DCN path must equal the gather
    path bit-for-bit-ish on in-margin offsets, and the lax.cond dispatch
    must fall back to gather when any offset exceeds the margin."""
    import jax.numpy as jnp

    from moephoto_tpu.ops.deform import deformConv2d

    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout, dg = 2, 12, 9, 8, 4, 2
    x = jnp.asarray(rng.rand(B, H, W, Cin).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, dg * 9).astype(np.float32))
    wgt = jnp.asarray(rng.rand(3, 3, Cin, Cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.rand(Cout).astype(np.float32))

    offIn = jnp.asarray((rng.rand(B, H, W, 2 * dg * 9).astype(np.float32) - 0.5) * 5.8)
    dense = deformConv2d(x, offIn, mask, wgt, bias, dg, margin=3)
    gather = deformConv2d(x, offIn, mask, wgt, bias, dg, margin=0)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gather), atol=1e-5)

    # out-of-margin offsets: dispatch must select the gather branch and
    # stay exact (a dense path would clip these samples)
    offBig = offIn.at[0, 3, 4, 0].set(25.0)
    big = deformConv2d(x, offBig, mask, wgt, bias, dg, margin=3)
    bigRef = deformConv2d(x, offBig, mask, wgt, bias, dg, margin=0)
    np.testing.assert_allclose(np.asarray(big), np.asarray(bigRef), atol=1e-5)

    # sub-pixel offsets: the dispatch's M=1 fast tier (9-tap window)
    # must stay exact vs gather
    offSm = jnp.asarray((rng.rand(B, H, W, 2 * dg * 9).astype(np.float32) - 0.5) * 1.8)
    small = deformConv2d(x, offSm, mask, wgt, bias, dg, margin=3)
    smallRef = deformConv2d(x, offSm, mask, wgt, bias, dg, margin=0)
    np.testing.assert_allclose(np.asarray(small), np.asarray(smallRef), atol=1e-5)


def test_deferred_subpixel_conv():
    """deferredSubpixelConv(fine conv) == conv on the interleaved image."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models.api import deferredSubpixelConv, interleaveDeferred

    rng = np.random.RandomState(3)
    b, h, w, R, C, cin, cout = 1, 6, 5, 2, 2, 4, 3
    x = jnp.asarray(rng.rand(b, h, w, R, C, cin).astype(np.float32))
    wf = jnp.asarray(rng.rand(3, 3, cin, cout).astype(np.float32))
    out = deferredSubpixelConv(wf, x)
    outImg = np.asarray(interleaveDeferred(out))

    fine = np.asarray(interleaveDeferred(x))  # (b, h*R, w*C, cin)
    dn = jax.lax.conv_dimension_numbers(fine.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(fine), wf, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )
    )
    np.testing.assert_allclose(outImg, ref, atol=1e-5)


def test_pack_block_diag_parity():
    """Plane-packed execution equals plane-batched execution."""
    from tests.conftest import hasReference

    if not hasReference() or not os.path.exists("/root/reference/model/lite/model.pth"):
        pytest.skip("no checkpoints")
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import loadTorchWeights, packBlockDiag
    from moephoto_tpu.models.sr import netDN

    params = loadTorchWeights("/root/reference/model/dn_lite5/model_new.pth")
    spec = TileSpec(tile=64, pad=7, align=8, scale=1.0, batch=4)
    exSplit = ModelExec(netDN, params, spec, channelSplit=True, dtype=jnp.float32)
    exPack = ModelExec(netDN, packBlockDiag(params, 2), spec, pack=2, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(80, 70, 3).astype(np.float32))
    a = np.asarray(exSplit(x))
    b = np.asarray(exPack(x))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_up_heads_kernel():
    """Pallas fused up-path kernel (interpret mode) matches the XLA
    nested-deferred path bit-for-bit at fp32, for all lite scales."""
    import jax.numpy as jnp

    from __graft_entry__ import _lite2Params
    from moephoto_tpu.models import sr as S
    from moephoto_tpu.ops import fusedup

    for ups in (2, 4, 8):
        params = {
            k: jnp.asarray(np.asarray(v), jnp.float32)
            for k, v in _lite2Params(ups, seed=3).items()
        }
        rng = np.random.RandomState(ups)
        x = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
        ref = S.makeMoeNetLite2(ups)(params, x)
        orig = fusedup.fusedUpHeads
        fusedup.fusedUpHeads = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            got = S.makeMoeNetLite2(ups, fused=True)(params, x)
        finally:
            fusedup.fusedUpHeads = orig
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-6, err_msg=f"x{ups}"
        )


def test_warp_bounded_kernel():
    """Pallas bounded-flow warp (interpret mode) matches the exact XLA
    warp everywhere — including image borders — for both padding modes,
    and the lax.cond falls back for out-of-bound flows."""
    import jax.numpy as jnp

    from moephoto_tpu.ops import warp as Wp

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 40, 112, 3).astype(np.float32))
    flow = jnp.asarray(((rng.rand(2, 40, 112, 2) * 2 - 1) * 6.5).astype(np.float32))
    for mode in ("border", "zeros"):
        ref = np.asarray(Wp.warpXLAExact(img, flow, padding_mode=mode))
        got = np.asarray(Wp.warpBounded(img, flow, mode, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=mode)
    # medium flows take the wide M=16 kernel tier
    midFlow = flow * 2.2  # max ~14.3 < 15
    ref = np.asarray(Wp.warpXLAExact(img, midFlow, padding_mode="border"))
    got = np.asarray(Wp.warpBounded(img, midFlow, "border", interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # flows beyond the wide margin must take the exact XLA fallback branch
    bigFlow = flow * 10
    ref = np.asarray(Wp.warpXLAExact(img, bigFlow, padding_mode="border"))
    got = np.asarray(Wp.warpBounded(img, bigFlow, "border", interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_backwarp_bounded_matches_backwarp():
    """backWarpBounded (normalization quirk folded into a pixel-offset
    flow, Pallas interpret) == backWarp exactly — SpyNet's pyramid-warp
    production path."""
    import jax.numpy as jnp

    from moephoto_tpu.ops import warp as Wp

    rng = np.random.RandomState(11)
    B, H, W, C = 2, 24, 40, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    flow = jnp.asarray(((rng.rand(B, H, W, 2) - 0.5) * 8).astype(np.float32))
    ref = np.asarray(Wp.backWarp(img, flow, padding_mode="border"))
    got = np.asarray(Wp.backWarpBounded(img, flow, "border", interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5)
    # large flows must agree through the XLA fallback tier too
    big = flow * 8
    ref = np.asarray(Wp.backWarp(img, big, padding_mode="border"))
    got = np.asarray(Wp.backWarpBounded(img, big, "border", interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_dcn_pallas_kernel_matches_gather():
    """Pallas DCN sampling kernel (interpret mode) == exact gather path
    for in-margin offsets, both deformable-group layouts."""
    import jax.numpy as jnp

    from moephoto_tpu.ops.dcnkernel import dcnDensePallas
    from moephoto_tpu.ops.deform import _deformConvGather

    rng = np.random.RandomState(3)
    B, H, W, Cin, Cout, dg, K = 2, 16, 12, 16, 8, 4, 9
    x = jnp.asarray(rng.rand(B, H, W, Cin).astype(np.float32))
    off = jnp.asarray(((rng.rand(B, H, W, dg, K, 2) - 0.5) * 5.8).astype(np.float32))
    m = jnp.asarray(rng.rand(B, H, W, dg, K).astype(np.float32))
    wgt = jnp.asarray(rng.rand(3, 3, Cin, Cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.rand(Cout).astype(np.float32))

    ref = _deformConvGather(x, off, m, wgt, bias, dg, 1, 1)
    got = dcnDensePallas(x, off, m, wgt, bias, dg, margin=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # W > _TW exercises the column-blocked grid (overlapping col slabs +
    # right-pad) — nCl = 2 with a 56-px ragged tail
    B, H, W = 1, 8, 184
    x = jnp.asarray(rng.rand(B, H, W, Cin).astype(np.float32))
    off = jnp.asarray(((rng.rand(B, H, W, dg, K, 2) - 0.5) * 5.8).astype(np.float32))
    m = jnp.asarray(rng.rand(B, H, W, dg, K).astype(np.float32))
    ref = _deformConvGather(x, off, m, wgt, bias, dg, 1, 1)
    got = dcnDensePallas(x, off, m, wgt, bias, dg, margin=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(
    not os.environ.get("MOEPHOTO_CHIP_TESTS"),
    reason="on-chip kernel parity gate (set MOEPHOTO_CHIP_TESTS=1; needs the real TPU)",
)
def test_onchip_kernel_parity():
    """Every production Pallas kernel vs its interpret-mode (XLA-exact)
    execution ON THE REAL CHIP — catches Mosaic miscompiles that CPU
    interpret tests cannot see (VERDICT round-2 item 6).  bench.py runs
    the same gate every sweep (kernel_parity_maxabs)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import chipparity

    results = chipparity.runAll()
    chipparity.assertAll(results)


def test_ailut_pallas_kernel_matches_xla():
    """Pallas hat-matmul LUT kernel (interpret mode) vs the XLA
    transform (itself bit-matched to the CUDA algorithm above).  The
    kernel's main contraction runs bf16 on the MXU by design — tolerance
    covers that rounding (ops/lutkernel.py docstring)."""
    import functools

    import jax.numpy as jnp

    from moephoto_tpu.ops.lut import ailutTransform
    from moephoto_tpu.ops.lutkernel import ailutTransformPallas

    rng = np.random.RandomState(3)
    D, C = 33, 3
    img = jnp.asarray(rng.rand(2, 40, 64, 3).astype(np.float32))
    lut = jnp.asarray(rng.rand(2, C, D, D, D).astype(np.float32))
    iv = rng.rand(2, 3, D - 1).astype(np.float32)
    iv = iv / iv.sum(-1, keepdims=True)
    vert = jnp.asarray(np.pad(np.cumsum(iv, -1), ((0, 0), (0, 0), (1, 0))))
    ref = np.asarray(ailutTransform(img, lut, vert))
    got = np.asarray(
        functools.partial(ailutTransformPallas, interpret=True)(img, lut, vert)
    )
    assert np.abs(ref - got).max() < 1e-2

    from moephoto_tpu.ops.lutkernel import ailutTransformPallasT

    gotT = np.asarray(
        functools.partial(ailutTransformPallasT, interpret=True)(img, lut, vert)
    )
    assert np.abs(ref - gotT).max() < 1e-2


def test_ailut_pallas_kernel_extrapolates_out_of_range():
    """Out-of-range inputs must LINEARLY EXTRAPOLATE like the CUDA
    algorithm (ailut_transform_cuda.cu:88-159 keeps the unclamped
    fraction in the clamped edge bin) — chain 4 feeds AiLUT unclipped
    AOD-dehaze output, and a clamping kernel silently cost ~2 dB there
    (docs/PERF.md round-4 attribution).  Random in-range tests cannot
    catch this; this one spans [-0.4, 1.5]."""
    import functools

    import jax.numpy as jnp

    from moephoto_tpu.ops.lut import ailutTransform
    from moephoto_tpu.ops.lutkernel import ailutTransformPallasT

    rng = np.random.RandomState(7)
    D, C = 33, 3
    img = jnp.asarray((rng.rand(1, 24, 64, 3) * 1.9 - 0.4).astype(np.float32))
    lut = jnp.asarray(rng.rand(1, C, D, D, D).astype(np.float32))
    iv = rng.rand(1, 3, D - 1).astype(np.float32)
    iv = iv / iv.sum(-1, keepdims=True)
    vert = jnp.asarray(np.pad(np.cumsum(iv, -1), ((0, 0), (0, 0), (1, 0))))
    ref = np.asarray(ailutTransform(img, lut, vert))
    # extrapolated magnitudes exceed the LUT range — scale the tolerance
    scale = max(1.0, np.abs(ref).max())
    for exact in (True, False):
        got = np.asarray(
            functools.partial(ailutTransformPallasT, interpret=True, exact=exact)(
                img, lut, vert
            )
        )
        assert np.abs(ref - got).max() / scale < (1e-4 if exact else 1e-2), exact


def test_resize_bilinear_2x_phase_matches_jax_image():
    """resizeBilinear2x (phase adds + interleave, models/api.py) must be
    numerically identical to jax.image.resize bilinear at scale 2 —
    it replaces it inside the EDVR PCD/TSA programs where the dense
    interpolation-matrix lowering measured 183 ms/slab of fusion loss
    (round 5, docs/PERF.md).  Odd sizes + a batch-leading layout cover
    the edge-clamp phases; reference semantics: torch F.interpolate
    align_corners=False as used by videoSR.py:199-204,289-295."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models.api import resizeBilinear2x

    rng = np.random.RandomState(11)
    for shape in ((2, 5, 7, 3), (14, 24, 40, 64), (1, 1, 2, 2)):
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))
        want = jax.image.resize(
            x, shape[:-3] + (2 * shape[-3], 2 * shape[-2], shape[-1]),
            "bilinear", antialias=False,
        )
        got = resizeBilinear2x(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=5e-7
        )


def test_spynet_packed_convs_match_fine_path():
    """The 2x2-packed SpyNet basic_module (5x5 phase-scattered convs,
    models/iconvsr.py _spyModulePacked — the chip tier) must match the
    fine 7x7 conv stack: packing is an exact kernel re-indexing (each
    packed slot holds at most one fine tap), so fp32 outputs agree to
    reassociation error.  Reference semantics: videoSR.py:87-137
    (SpyNet BasicModule, 5 convs 8->32->64->32->16->2, pad 3)."""
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models import iconvsr as JV
    from moephoto_tpu.models.api import conv2d

    params = JV.synthParams(3)
    rng = np.random.RandomState(9)
    for level, (H, W) in ((0, (12, 20)), (4, (32, 64))):
        inp = jnp.asarray(rng.rand(2, H, W, 8).astype(np.float32) - 0.3)
        y = inp
        p = f"spynet.basic_module.{level}"
        for j in range(0, 9, 2):
            y = conv2d(params, f"{p}.{j}", y, padding=3)
            if j < 8:
                y = jax.nn.relu(y)
        got = JV._spyModulePacked(params, level, inp)
        assert got.shape == y.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(y), rtol=0, atol=2e-5
        )
