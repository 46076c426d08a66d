"""Tile-engine correctness: tiled(f, x) must equal f(x) for functions
that are shift-invariant within the halo radius (SURVEY.md section 7,
phase 2 property tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moephoto_tpu.engine.tiling import (
    TileSpec,
    blendWindow,
    planAxis,
    reflectPadHW,
    tiledApply,
)


def test_plan_axis_covers():
    for size in (10, 64, 100, 257, 1000):
        for tile, pad in ((64, 8), (128, 16), (256, 5)):
            anchors = planAxis(size, tile, pad)
            assert anchors[0] == 0
            # consecutive tiles overlap by 2*pad
            for a, b in zip(anchors, anchors[1:]):
                assert b - a == tile - 2 * pad
            if size > tile:
                assert anchors[-1] + tile >= size


def test_blend_window_partition_of_unity():
    """Neighbouring interior tiles' windows sum to exactly 1 across the
    2*pad overlap (sigmoid symmetry), and the discarded outer margin has
    zero weight."""
    th, pad = 64, 8
    win = np.asarray(blendWindow(th, th, pad))
    d = pad // 2
    assert (win[:, :d] == 0).all() and (win[:, -d:] == 0).all()
    np.testing.assert_allclose(win[th // 2, pad + d : -(pad + d)], 1.0, atol=1e-6)
    stride = th - 2 * pad
    row = th // 2
    wa = np.asarray(blendWindow(th, th, pad, edges=(True, True, True, False)))[row]
    wb = np.asarray(blendWindow(th, th, pad, edges=(True, True, False, True)))[row]
    overlap = wa[stride:] + wb[: 2 * pad]
    np.testing.assert_allclose(overlap, 1.0, atol=1e-6)


def test_blend_window_edge_tiles():
    """Boundary sides keep weight 1 to the very edge."""
    th, pad = 64, 8
    win = np.asarray(blendWindow(th, th, pad, edges=(True, False, True, False)))
    np.testing.assert_allclose(win[0, 0], 1.0, atol=1e-6)
    assert win[-1, -1] == 0


def test_pointwise_exact():
    fn = lambda t: t * 2.0 + 0.125
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(100, 83, 3).astype(np.float32))
    spec = TileSpec(tile=64, pad=8, align=8, scale=1.0, batch=4)
    out = tiledApply(x, fn, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2 + 0.125, atol=1e-5)


def _blur(t):
    """3x3 depthwise box blur, SAME zero padding."""
    c = t.shape[-1]
    k = jnp.ones((3, 3, 1, c), t.dtype) / 9.0
    dn = jax.lax.conv_dimension_numbers(t.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        t, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn, feature_group_count=c
    )


def test_conv_matches_global_interior():
    """Tiled conv equals global conv everywhere except the 1px zero-pad
    frontier (halo pad 8 >> kernel radius 1)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(120, 90, 3).astype(np.float32))
    spec = TileSpec(tile=64, pad=8, align=8, scale=1.0, batch=4)
    out = np.asarray(tiledApply(x, _blur, spec))
    ref = np.asarray(_blur(x[None])[0])
    np.testing.assert_allclose(out[1:-1, 1:-1], ref[1:-1, 1:-1], atol=2e-5)


def test_upscale_fn():
    """2x nearest upscale through the tile engine."""

    def up2(t):
        b, h, w, c = t.shape
        t = t[:, :, None, :, None, :]
        t = jnp.broadcast_to(t, (b, h, 2, w, 2, c))
        return t.reshape(b, h * 2, w * 2, c)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(70, 51, 3).astype(np.float32))
    spec = TileSpec(tile=32, pad=4, align=8, scale=2.0, batch=4)
    out = np.asarray(tiledApply(x, up2, spec))
    ref = np.asarray(up2(x[None])[0])
    assert out.shape == ref.shape == (140, 102, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_small_image_single_tile():
    fn = lambda t: t + 1.0
    x = jnp.zeros((10, 12, 3), jnp.float32)
    spec = TileSpec(tile=64, pad=8, align=8, scale=1.0, batch=2)
    out = np.asarray(tiledApply(x, fn, spec))
    assert out.shape == (10, 12, 3)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_reflect_pad_large():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    y = reflectPadHW(x, 5, 6)
    assert y.shape == (8, 10, 1)
