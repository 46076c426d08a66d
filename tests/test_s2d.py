"""Space-to-depth domain transform parity (models/s2d.py).

The transformed model must equal the original graph up to f32 summation
order; reference behavior itself is covered by the torch parity tests,
so equality to the plain-JAX graph is the complete check here.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _rand(rng, *shape):
    return jnp.asarray((rng.rand(*shape).astype(np.float32) - 0.5) * 0.3)


def _netdnParams(rng, c=48):
    p = {}

    def conv(key, cin, cout):
        p[key + ".weight"] = _rand(rng, 3, 3, cin, cout)
        p[key + ".bias"] = _rand(rng, cout)

    conv("conv_input", 1, c)
    # the MyNet family uses scalar nn.PReLU() slopes (shape (1,))
    p["relu.weight"] = jnp.asarray(rng.rand(1).astype(np.float32) * 0.4)
    conv("conv_input2", c, c)
    for i in range(6):
        pref = f"convt_F{i + 1}.0"
        conv(pref + ".conv_1", c, c)
        p[pref + ".relu.weight"] = jnp.asarray(rng.rand(1).astype(np.float32) * 0.4)
        conv(pref + ".conv_2", c, c)
        p[pref + ".scale.scale"] = jnp.asarray(
            rng.rand(1).astype(np.float32) * 0.5 + 0.5
        )
    conv("u", c, 1)
    conv("convt_R1", c, 1)
    return p


def test_s2d_roundtrip():
    from moephoto_tpu.models.s2d import depthToSpace2, spaceToDepth2

    rng = np.random.RandomState(0)
    x = _rand(rng, 2, 8, 12, 5)
    np.testing.assert_array_equal(
        np.asarray(depthToSpace2(spaceToDepth2(x))), np.asarray(x)
    )


def test_s2d_conv3x3_parity():
    """A SAME 3x3 conv equals its s2d-domain transform everywhere,
    including the zero-padded border ring."""
    import jax

    from moephoto_tpu.models.s2d import (
        depthToSpace2,
        s2dConv3x3Weight,
        s2dTileVec,
        spaceToDepth2,
    )

    rng = np.random.RandomState(1)
    x = _rand(rng, 2, 16, 24, 5)
    w = _rand(rng, 3, 3, 5, 7)
    b = _rand(rng, 7)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn) + b
    w2 = s2dConv3x3Weight(w)
    x2 = spaceToDepth2(x)
    dn2 = jax.lax.conv_dimension_numbers(x2.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    got = jax.lax.conv_general_dilated(x2, w2, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn2) + s2dTileVec(b)
    np.testing.assert_allclose(
        np.asarray(depthToSpace2(got)), np.asarray(ref), atol=2e-6
    )


def test_netdn_s2d_parity():
    from moephoto_tpu.models.sr import netDN, netDNS2d, netDNS2dParams

    rng = np.random.RandomState(2)
    p = _netdnParams(rng)
    x = _rand(rng, 2, 32, 40, 1)
    ref = np.asarray(netDN(p, x))
    got = np.asarray(netDNS2d(netDNS2dParams(p), x))
    # f32 summation-order drift compounds over the 14-conv chain (the
    # single-conv check above is exact to 2e-6)
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_netdn_s2d_parity_packed():
    """s2d composes with pack=2 block-diagonal plane packing."""
    from moephoto_tpu.models.api import packBlockDiag
    from moephoto_tpu.models.sr import netDN, netDNS2d, netDNS2dParams

    rng = np.random.RandomState(3)
    p = _netdnParams(rng)
    pp = packBlockDiag(p, 2)
    x = _rand(rng, 2, 32, 40, 2)  # 2 planes packed on channels
    ref = np.asarray(netDN(pp, x))
    got = np.asarray(netDNS2d(netDNS2dParams(pp), x))
    np.testing.assert_allclose(got, ref, atol=3e-4)
