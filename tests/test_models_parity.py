"""Golden parity vs the reference torch implementations.

Real checkpoints where available (SURVEY.md section 2.2 weights list);
random-initialized reduced configs elsewhere.  Reference code is
imported read-only through tools/refshim purely to produce goldens.
"""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, needsReference

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

TOL = 5e-5


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REFERENCE):
        pytest.skip("no reference")
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    yield torch
    os.chdir(cwd)


def runPair(torch, tmod, jfn, x, convT=None):
    import jax.numpy as jnp

    from moephoto_tpu.models.api import convertStateDict

    tmod.eval()
    with torch.no_grad():
        refOut = tmod(torch.from_numpy(x))
    if isinstance(refOut, list):
        refOut = refOut[-1]
    refOut = refOut.numpy()
    npd = {k: v.numpy() for k, v in tmod.state_dict().items()}
    params = {k: jnp.asarray(v) for k, v in convertStateDict(npd, convT).items()}
    out = jfn(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert refOut.shape == out.shape
    return np.abs(refOut - out).max()


@needsReference
def test_lite2_real_weights(ref):
    torch = ref
    from MoeNet_lite2 import Net

    from moephoto_tpu.models.sr import moeNetLite2x2

    net = Net(upscale=2)
    net.load_state_dict(torch.load("model/lite/model.pth", map_location="cpu", weights_only=False))
    x = np.random.RandomState(0).rand(1, 1, 48, 40).astype(np.float32)
    assert runPair(torch, net, moeNetLite2x2, x) < TOL


@needsReference
def test_net2x_real_weights(ref):
    torch = ref
    from models import Net2x

    from moephoto_tpu.models.sr import net2x

    net = Net2x()
    net.load_state_dict(torch.load("model/a2/model_new.pth", map_location="cpu", weights_only=False))
    x = np.random.RandomState(0).rand(1, 1, 48, 40).astype(np.float32)
    assert runPair(torch, net, net2x, x) < TOL


@needsReference
def test_netdn_real_weights(ref):
    torch = ref
    from models import NetDN

    from moephoto_tpu.models.sr import netDN

    net = NetDN()
    net.load_state_dict(
        torch.load("model/dn_lite5/model_new.pth", map_location="cpu", weights_only=False)
    )
    x = np.random.RandomState(0).rand(1, 1, 48, 40).astype(np.float32)
    assert runPair(torch, net, netDN, x) < TOL


@needsReference
def test_aodnet_real_weights(ref):
    torch = ref
    from models import AODnet

    from moephoto_tpu.models.restore import aodNet

    net = AODnet()
    net.load_state_dict(
        torch.load("model/dehaze/AOD_net_epoch_relu_10.pth", map_location="cpu", weights_only=False)
    )
    x = np.random.RandomState(0).rand(1, 3, 48, 40).astype(np.float32)
    assert runPair(torch, net, aodNet, x) < TOL


@needsReference
def test_sun_demoire_real_weights(ref):
    torch = ref
    from sun_demoire import Net as SUNNet

    from moephoto_tpu.models.demoire import sunDemoire

    net = SUNNet()
    net.load_state_dict(
        torch.load("model/demoire/sun_epoch_200.pth", map_location="cpu", weights_only=False)
    )
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    assert runPair(torch, net, sunDemoire, x, convT=lambda k, s: s[2] == 4) < TOL


@needsReference
def test_rrdb_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from models import RRDBNet

    from moephoto_tpu.models.restore import makeRRDBNet

    net = RRDBNet(num_in_ch=3, num_out_ch=3, scale=4, num_block=2)
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    assert runPair(torch, net, makeRRDBNet(4, 2), x) < TOL


@needsReference
def test_nafnet_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from NAFNet import NAFNet

    from moephoto_tpu.models.nafnet import makeNAFNet

    net = NAFNet(width=8, middle_blk_num=2, enc_blk_nums=[1, 2], dec_blk_nums=[2, 1])
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    assert runPair(torch, net, makeNAFNet(8, 2, [1, 2], [2, 1]), x) < TOL


@needsReference
def test_mprnet_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from MPRNet import MPRNet

    from moephoto_tpu.models.mprnet import makeMPRNet

    net = MPRNet(n_feat=16, scale_unetfeats=8, scale_orsnetfeats=8, num_cab=2)
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    assert runPair(torch, net, makeMPRNet(16, 8, 8, 2), x) < TOL


@needsReference
def test_image_cleaning_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from models import ImageCleaning

    from moephoto_tpu.models.restore import imageCleaning

    net = ImageCleaning()
    x = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    assert runPair(torch, net, imageCleaning, x) < TOL


@needsReference
def test_sedn_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from models import SEDN

    from moephoto_tpu.models.sr import sedn

    net = SEDN()
    x = np.random.RandomState(0).rand(1, 1, 32, 32).astype(np.float32)
    # random init amplifies through 16 blocks; check relative error
    import jax.numpy as jnp

    from moephoto_tpu.models.api import convertStateDict

    net.eval()
    with torch.no_grad():
        refOut = net(torch.from_numpy(x))[-1].numpy()
    npd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = {k: jnp.asarray(v) for k, v in convertStateDict(npd).items()}
    out = sedn(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    scale = max(1.0, np.abs(refOut).max())
    assert np.abs(refOut - out).max() / scale < 1e-4

    # plane-packed execution (the production path for dns l15/l25/l50)
    # must equal channel-split: exercises the SE-fold einsum under
    # block-diagonal weights (GAP / squeeze dots / folded trans stay
    # plane-disjoint).
    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import packBlockDiag

    spec = TileSpec(tile=32, pad=4, align=8, scale=1.0, batch=4)
    img = np.random.RandomState(7).rand(40, 36, 3).astype(np.float32)
    exSplit = ModelExec(sedn, params, spec, channelSplit=True, dtype=jnp.float32)
    exPack = ModelExec(sedn, packBlockDiag(params, 2), spec, pack=2, dtype=jnp.float32)
    a = np.asarray(exSplit(jnp.asarray(img)))
    b = np.asarray(exPack(jnp.asarray(img)))
    # random init amplifies to |out|~30 over 16 blocks; rtol covers the
    # f32 reassociation between the split and packed schedules
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-3)


def _damp(torch, net, factor=0.2):
    """The custom normal(0, sqrt(2/n)) init of these nets explodes
    activations at random init; damp weights so fp32 parity is
    meaningful (real checkpoints are well-scaled)."""
    with torch.no_grad():
        for p in net.parameters():
            p.mul_(factor)
    return net


@needsReference
def test_moire_obj_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from moire_obj import Net as ObjNet

    from moephoto_tpu.models.demoire import moireObj

    net = _damp(torch, ObjNet())
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    assert runPair(torch, net, moireObj, x) < TOL


@needsReference
def test_moire_screen_gan_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from moire_screen_gan import Net as GANNet

    from moephoto_tpu.models.demoire import moireScreenGan

    net = _damp(torch, GANNet())
    # the DIN style path reduces by /256; anything below 512px hits a
    # 0-dof variance (NaN) in the reference itself — hence its align=512
    x = np.random.RandomState(0).rand(1, 3, 512, 512).astype(np.float32)
    assert runPair(torch, net, moireScreenGan, x) < TOL


@needsReference
def test_net4x_deferred_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from models import Net4x

    from moephoto_tpu.models.sr import net4x

    net = Net4x()
    x = np.random.RandomState(0).rand(1, 1, 40, 32).astype(np.float32)
    assert runPair(torch, net, net4x, x) < TOL


@needsReference
def test_net3x_deferred_arch(ref):
    torch = ref
    torch.manual_seed(0)
    from models import Net3x

    from moephoto_tpu.models.sr import net3x

    net = Net3x()
    x = np.random.RandomState(0).rand(1, 1, 40, 32).astype(np.float32)
    assert runPair(torch, net, net3x, x) < TOL


@needsReference
def test_lite8_real_weights(ref):
    torch = ref
    from MoeNet_lite2 import Net

    from moephoto_tpu.models.sr import moeNetLite2x8

    net = Net(upscale=8)
    net.load_state_dict(
        torch.load("model/lite/model_8.pth", map_location="cpu", weights_only=False)
    )
    x = np.random.RandomState(0).rand(1, 1, 24, 16).astype(np.float32)
    assert runPair(torch, net, moeNetLite2x8, x) < TOL
