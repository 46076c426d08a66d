"""End-to-end step-JSON pipeline tests (genProcess image path)."""

import io
import os

import numpy as np
import pytest

from tests.conftest import needsReference

weightsExist = os.path.exists("/root/reference/model/lite/model.pth")


@pytest.fixture()
def ctx(tmp_path):
    from moephoto_tpu.runtime.context import context

    context.imageMode = "RGB"
    return context


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_image_sr_chain(ctx, tmp_path):
    """file -> SR lite x2 -> output (BASELINE config 1 shape check +
    determinism)."""
    from PIL import Image

    from moephoto_tpu.pipeline.steps import genProcess

    rng = np.random.RandomState(0)
    img = (rng.rand(40, 32, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data = buf.getvalue()
    ctx.sharedView = memoryview(data)

    outFile = str(tmp_path / "out.png")
    steps = [
        {"op": "file"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile},
    ]
    process, nodes = genProcess(steps)
    name = process(len(data), name=outFile)
    out = np.array(Image.open(outFile))
    assert out.shape == (80, 64, 3)


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_image_sr_psnr_vs_reference(ctx, tmp_path):
    """PSNR gate vs the reference torch output (BASELINE: <=0.05 dB)."""
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        from MoeNet_lite2 import Net
    finally:
        os.chdir(cwd)
    from PIL import Image

    from moephoto_tpu.pipeline.steps import genProcess

    rng = np.random.RandomState(1)
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    gt = img.astype(np.float32) / 255.0

    # reference output: per-channel Y model on each RGB plane
    net = Net(upscale=2)
    net.load_state_dict(
        torch.load("/root/reference/model/lite/model.pth", map_location="cpu", weights_only=False)
    )
    net.eval()
    x = torch.from_numpy(gt.transpose(2, 0, 1)).unsqueeze(1)  # (3,1,H,W)
    with torch.no_grad():
        refOut = net(x)[0].squeeze(1).numpy().transpose(1, 2, 0)
    refOut = np.clip(refOut, 0, 1)

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data = buf.getvalue()
    ctx.sharedView = memoryview(data)
    outFile = str(tmp_path / "out.png")
    steps = [
        {"op": "file"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile},
    ]
    process, nodes = genProcess(steps)
    process(len(data), name=outFile)
    ours = np.array(Image.open(outFile)).astype(np.float32) / 255.0

    mse = np.mean((ours - refOut) ** 2)
    psnrDelta = 10 * np.log10(1.0 / max(mse, 1e-12))
    # our output vs reference output should be ~identical (>=50 dB)
    assert psnrDelta > 45, psnrDelta


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_chain_dn_sr_resize(ctx, tmp_path):
    from PIL import Image

    from moephoto_tpu.pipeline.steps import genProcess

    rng = np.random.RandomState(2)
    img = (rng.rand(50, 40, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data = buf.getvalue()
    ctx.sharedView = memoryview(data)
    outFile = str(tmp_path / "out.png")
    steps = [
        {"op": "file"},
        {"op": "DN", "model": "lite5", "strength": 0.7},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "resize", "scaleW": 0.5, "scaleH": 0.5},
        {"op": "output", "file": outFile},
    ]
    process, nodes = genProcess(steps)
    process(len(data), name=outFile)
    out = np.array(Image.open(outFile))
    assert out.shape == (50, 40, 3)


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_alpha_passthrough(ctx, tmp_path):
    from PIL import Image

    from moephoto_tpu.pipeline.steps import genProcess

    rng = np.random.RandomState(3)
    img = (rng.rand(32, 30, 4) * 255).astype(np.uint8)
    img[..., 3] = np.minimum(img[..., 3], 254)  # keep a real alpha
    buf = io.BytesIO()
    Image.fromarray(img, "RGBA").save(buf, format="PNG")
    data = buf.getvalue()
    ctx.sharedView = memoryview(data)
    outFile = str(tmp_path / "out.png")
    steps = [
        {"op": "file"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile},
    ]
    process, nodes = genProcess(steps)
    process(len(data), name=outFile)
    out = np.array(Image.open(outFile))
    assert out.shape == (64, 60, 4)


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_bf16_quality_gate(ctx):
    """Production bf16 output stays within 40 dB of the fp32 reference
    path (BASELINE: PSNR deviation <= 0.05 dB; outputs this close can
    shift PSNR-vs-ground-truth by far less than that)."""
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import loadTorchWeights, setPrecision
    from moephoto_tpu.models.sr import moeNetLite2x2

    params32 = loadTorchWeights("/root/reference/model/lite/model.pth")
    params16 = {
        k: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v
        for k, v in params32.items()
    }
    spec = TileSpec(tile=64, pad=5, align=8, scale=2.0, batch=4)
    ex32 = ModelExec(moeNetLite2x2, params32, spec, channelSplit=True, dtype=jnp.float32)
    ex16 = ModelExec(moeNetLite2x2, params16, spec, channelSplit=True, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = np.random.RandomState(5).rand(90, 70, 3).astype(np.float32)
    try:
        setPrecision("default")  # production MXU mode for the bf16 run
        y16 = np.asarray(ex16(x))
    finally:
        setPrecision("highest")
    y32 = np.asarray(ex32(x))
    mse = np.mean((np.clip(y16, 0, 1) - np.clip(y32, 0, 1)) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40, psnr


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_sr_ensemble(ctx, tmp_path):
    """8-way self-ensemble path runs and stays close to the plain output."""
    import jax.numpy as jnp

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.engine.tiling import TileSpec
    from moephoto_tpu.models.api import loadTorchWeights
    from moephoto_tpu.models.sr import moeNetLite2x2

    params = loadTorchWeights("/root/reference/model/lite/model.pth")
    spec = TileSpec(tile=64, pad=5, align=8, scale=2.0, batch=4)
    plain = ModelExec(moeNetLite2x2, params, spec, channelSplit=True, dtype=jnp.float32)
    ens = ModelExec(
        moeNetLite2x2, params, spec, channelSplit=True, ensemble=3, dtype=jnp.float32
    )
    x = np.random.RandomState(9).rand(40, 48, 3).astype(np.float32)
    a = np.asarray(plain(x))
    b = np.asarray(ens(x))
    assert a.shape == b.shape == (80, 96, 3)
    # ensemble averages dihedral views: close to, but not equal to, plain
    assert np.abs(a - b).mean() < 0.05


def test_resize_bicubic(ctx):
    from moephoto_tpu.pipeline.steps import resizeStep

    import jax.numpy as jnp

    f = resizeStep({"width": 16, "height": 12, "method": "bicubic"}, {"source": 0})
    out = f(jnp.ones((24, 32, 3), jnp.float32))
    assert out.shape == (12, 16, 3)


def test_bench_mode_emits_op_stats(ctx, tmp_path, monkeypatch):
    """diagnose.bench=True -> /msg notes carry {op, weight, samples}
    (consumed by the frontend bench score table; reference behavior
    src/js/diagnose.js:77-92 + python/progress.py:159)."""
    from PIL import Image

    from moephoto_tpu.pipeline.steps import genProcess
    from moephoto_tpu.progress import Node
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.runtime.worker import begin

    rng = np.random.RandomState(0)
    img = (rng.rand(24, 16, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data = buf.getvalue()
    ctx.sharedView = memoryview(data)

    notes = []

    class Notifier:
        def send(self, payload):
            notes.append(payload)

    monkeypatch.setattr(context, "notifier", Notifier())
    outFile = str(tmp_path / "out.png")
    steps = [
        {"op": "file"},
        {"op": "resize", "scaleW": 2.0, "scaleH": 2.0},
        {"op": "output", "file": outFile, "diagnose": {"bench": True}},
    ]
    process, nodes = genProcess(steps)
    root = begin(Node({"op": "image"}), nodes, True, bench=True)
    root.bindFunc(process)(len(data), name=outFile)
    stats = [n for n in notes if "weight" in n and "samples" in n and "op" in n]
    assert stats, f"no bench stats in {notes[:5]}"
    assert any(
        isinstance(n["op"], dict) and n["op"].get("op") == "resize" for n in stats
    )
    assert all(n["samples"] >= 1 and n["weight"] > 0 for n in stats)


def test_describe_call_snapshots_step_dicts():
    """The worker's failure reply carries the described call through a
    multiprocessing pipe.  genProcess attaches live ModelExec objects
    ('opt') to the step dicts IN PLACE, so the description must snapshot
    the dicts at call time — an aliasing description became unpicklable
    and killed the worker's result pipe on any failing task (found
    driving app.py with a malformed duplicate-'file' step chain)."""
    import pickle

    from moephoto_tpu.runtime.worker import _describeCall

    step = {"op": "SR", "model": "lite", "scale": 2}
    called = _describeCall(lambda: 0, [9332, step])
    step["opt"] = object()  # what genProcess does to its step dicts
    pickle.dumps(called)  # must survive the result pipe
    assert called[2] == {"op": "SR", "model": "lite", "scale": 2}
