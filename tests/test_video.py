"""End-to-end video pipeline test with the fake-ffmpeg harness."""

import json
import os
import sys
import threading

import numpy as np
import pytest

from tests.conftest import needsReference

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
weightsExist = os.path.exists("/root/reference/model/lite/model.pth")


@pytest.fixture()
def fakeffmpeg(monkeypatch, tmp_path):
    script = os.path.join(TOOLS, "fakeffmpeg.py")
    os.chmod(script, 0o755)
    from moephoto_tpu.config import config

    monkeypatch.setattr(config, "ffmpegPath", sys.executable)

    # engine invokes [ffmpegPath, ...args]; wrap so argv[1] is the script
    import moephoto_tpu.video.engine as E

    origPopen = E.sp.Popen

    def patched(cmd, **kw):
        if cmd and cmd[0] == sys.executable:
            cmd = [sys.executable, script] + list(cmd[1:])
        return origPopen(cmd, **kw)

    monkeypatch.setattr(E.sp, "Popen", patched)
    return script


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_video_sr_end_to_end(fakeffmpeg, tmp_path, monkeypatch):
    """12 synthetic bgr48le frames -> SR lite x2 -> encoded byte count
    must equal 12 frames at 2x geometry."""
    monkeypatch.setenv("FAKEFF_FRAMES", "12")
    monkeypatch.setenv("FAKEFF_SIZE", "64x48")
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.video.engine import SR_vid

    class Flag:
        def __init__(self):
            self._s = False

        def is_set(self):
            return self._s

        def set(self):
            self._s = True

        def clear(self):
            self._s = False

    context.stopFlag = Flag()
    context.notifier = None
    outFile = str(tmp_path / "out.mkv")
    steps = [
        {"op": "decode", "width": 64, "height": 48},
        {"op": "range"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile, "frameRate": 10, "codec": "libx264"},
    ]
    path, nFrames = SR_vid("testsrc", "cmd", *steps)
    assert nFrames == 12
    with open(path) as fp:
        meta = json.load(fp)
    assert meta["s"] == "128x96"
    assert meta["bytes"] == 12 * 128 * 96 * 6


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_video_sr_with_range(fakeffmpeg, tmp_path, monkeypatch):
    """range.start skips decoded frames before processing."""
    monkeypatch.setenv("FAKEFF_FRAMES", "10")
    monkeypatch.setenv("FAKEFF_SIZE", "32x32")
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.video.engine import SR_vid

    class Flag:
        _s = False

        def is_set(self):
            return self._s

        def set(self):
            self._s = True

        def clear(self):
            self._s = False

    context.stopFlag = Flag()
    context.notifier = None
    outFile = str(tmp_path / "out2.mkv")
    steps = [
        {"op": "decode", "width": 32, "height": 32},
        {"op": "range", "start": 4},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile, "frameRate": 10, "codec": "libx264"},
    ]
    path, nFrames = SR_vid("testsrc", "cmd", *steps)
    with open(path) as fp:
        meta = json.load(fp)
    assert meta["bytes"] == 6 * 64 * 64 * 6  # 10 - 4 frames at 2x


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_video_benchmark_chain(fakeffmpeg, tmp_path, monkeypatch):
    """Multi-step chain from the benchmark preset (minus slomo, whose
    checkpoint is LFS-stripped): SR lite x2 -> resize -> DN lite5 ->
    SR a x2 -> dehaze."""
    monkeypatch.setenv("FAKEFF_FRAMES", "6")
    monkeypatch.setenv("FAKEFF_SIZE", "48x32")
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.video.engine import SR_vid

    class Flag:
        _s = False

        def is_set(self):
            return self._s

        def set(self):
            self._s = True

        def clear(self):
            self._s = False

    context.stopFlag = Flag()
    context.notifier = None
    outFile = str(tmp_path / "chain.mkv")
    steps = [
        {"op": "decode", "width": 48, "height": 32},
        {"op": "range"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "resize", "width": 80, "height": 56, "method": "bilinear"},
        {"op": "DN", "model": "lite5"},
        {"op": "SR", "model": "a", "scale": 2},
        {"op": "dehaze"},
        {"op": "output", "file": outFile, "frameRate": 10, "codec": "libx264"},
    ]
    path, nFrames = SR_vid("testsrc", "cmd", *steps)
    assert nFrames == 6
    with open(path) as fp:
        meta = json.load(fp)
    assert meta["s"] == "160x112"
    assert meta["bytes"] == 6 * 160 * 112 * 6


@needsReference
@pytest.mark.skipif(not weightsExist, reason="no checkpoints")
def test_video_stop_flag(fakeffmpeg, tmp_path, monkeypatch):
    """Setting the stop flag mid-stream terminates cleanly with partial
    output (reference video.py:350: per-frame stop check)."""
    monkeypatch.setenv("FAKEFF_FRAMES", "50")
    monkeypatch.setenv("FAKEFF_SIZE", "32x32")
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.video.engine import SR_vid

    class Flag:
        def __init__(self):
            self._s = False
            self.count = 0

        def is_set(self):
            # trip after a few frames worth of checks
            self.count += 1
            return self.count > 6

        def set(self):
            self._s = True

        def clear(self):
            self.count = 0

    context.stopFlag = Flag()
    context.notifier = None
    outFile = str(tmp_path / "stopped.mkv")
    steps = [
        {"op": "decode", "width": 32, "height": 32},
        {"op": "range"},
        {"op": "SR", "model": "lite", "scale": 2},
        {"op": "output", "file": outFile, "frameRate": 10, "codec": "libx264"},
    ]
    path, nFrames = SR_vid("testsrc", "cmd", *steps)
    assert nFrames < 50  # stopped early
    with open(path) as fp:
        meta = json.load(fp)
    assert meta["bytes"] == nFrames * 64 * 64 * 6
