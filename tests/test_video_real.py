"""Real-media end-to-end video pipeline (BASELINE config 5).

Drives the PRODUCTION video engine (probe regexes + frame counting,
bgr48le raw pipes, drain threads, encoder mux, upload cleanup —
`video/engine.py`) against real container media through
decode -> ESTRNN (demob) -> IFRNet slomo x2 -> encode, and asserts the
output container is playable (OpenCV re-decodes it) with the exact
expected frame count/geometry.

ffmpeg itself is not installable here (no binary in the image and no
egress — `runtime/updater.updateFfmpeg(...)` fails with
`urlopen error [Errno -2] Name or service not known`), so the engine's
subprocess seam runs tools/cvffmpeg.py: the same CLI surface, real
decode/encode via OpenCV.  Reference: `video.py:323-397`,
`test/test-video.py:1-17`.

DISCLOSURE: the first draft of this test passed the reference's
`test/realshort.mp4` directly with ``by=''`` — which marks the input as
a consumed upload, and the engine (faithful to reference video.py
semantics) DELETED it.  The reference mount allowed the unlink despite
r--r--r-- perms, so that fixture is gone from /root/reference.  Two
consequences live in this commit: `removeFile` now refuses to delete
anything outside `config.uploadDir` (tested below), and the e2e runs on
the repo's own committed real-mp4 fixture (tests/data/shortclip.mp4:
36 frames, 320x240@30, mp4v — deterministic moving texture/gradient),
copied into a scratch upload dir so the upload-cleanup path is still
exercised end-to-end.
"""

import os
import shutil
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, needsReference

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "shortclip.mp4")

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def cvffmpeg(monkeypatch):
    script = os.path.join(TOOLS, "cvffmpeg.py")
    from moephoto_tpu.config import config

    monkeypatch.setattr(config, "ffmpegPath", sys.executable)
    import moephoto_tpu.video.engine as E

    origPopen = E.sp.Popen

    def patched(cmd, **kw):
        if cmd and cmd[0] == sys.executable:
            cmd = [sys.executable, script] + list(cmd[1:])
        return origPopen(cmd, **kw)

    monkeypatch.setattr(E.sp, "Popen", patched)
    return script


@pytest.fixture()
def temporalCkpts(tmp_path_factory):
    """Random-init ESTRNN + IFRNet checkpoints in the production schema
    (the real ones are LFS-stripped in the mirror — CLAUDE.md), built
    from the reference torch modules via refshim, exactly like
    tests/test_golden_streams.py and bench.py do."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("no reference")
    sys.path.insert(0, TOOLS)
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import ESTRNN as RE
        import IFRNet as RI

        torch.manual_seed(7)
        ckptDir = str(tmp_path_factory.mktemp("realck"))
        ePath = os.path.join(ckptDir, "estrnn.pth")
        cell, fusion, recons = RE.RDBCell(RE.para), RE.GSA(RE.para), RE.Reconstructor()
        torch.save(
            {"cell": cell.state_dict(), "fusion": fusion.state_dict(),
             "recons": recons.state_dict()},
            ePath,
        )
        chs = RI.Channels["S"]
        iPath = os.path.join(ckptDir, "ifrnet.pth")
        torch.save(
            {
                "encoder": RI.IFRNetEncoder(None, chs, 1e-3).state_dict(),
                "decoder": RI.IFRNetDecoder(
                    None, chs, RI.SideChannels["S"], 0, 1e-3
                ).state_dict(),
            },
            iPath,
        )
    finally:
        os.chdir(cwd)
    return ePath, iPath


class _Flag:
    _s = False

    def is_set(self):
        return self._s

    def set(self):
        self._s = True

    def clear(self):
        self._s = False


def test_removefile_contained_to_upload_dir(tmp_path, monkeypatch):
    """The engine must never delete inputs outside its upload dir —
    callers hand it direct paths to user-owned (or read-only reference)
    media with ``by=''`` and the reference's unconditional unlink
    destroys them (it destroyed /root/reference/test/realshort.mp4
    during this round — see module docstring)."""
    from moephoto_tpu.config import config
    from moephoto_tpu.video.engine import removeFile

    up = tmp_path / "upload"
    up.mkdir()
    monkeypatch.setattr(config, "uploadDir", str(up), raising=False)

    keep = tmp_path / "users_movie.mp4"
    keep.write_bytes(b"precious")
    removeFile(str(keep))
    assert keep.exists(), "engine deleted a non-upload input"

    gone = up / "uploaded.mp4"
    gone.write_bytes(b"temp")
    removeFile(str(gone))
    assert not gone.exists(), "upload cleanup must still work"


@needsReference
def test_realclip_demob_slomo_end_to_end(cvffmpeg, temporalCkpts, tmp_path, monkeypatch):
    assert os.path.exists(FIXTURE)
    ePath, iPath = temporalCkpts
    from moephoto_tpu.config import config
    from moephoto_tpu.models import estrnn as JE
    from moephoto_tpu.models import ifrnet as JI
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.video.engine import SR_vid

    monkeypatch.setitem(JE.modelPaths, "1ms8ms", ePath)
    monkeypatch.setitem(JI.modelPaths, "S", iPath)
    context.stopFlag = _Flag()
    context.notifier = None

    # stage the fixture as an upload (by='' == consumed upload: the
    # production flow probes with frame counting AND unlinks the input
    # afterwards — from the scratch upload dir only)
    upDir = tmp_path / "upload"
    upDir.mkdir()
    monkeypatch.setattr(config, "uploadDir", str(upDir), raising=False)
    vid = str(upDir / "shortclip.mp4")
    shutil.copyfile(FIXTURE, vid)

    nIn = 9  # range-limited for CI time; bench video_e2e_realclip runs all 36
    outFile = str(tmp_path / "shortclip_out.mp4")
    steps = [
        {"op": "decode"},
        # stop is INCLUSIVE (reference video.py frame loop `i <= stop`)
        {"op": "range", "start": 0, "stop": nIn - 1},
        {"op": "demob", "model": "1ms8ms"},
        {"op": "slomo", "model": "IFRNet S", "sf": 2},
        {"op": "output", "file": outFile, "frameRate": 60, "codec": "mpeg4"},
    ]
    path, nFrames = SR_vid(vid, "", *steps)
    assert os.path.exists(path)
    assert not os.path.exists(vid), "upload should be cleaned up"

    cap = cv2.VideoCapture(path)
    assert cap.isOpened(), "encoded output is not a playable container"
    n = 0
    stds = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (240, 320, 3)
        stds.append(float(frame.std()))
        n += 1
    cap.release()
    # slomo sf=2 interpolates one frame between each consecutive pair
    assert n == 2 * nIn - 1, (n, nFrames)
    assert nFrames == nIn
    assert min(stds) > 0.0, "encoded frames are blank"
