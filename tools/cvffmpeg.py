#!/usr/bin/env python3
"""Real-media ffmpeg stand-in backed by OpenCV (no ffmpeg binary and no
network egress in this environment — `runtime/updater.updateFfmpeg`
fails with `Name or service not known`, attempt logged in
docs/PERF.md).

Speaks the exact CLI subset `video/engine.py` assembles (reference
`video.py:323-397`): probe (`-f null -`, stderr stream info + a
`frame=N` count line), decode (`-f rawvideo -pix_fmt bgr48le` to
stdout), encode (rawvideo bgr48le on stdin to a container file via
``cv2.VideoWriter``).  Unlike tools/fakeffmpeg.py (synthetic gradient
frames) this decodes/encodes REAL media — it drives BASELINE config 5
end-to-end on the committed fixture tests/data/shortclip.mp4
(tests/test_video_real.py, bench row `video_e2e_realclip`).

Audio (WAV sidecar convention): OpenCV has no audio API, so a media
file `X` "contains audio" here iff a sidecar `X.wav` exists next to it.
The shim then implements the reference's full audio surface
(`video.py:204-257,312-321`): probe reports `Stream #0:1: Audio:`,
decode's `-vn -c copy -y PATH` split copies the sidecar bytes to PATH,
encode's second `-i audioFrom` mux copies audioFrom's sidecar to the
target's sidecar, and the merge command (`-i video -i audio -c:0 copy
-c:1 copy target`) copies the video container to the target plus the
audio bytes to the target's sidecar.  `-c:v` encoder selections map to
an OpenCV fourcc by target extension.

bgr48le <-> uint8 conversion matches ffmpeg's bit-depth expansion
(v*257 on decode; round-half-up >>8 on encode).
"""

import os
import signal
import sys

import cv2
import numpy as np


def _sidecar(path):
    """The audio track of `path` under the WAV-sidecar convention."""
    return path + ".wav"


def _streamInfo(src, W, H, fps):
    sys.stderr.write(f"Input #0, mov,mp4,m4a,3gp,3g2,mj2, from '{src}':\n")
    sys.stderr.write(
        f"  Stream #0:0: Video: h264, yuv420p, {W}x{H}, {fps:.2f} fps, {fps:.2f} tbr\n"
    )
    if os.path.exists(_sidecar(src)):
        sys.stderr.write(
            "  Stream #0:1: Audio: pcm_s16le, 44100 Hz, stereo, s16\n"
        )
    sys.stderr.write("Output #0, null, to '-':\n")
    sys.stderr.write(
        f"  Stream #0:0: Video: wrapped_avframe, yuv420p, {W}x{H}, q=2-31, {fps:.2f} fps\n"
    )
    sys.stderr.flush()


def _openInput(argv):
    i = argv.index("-i")
    src = argv[i + 1]
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        sys.stderr.write(f"{src}: Invalid data found when processing input\n")
        sys.exit(1)
    W = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    return src, cap, W, H, fps


def probe(argv):
    src, cap, W, H, fps = _openInput(argv)
    _streamInfo(src, W, H, fps)
    if "-t" not in argv:  # full probe: the engine needs an exact count
        n = 0
        while cap.read()[0]:
            n += 1
        sys.stderr.write(f"frame=  {n} fps=0.0 q=-0.0 Lsize=N/A\n")
        sys.stderr.flush()
    cap.release()


def _copyBytes(srcPath, dstPath):
    with open(srcPath, "rb") as f, open(dstPath, "wb") as g:
        g.write(f.read())


def decode(argv):
    src, cap, W, H, fps = _openInput(argv)
    _streamInfo(src, W, H, fps)
    if "-vn" in argv:  # split non-video tracks (engine: -vn -c copy -y PATH)
        audioPath = argv[argv.index("-y") + 1]
        if os.path.exists(_sidecar(src)):
            _copyBytes(_sidecar(src), audioPath)
    out = sys.stdout.buffer
    while True:
        ok, frame = cap.read()  # (H, W, 3) BGR uint8
        if not ok:
            break
        raw = (frame.astype(np.uint16) * 257).astype("<u2")  # bgr48le
        try:
            out.write(raw.tobytes())
        except BrokenPipeError:
            return
    out.flush()
    out.close()
    cap.release()


_FOURCC = {".mp4": "mp4v", ".mkv": "XVID", ".ts": "mp4v", ".avi": "XVID"}


def encode(argv):
    W, H = (int(t) for t in argv[argv.index("-s") + 1].split("x"))
    fps = float(argv[argv.index("-r") + 1])
    target = argv[-1]
    fourcc = _FOURCC.get(os.path.splitext(target)[1].lower(), "mp4v")
    writer = cv2.VideoWriter(
        target, cv2.VideoWriter_fourcc(*fourcc), fps, (W, H)
    )
    if not writer.isOpened():
        sys.stderr.write(f"{target}: could not open encoder\n")
        sys.exit(1)
    frameBytes = W * H * 6
    buf = b""
    stdin = sys.stdin.buffer
    n = 0
    while True:
        chunk = stdin.read(frameBytes - len(buf))
        if not chunk:
            break
        buf += chunk
        if len(buf) < frameBytes:
            continue
        raw = np.frombuffer(buf, dtype="<u2").reshape(H, W, 3)
        buf = b""
        u8 = ((raw.astype(np.uint32) + 128) >> 8).clip(0, 255).astype(np.uint8)
        writer.write(u8)
        n += 1
    writer.release()
    # mux: a second input after stdin is an `audioFrom` source whose
    # non-video tracks ride along (-map 1? — optional, so a missing
    # sidecar is not an error)
    iIdx = [i for i, t in enumerate(argv) if t == "-i"]
    if len(iIdx) > 1:
        audioFrom = argv[iIdx[1] + 1]
        track = audioFrom if audioFrom.endswith(".wav") else _sidecar(audioFrom)
        if os.path.exists(track):
            _copyBytes(track, _sidecar(target))
    sys.stderr.write(f"frame=  {n} fps=0.0 q=-0.0 Lsize=N/A\n")


def merge(argv):
    """Remux split tracks (engine buildMergeCommand, reference
    video.py:244-257): -i video -i audio -map 0:v -map 1? -c:0 copy
    -c:1 copy target.  Video stream-copies to the target; the split
    audio bytes become the target's WAV sidecar (`-map 1?` — a missing
    or empty audio input is skipped, not an error)."""
    iIdx = [i for i, t in enumerate(argv) if t == "-i"]
    videoPath, audioPath = argv[iIdx[0] + 1], argv[iIdx[1] + 1]
    target = argv[-1]
    if not os.path.exists(videoPath):
        sys.stderr.write(f"{videoPath}: No such file or directory\n")
        sys.exit(1)
    _copyBytes(videoPath, target)
    if os.path.exists(audioPath) and os.path.getsize(audioPath) > 0:
        _copyBytes(audioPath, _sidecar(target))
    sys.stderr.write(f"size=  {os.path.getsize(target)//1024}kB\n")


def main():
    argv = sys.argv[1:]
    signal.signal(signal.SIGINT, lambda *a: sys.exit(0))
    if "-f" in argv and "null" in argv:
        return probe(argv)
    if "rawvideo" in argv and argv[-1] == "-":
        return decode(argv)
    if "-i" in argv and argv[argv.index("-i") + 1] == "-":
        return encode(argv)
    if "-c:0" in argv:
        return merge(argv)
    # unknown subcommand: materialize the target so callers see a file
    if argv and not argv[-1].startswith("-"):
        open(argv[-1], "wb").close()


if __name__ == "__main__":
    main()
