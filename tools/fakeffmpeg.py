#!/usr/bin/env python3
"""Fake ffmpeg for video-pipeline tests (no ffmpeg binary in CI images).

Emulates the argument subset the engine uses (SURVEY.md section 4:
fake-ffmpeg frame sources): probe (-f null), rawvideo decode (pipe
out), rawvideo encode (pipe in).  Deterministic gradient frames let
tests verify byte counts and frame geometry end to end.

Environment:
  FAKEFF_FRAMES  number of frames to emit (default 12)
  FAKEFF_SIZE    WxH (default 64x48)
"""

import json
import os
import signal
import sys

frames = int(os.environ.get("FAKEFF_FRAMES", "12"))
size = os.environ.get("FAKEFF_SIZE", "64x48")
W, H = (int(t) for t in size.split("x"))


def stderrInfo(fps=10.0):
    sys.stderr.write("Input #0, lavfi, from 'testsrc':\n")
    sys.stderr.write(
        f"  Stream #0:0: Video: rawvideo, bgr48le, {W}x{H}, {fps} fps, {fps} tbr\n"
    )
    sys.stderr.write("Output #0, null, to '-':\n")
    sys.stderr.write(
        f"  Stream #0:0: Video: wrapped_avframe, yuv420p, {W}x{H}, q=2-31, {fps} fps, {fps} tbn\n"
    )
    sys.stderr.flush()


def main():
    argv = sys.argv[1:]
    signal.signal(signal.SIGINT, lambda *a: sys.exit(0))
    if "-f" in argv and "null" in argv:  # probe
        stderrInfo()
        sys.stderr.write(f"frame=   {frames} fps=0.0 q=-0.0 Lsize=N/A\n")
        return
    if "rawvideo" in argv and argv[-1] == "-":  # decode to stdout
        stderrInfo()
        out = sys.stdout.buffer
        frameBytes = W * H * 6
        for i in range(frames):
            pattern = bytes(((i * 3 + j) % 251 for j in range(256)))
            data = (pattern * (frameBytes // 256 + 1))[:frameBytes]
            try:
                out.write(data)
                out.flush()
            except BrokenPipeError:
                return
        out.close()
        return
    if "-i" in argv and argv[argv.index("-i") + 1] == "-":  # encode from stdin
        stderrInfo()
        outPath = argv[-1]
        total = 0
        while True:
            chunk = sys.stdin.buffer.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
        sIdx = argv.index("-s") if "-s" in argv else -1
        geo = argv[sIdx + 1] if sIdx >= 0 else ""
        with open(outPath, "w") as fp:
            json.dump({"bytes": total, "s": geo}, fp)
        return
    # audio-extract or merge calls: just create the target file
    if argv and not argv[-1].startswith("-"):
        open(argv[-1], "wb").close()


if __name__ == "__main__":
    main()
