#!/usr/bin/env python3
"""Full-system smoke: launch app.py (two processes + shared memory),
POST an image over HTTP, verify the SR result. ~4 min first run
(TPU compile); not part of the pytest suite."""

import io
import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
from PIL import Image


def main():
    proc = subprocess.Popen([sys.executable, "app.py"])
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(
                    "http://127.0.0.1:2333/systemInfo?session=boot", timeout=2
                )
                break
            except Exception:
                time.sleep(1)
        img = (np.random.RandomState(0).rand(24, 20, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        boundary = "xxBOUNDxx"
        steps = json.dumps([{"op": "SR", "model": "lite", "scale": 2}])
        parts = []
        for name, val in (("session", "s1"), ("steps", steps)):
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"\r\n\r\n{val}\r\n'.encode()
            )
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; filename="t.png"\r\n'
            f"Content-Type: image/png\r\n\r\n".encode() + buf.getvalue() + b"\r\n"
        )
        parts.append(f"--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            "http://127.0.0.1:2333/image_enhance",
            data=b"".join(parts),
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        out = json.loads(urllib.request.urlopen(req, timeout=600).read())
        im2 = np.array(Image.open(out["result"]))
        assert im2.shape == (48, 40, 3), im2.shape
        print("FULL APP SMOKE OK:", out)
    finally:
        proc.terminate()


if __name__ == "__main__":
    main()
