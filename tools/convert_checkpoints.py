#!/usr/bin/env python3
"""Convert reference .pth checkpoints to torch-free native .npz files.

Run once with torch available; afterwards the framework loads models
without torch installed.  Output .npz sit next to the configured
modelDir using the same relative layout.

    python tools/convert_checkpoints.py [outDir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outRoot = sys.argv[1] if len(sys.argv) > 1 else "./model"
    from moephoto_tpu.models.api import loadTorchWeights, saveParams
    from moephoto_tpu.pipeline import registry

    done = 0
    for reg in (registry.SR_REGISTRY, registry.DN_REGISTRY, registry.DEHAZE_REGISTRY):
        for name, entry in reg.items():
            src = registry.modelPath(entry["path"])
            if not os.path.exists(src) or not src.endswith(".pth"):
                continue
            rel = entry["path"].lstrip("./")
            sub = rel[len("model/"):] if rel.startswith("model/") else rel
            dst = os.path.join(outRoot, sub[: -len(".pth")] + ".npz")
            if os.path.exists(dst):
                continue
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                params = loadTorchWeights(src, entry["convT"])
                saveParams(params, dst)
                print(f"{name}: {src} -> {dst}")
                done += 1
            except Exception as e:
                print(f"{name}: FAILED ({e})")
    print(f"converted {done} checkpoints")


if __name__ == "__main__":
    main()
