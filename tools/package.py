"""Deployment packager (role of the reference's ``setup_run.py:34-58``:
manifest generation, native build, deploy-tree assembly — TPU edition:
the native frame codec replaces the CUDA extension, and compiled model
exports are optional StableHLO artifacts instead of .pyc trees).

Usage:
  python tools/package.py [--out dist/moephoto-tpu] [--models lite2 ...]
                          [--skip-native]

Produces a self-contained tree:
  app.py  moephoto_tpu/  templates/  static/  manifest.json
  moephoto_tpu/native/libframecodec.so   (g++ -O3, unless --skip-native)
  model/                                 (placeholder + README)
  exports/<name>.stablehlo               (for each --models entry)

The tree runs with `python app.py` from its root (no reference mount,
no dev checkout).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def buildNative(outPkg: str) -> bool:
    src = os.path.join(ROOT, "moephoto_tpu", "native")
    try:
        subprocess.run(["make", "-C", src], check=True, capture_output=True)
    except Exception as e:
        print(f"native build skipped: {e}", file=sys.stderr)
        return False
    lib = os.path.join(src, "libframecodec.so")
    if os.path.exists(lib):
        shutil.copy2(lib, os.path.join(outPkg, "native", "libframecodec.so"))
        return True
    return False


def manifest() -> dict:
    from moephoto_tpu.config import VERSION

    return {
        "name": "MoePhoto-TPU",
        "version": VERSION,
        "buildTime": int(time.time()),
        "python": ">=3.10",
        "entry": "app.py",
        "ufile": ".user/",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dist/moephoto-tpu")
    ap.add_argument("--models", nargs="*", default=[],
                    help="registry model names to export as StableHLO")
    ap.add_argument("--skip-native", action="store_true")
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)

    # package source (no caches/tests)
    shutil.copytree(
        os.path.join(ROOT, "moephoto_tpu"),
        os.path.join(out, "moephoto_tpu"),
        ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.pyc"),
    )
    for d in ("templates", "static"):
        shutil.copytree(os.path.join(ROOT, d), os.path.join(out, d))
    for f in ("app.py", "README.md", "pyproject.toml"):
        shutil.copy2(os.path.join(ROOT, f), out)

    native = False if args.skip_native else buildNative(
        os.path.join(out, "moephoto_tpu")
    )

    os.makedirs(os.path.join(out, "model"), exist_ok=True)
    with open(os.path.join(out, "model", "README.md"), "w") as fp:
        fp.write(
            "Place converted checkpoints here using the reference's "
            "model/ layout (see pipeline/registry.py), or point the "
            "modelDir config key elsewhere.\n"
        )

    man = manifest()
    man["native"] = native
    with open(os.path.join(out, "manifest.json"), "w") as fp:
        json.dump(man, fp, indent=2)

    exported = []
    for name in args.models:
        try:
            from tools.export_stablehlo import exportModel  # noqa: F401

            os.makedirs(os.path.join(out, "exports"), exist_ok=True)
            dst = os.path.join(out, "exports", f"{name}.stablehlo")
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "tools", "export_stablehlo.py"),
                 name, dst],
                check=True,
            )
            exported.append(name)
        except Exception as e:
            print(f"export {name} failed: {e}", file=sys.stderr)

    print(json.dumps({"out": out, "native": native, "exports": exported}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
