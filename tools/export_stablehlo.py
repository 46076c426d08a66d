#!/usr/bin/env python3
"""Export a zoo model to StableHLO for deployment (the TPU-native analog
of the reference's ONNX exporter, ``python/pytoch_to_onnx.py``).

Usage: python tools/export_stablehlo.py lite2 out.stablehlo [H W]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "lite2"
    out = sys.argv[2] if len(sys.argv) > 2 else f"{model}.stablehlo"
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 256

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from moephoto_tpu.pipeline import registry

    entry = registry.SR_REGISTRY.get(model) or registry.DN_REGISTRY.get(
        model
    ) or registry.DEHAZE_REGISTRY.get(model)
    if entry is None:
        raise SystemExit(f"unknown model {model}")
    ex = registry.buildExec(entry)
    cIn = 1 if entry["channelSplit"] else 3
    x = jnp.zeros((1, h, w, cIn), jnp.float32)

    fn = jax.jit(lambda v: ex.apply(ex.params, v.astype(ex.dtype)).astype(jnp.float32))
    exported = jexport.export(fn)(x)
    with open(out, "wb") as fp:
        fp.write(exported.serialize())
    print(f"exported {model} -> {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
