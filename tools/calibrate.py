#!/usr/bin/env python3
"""TileSpec calibration harness — the TPU analog of the reference's
memory-calibration scripts (``test/memTest.py``, ``test/memModule.py``
which produced the per-model ``ramCoef`` tables).

For a registry model, sweeps (tile, batch) candidates, reports
throughput and whether the configuration compiles within HBM, and
prints the best spec.  Run on the TPU host:

    python tools/calibrate.py lite4 [--tiles 192,256,384] [--batches 2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--tiles", default="192,256,384")
    ap.add_argument("--batches", default="2,4,8,16")
    ap.add_argument("--size", default="1080x1920")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from moephoto_tpu.engine.executor import ModelExec
    from moephoto_tpu.pipeline import registry

    entry = (
        registry.SR_REGISTRY.get(args.model)
        or registry.DN_REGISTRY.get(args.model)
        or registry.DEHAZE_REGISTRY.get(args.model)
    )
    if entry is None:
        raise SystemExit(f"unknown model {args.model}")
    H, W = (int(t) for t in args.size.split("x"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    red = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))
    base = registry.buildExec(entry)
    results = []
    for tile in (int(t) for t in args.tiles.split(",")):
        for batch in (int(b) for b in args.batches.split(",")):
            spec = replace(entry["spec"], tile=tile, batch=batch)
            ex = ModelExec(
                base.apply, base.params, spec,
                channelSplit=base.channelSplit, outC=base.outC,
                prepare=base.prepare, dtype=base.dtype,
            )
            try:
                float(red(ex(x)))  # compile + run
                t0 = time.perf_counter()
                vals = [red(ex(x)) for _ in range(3)]
                [float(v) for v in vals]
                dt = (time.perf_counter() - t0) / 3
                mpxs = H * W / 1e6 / dt
                results.append((mpxs, tile, batch))
                print(f"tile={tile} batch={batch}: {mpxs:.2f} Mpx/s")
            except Exception as e:
                msg = str(e).splitlines()[0][:100]
                print(f"tile={tile} batch={batch}: FAILED ({msg})")
    if results:
        best = max(results)
        print(f"\nbest: tile={best[1]} batch={best[2]} -> {best[0]:.2f} Mpx/s")


if __name__ == "__main__":
    main()
