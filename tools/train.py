"""Fine-tune a zoo SR model on an image folder (TPU-native training).

The reference has NO training path (inference-only `nn.Module`s); this
is the rebuild's extension: self-supervised SR fine-tuning — sample HR
patches from user images, downscale to LR, minimize L1(model(LR), HR) —
with the dp (batch) x sp (rows, shard_map halo exchange) mesh step from
``parallel/sharded.makeOptaxTrainStep`` and orbax checkpointing.

Usage:
  python tools/train.py --data 'photos/*.png' --model lite --scale 2 \
      --steps 2000 --batch 8 --patch 64 --lr 1e-4 --out /tmp/ft
  # resume:
  python tools/train.py ... --out /tmp/ft --resume

Runs on whatever devices jax exposes: the real chip (mesh [1, 1]), a
multi-chip mesh via --mesh dp,sp, or CPU for tests/dev.  Checkpoints
are plain param pytrees compatible with ``models/api.convertStateDict``
output, so a fine-tuned tree drops into the inference registry as-is.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def buildModel(name: str, scale: int, dtype, fromScratch: bool = False):
    """(apply, params, halo, scale, channels) for a trainable model.

    ``lite`` works checkpoint-free (__graft_entry__ random init);
    any other name is looked up across the inference registries
    (``lite2``/``a2``/``lite5``/``gan4``/...) and fine-tunes the real
    checkpoint — with --fromScratch, a random tree of the checkpoint's
    own shapes."""
    import jax.numpy as jnp

    import __graft_entry__ as GE
    from moephoto_tpu.models import sr as SR

    if name == "lite":
        apply = SR.makeMoeNetLite2(scale)
        params = GE._lite2Params(scale, dtype=jnp.float32, random=fromScratch)
        params = {k: np.asarray(v, np.float32) for k, v in params.items()}
        return apply, params, 8, scale, 1

    from moephoto_tpu.models import api as M
    from moephoto_tpu.pipeline import registry as R

    entry = None
    for reg in (R.SR_REGISTRY, R.DN_REGISTRY, R.DEHAZE_REGISTRY):
        if name in reg:
            entry = reg[name]
            break
    if entry is None:
        raise SystemExit(f"unknown --model {name} (try lite, lite2, a2, lite5, ...)")
    mod = R._lazyImport(entry["family"])
    apply = getattr(mod, entry["fn"])  # plain XLA apply (no packing/fusion)
    path = R.modelPath(entry["path"])
    if not os.path.exists(path):
        raise SystemExit(f"checkpoint {entry['path']} not available for --model {name}")
    params = M.loadTorchWeights(path, entry["convT"], dtype=jnp.float32)
    if fromScratch:
        rng = np.random.RandomState(0)
        params = {
            k: (rng.randn(*np.shape(v)).astype(np.float32) * 0.05
                if np.asarray(v).ndim else np.asarray(v, np.float32))
            for k, v in params.items()
        }
    params = {k: np.asarray(v, np.float32) for k, v in params.items()}
    spec = entry["spec"]
    halo = max(8, int(spec.pad))
    return apply, params, halo, int(spec.scale), (1 if entry["channelSplit"] else 3)


class PatchSampler:
    """Random HR/LR patch batches from an image folder.

    channels=1 samples luma (the channel-split families are
    single-channel by design, models/sr.py); channels=3 samples RGB.
    scale>1: LR = box-downscaled HR (SR fine-tuning); scale==1:
    LR = HR + Gaussian noise of ``sigma`` (denoise fine-tuning)."""

    def __init__(self, paths, patch: int, scale: int, seed: int = 0,
                 channels: int = 1, sigma: float = 0.03):
        from PIL import Image

        self.rng = np.random.RandomState(seed)
        self.patch = patch
        self.scale = scale
        self.channels = channels
        self.sigma = sigma
        self.imgs = []
        for p in paths:
            mode = "L" if channels == 1 else "RGB"
            im = np.asarray(Image.open(p).convert(mode), np.float32) / 255.0
            if channels == 1:
                im = im[..., None]
            hp = patch * scale
            if im.shape[0] >= hp and im.shape[1] >= hp:
                self.imgs.append(im)
        if not self.imgs:
            raise SystemExit(
                f"no images of at least {patch * scale}px among {len(paths)} inputs"
            )

    def batch(self, n: int):
        """(n, p, p, C) LR/noisy, (n, p*s, p*s, C) HR."""
        s, p, c = self.scale, self.patch, self.channels
        hp = p * s
        lrs, hrs = [], []
        for _ in range(n):
            im = self.imgs[self.rng.randint(len(self.imgs))]
            y = self.rng.randint(im.shape[0] - hp + 1)
            x = self.rng.randint(im.shape[1] - hp + 1)
            hr = im[y : y + hp, x : x + hp]
            if s > 1:
                # area downscale (box filter) — bicubic-free degradation
                lr = hr.reshape(p, s, p, s, c).mean((1, 3))
            else:
                lr = np.clip(
                    hr + self.rng.randn(*hr.shape).astype(np.float32) * self.sigma,
                    0.0, 1.0,
                )
            lrs.append(lr)
            hrs.append(hr)
        return np.stack(lrs).astype(np.float32), np.stack(hrs).astype(np.float32)


def evalPSNR(apply, params, sampler, n: int = 16, seed: int = 123) -> float:
    """Held-out PSNR of ``apply(params, LR)`` vs HR over ``n`` patches
    (the quality number a fine-tuning user actually cares about)."""
    import jax.numpy as jnp

    sampler.rng = np.random.RandomState(seed)  # fixed eval patches
    x, y = sampler.batch(n)
    pred = np.asarray(apply({k: jnp.asarray(v) for k, v in params.items()},
                            jnp.asarray(x)), np.float32)
    mse = float(np.mean((np.clip(pred, 0, 1) - np.clip(y, 0, 1)) ** 2))
    return 10 * float(np.log10(1.0 / max(mse, 1e-12)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data", required=True, help="image glob for HR patches")
    ap.add_argument("--model", default="lite")
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8, help="global batch (divisible by dp)")
    ap.add_argument("--patch", type=int, default=64, help="LR patch size (rows divisible by sp)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--mesh", default="", help="dp,sp (default: all devices on dp)")
    ap.add_argument("--backend", default="", help="device backend (e.g. cpu for tests)")
    ap.add_argument("--out", required=True, help="checkpoint directory")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--fromScratch", action="store_true",
                    help="random init instead of the registry checkpoint")
    ap.add_argument("--saveEvery", type=int, default=200)
    ap.add_argument("--sigma", type=float, default=0.03,
                    help="noise level for scale-1 (denoise) fine-tuning")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--computeDtype", default="fp32", choices=("fp32", "bf16"),
                    help="bf16 = mixed precision: bf16 forward/backward, "
                         "fp32 master params + optimizer (the inference "
                         "stack's bf16-compute/fp32-accum convention)")
    ap.add_argument("--holdout", default="",
                    help="image glob for held-out PSNR eval (printed "
                         "before and after training)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax
    import orbax.checkpoint as ocp
    from jax.sharding import Mesh

    from moephoto_tpu.parallel.sharded import makeOptaxTrainStep

    devs = jax.devices(args.backend) if args.backend else jax.devices()
    if args.mesh:
        dp, sp = (int(v) for v in args.mesh.split(","))
    else:
        dp, sp = len(devs), 1
    if dp * sp > len(devs):
        raise SystemExit(f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devs)}")
    if args.batch % dp or args.patch % sp:
        raise SystemExit("--batch must divide by dp and --patch by sp")
    apply, params, halo, scale, channels = buildModel(
        args.model, args.scale, jnp.float32, fromScratch=args.fromScratch)
    if args.patch // sp <= halo:
        raise SystemExit(
            f"--patch/sp = {args.patch // sp} rows per shard must exceed the "
            f"model's halo ({halo}; edge shards reflect-pad from their own "
            f"rows); raise --patch or lower sp"
        )
    mesh = Mesh(np.asarray(devs[: dp * sp]).reshape(dp, sp), ("dp", "sp"))

    tx = optax.adam(args.lr)
    optState = tx.init(params)
    startStep = 0

    outDir = os.path.abspath(args.out)
    ckptr = ocp.PyTreeCheckpointer()
    ckptPath = os.path.join(outDir, "state")
    if args.resume and os.path.isdir(ckptPath):
        restored = ckptr.restore(ckptPath)
        params = restored["params"]
        optState = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(optState),
            jax.tree_util.tree_leaves(restored["optState"]),
        )
        startStep = int(restored["step"])
        print(f"resumed from step {startStep}")

    sampler = PatchSampler(
        sorted(glob.glob(args.data)), args.patch, scale, args.seed + startStep,
        channels=channels, sigma=args.sigma,
    )
    step = makeOptaxTrainStep(
        apply, mesh, tx, halo=halo, scale=scale,
        computeDtype=jnp.bfloat16 if args.computeDtype == "bf16" else None,
    )

    evalSampler = None
    if args.holdout:
        evalSampler = PatchSampler(
            sorted(glob.glob(args.holdout)), args.patch, scale, args.seed + 99,
            channels=channels, sigma=args.sigma,
        )

    psnrBefore = psnrAfter = None
    if evalSampler is not None:
        psnrBefore = evalPSNR(apply, params, evalSampler)
        print(f"held-out PSNR before: {psnrBefore:.2f} dB", flush=True)

    def save(n, params, optState):
        os.makedirs(outDir, exist_ok=True)
        state = {
            "params": jax.device_get(params),
            "optState": jax.device_get(optState),
            "step": n,
        }
        ckptr.save(ckptPath, state, force=True)

    loss = None
    with mesh:
        for n in range(startStep, args.steps):
            x, y = sampler.batch(args.batch)
            params, optState, loss = step(params, optState, x, y)
            if (n + 1) % 20 == 0 or n == startStep:
                print(f"step {n + 1}/{args.steps} loss {float(loss):.5f}", flush=True)
            if (n + 1) % args.saveEvery == 0:
                save(n + 1, params, optState)
    save(args.steps, params, optState)
    if loss is not None:
        print(f"done: {args.steps} steps, final loss {float(loss):.5f}")
    if evalSampler is not None:
        psnrAfter = evalPSNR(apply, params, evalSampler)
        print(
            f"held-out PSNR after: {psnrAfter:.2f} dB "
            f"({psnrAfter - psnrBefore:+.2f})",
            flush=True,
        )
    return params


if __name__ == "__main__":
    main()
