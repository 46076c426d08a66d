"""On-chip Pallas kernel parity gate (VERDICT round-2 item 6).

Every production Pallas kernel is compared ON THE REAL TPU against its
``interpret=True`` execution of the same program — interpret mode runs
the kernel body as ordinary XLA ops, so it is the exact-math counterpart
while the compiled kernel goes through Mosaic (bf16 MXU passes, VMEM
scheduling).  A Mosaic miscompile that CI's CPU interpret tests cannot
see shows up here as a large maxabs.  Exception: the lanes-major AiLUT
kernel's bf16x2 exact mode is gated against the f32 XLA transform
instead — interpret-as-XLA:TPU-ops drops its hi/lo compensation and is
LESS accurate than the compiled kernel (see the in-function comment).

Used by bench.py (``kernel_parity_maxabs`` sanity field, asserted) and
by the MOEPHOTO_CHIP_TESTS=1-gated test in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import numpy as np

TOL = 2e-2  # bf16 single-pass MXU rounding across a few accumulations


def _maxabs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


def runAll() -> dict:
    """Returns {kernel: maxabs-vs-interpret}, small-but-real shapes."""
    import jax

    if jax.default_backend() == "cpu":
        raise RuntimeError("chip parity gate needs the TPU backend")
    # pin to the real chip even under a CPU default_device (test env)
    with jax.default_device(jax.devices()[0]):
        return _runAll()


def _runAll() -> dict:
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    out = {}

    # --- DCNv2 dense sampler (ops/dcnkernel.py) ---------------------------
    from moephoto_tpu.ops.dcnkernel import dcnDensePallas

    B, H, W, C, dg = 1, 16, 128, 64, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    off = jnp.asarray((rng.rand(B, H, W, dg, 9, 2) * 4 - 2).astype(np.float32),
                      jnp.bfloat16)
    m = jnp.asarray(rng.rand(B, H, W, dg, 9).astype(np.float32), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(C).astype(np.float32) * 0.01, jnp.bfloat16)
    dcn = functools.partial(dcnDensePallas, dg=dg, padding=1, dilation=1, margin=3)
    got = jax.jit(dcn)(x, off, m, wgt, bias)
    want = jax.jit(functools.partial(dcn, interpret=True))(x, off, m, wgt, bias)
    out["dcnDensePallas"] = _maxabs(got, want)

    # --- bounded warps (ops/warp.py) --------------------------------------
    from moephoto_tpu.ops.warp import backWarpBounded, warpBounded

    Hw, Ww = 24, 192
    img = jnp.asarray(rng.rand(1, Hw, Ww, 3).astype(np.float32), jnp.bfloat16)
    flow = jnp.asarray((rng.rand(1, Hw, Ww, 2) * 8 - 4).astype(np.float32))
    got = jax.jit(warpBounded)(img, flow)
    want = jax.jit(functools.partial(warpBounded, interpret=True))(img, flow)
    out["warpBounded"] = _maxabs(got, want)

    got = jax.jit(backWarpBounded)(img, flow)
    want = jax.jit(functools.partial(backWarpBounded, interpret=True))(img, flow)
    out["backWarpBounded"] = _maxabs(got, want)

    # --- fused lite up path (ops/fusedup.py) ------------------------------
    from moephoto_tpu.ops.fusedup import fusedUpHeads

    import __graft_entry__ as GE

    params = GE._lite2Params(2, seed=3, dtype=jnp.bfloat16)
    M, c = 512, 48
    res = jnp.asarray(rng.randn(M, c).astype(np.float32) * 0.2, jnp.bfloat16)
    im = jnp.asarray(rng.randn(M, c).astype(np.float32) * 0.2, jnp.bfloat16)
    fu = functools.partial(fusedUpHeads, nUps=1, tileRows=512)
    got = jax.jit(lambda p, a, b: fu(p, a, b))(params, res, im)
    want = jax.jit(lambda p, a, b: fu(p, a, b, interpret=True))(params, res, im)
    out["fusedUpHeads"] = _maxabs(got, want)

    # --- adaptive-LUT transform (ops/lutkernel.py) ------------------------
    from moephoto_tpu.ops.lutkernel import ailutTransformPallas

    D = 33
    img = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    lut = jnp.asarray(rng.rand(1, 3, D, D, D).astype(np.float32))
    iv = rng.rand(1, 3, D - 1).astype(np.float32)
    iv = iv / iv.sum(-1, keepdims=True)
    vert = jnp.asarray(np.pad(np.cumsum(iv, -1), ((0, 0), (0, 0), (1, 0))))
    got = jax.jit(ailutTransformPallas)(img, lut, vert)
    want = jax.jit(functools.partial(ailutTransformPallas, interpret=True))(
        img, lut, vert
    )
    out["ailutTransformPallas"] = _maxabs(got, want)

    from moephoto_tpu.ops.lut import ailutTransform
    from moephoto_tpu.ops.lutkernel import ailutTransformPallasT

    # out-of-range values so the chip gate also covers the CUDA-style
    # linear EXTRAPOLATION path (the round-4 chain-4 finding: random
    # in-range inputs cannot catch a clamping kernel).  Reference is the
    # exact f32 XLA transform, and the metric is RELATIVE to the output
    # magnitude: a random cumsum grid has ~1e-4 vertex spacings, so
    # extrapolated hat weights reach ~1e3 and outputs ~1e3 — an absolute
    # tol is meaningless there.  (Interpret mode is NOT a valid
    # reference for this case: executed as plain XLA:TPU ops it loses
    # the kernel's bf16x2 hi/lo compensation — measured rel 4e-3 vs the
    # compiled kernel's 1.1e-5, /tmp/lut_cond3 round 4.)
    imgX = jnp.asarray((rng.rand(1, 32, 64, 3) * 1.9 - 0.4).astype(np.float32))
    got = jax.jit(ailutTransformPallasT)(imgX, lut, vert)
    want = ailutTransform(imgX, lut, vert)
    mag = float(jnp.max(jnp.abs(want)))
    out["ailutTransformPallasT_rel"] = _maxabs(got, want) / mag

    return out


def assertAll(results: dict, tol: float = TOL) -> None:
    bad = {k: v for k, v in results.items() if not (v < tol)}
    if bad:
        raise AssertionError(f"on-chip kernel parity FAILED (tol {tol}): {bad}")


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    r = runAll()
    print(r)
    assertAll(r)
    print("all kernels match on-chip")
