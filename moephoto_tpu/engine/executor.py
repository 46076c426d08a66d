"""Model executor: jit-cached tiled inference with precision policy,
channel folding, self-ensemble and strength blending.

Replaces the reference's ``Option`` + ``doCrop`` + ``ensemble`` +
``strengthOp`` machinery (``imageProcess.py:157-172,370-395,562-572``)
with a functional wrapper: parameters are an explicit pytree argument
(so jit caches one executable per image bucket, not per weight set) and
the whole pad->tile->model->blend->crop pipeline compiles as one XLA
program.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moephoto_tpu.config import config
from moephoto_tpu.engine.tiling import TileSpec, tiledApply

# The 8 dihedral symmetries used by self-ensemble (reference
# ``trans/transInv`` ``imageProcess.py:569-571``), expressed on HWC.
_transpose = lambda x: jnp.swapaxes(x, 0, 1)
_flip = lambda x: x[:, ::-1]
_flip2 = lambda x: x[::-1, ::-1]
_ident = lambda x: x

# (forward, inverse) pairs; forward applied before the model, inverse after.
ENSEMBLE_TRANSFORMS: Tuple[Tuple[Callable, Callable], ...] = (
    (_transpose, _transpose),
    (_flip, _flip),
    (_flip2, _flip2),
    (lambda x: _transpose(_flip(x)), lambda x: _flip(_transpose(x))),
    (lambda x: _flip(_transpose(x)), lambda x: _transpose(_flip(x))),
    (lambda x: _transpose(_flip2(x)), lambda x: _flip2(_transpose(x))),
    (lambda x: _flip2(_transpose(x)), lambda x: _transpose(_flip2(x))),
)


class ModelExec:
    """A ready-to-run model: ``exec(image_hwc) -> image_hwc``.

    Args:
      apply: pure function ``(params, x_bhwc) -> y_bhwc``.
      params: parameter pytree.
      spec: static tile spec.
      channelSplit: Y-channel models — fold image channels into the tile
        batch, each processed as a (th, tw, 1) plane (reference
        ``squeeze/unsqueeze`` channel trick, ``runSR.py:38-40``).
      outC: output channels (defaults: input channels).
      prepare: optional pre-model map on the full image (e.g. dehaze
        normalization, ``dehaze.py:12,36``).
      strength: blend factor with the input (``strengthOp`` :562).
      ensemble: number of extra dihedral transforms to average (0-7).
    """

    def __init__(
        self,
        apply: Callable,
        params,
        spec: TileSpec,
        channelSplit: bool = False,
        outC: Optional[int] = None,
        prepare: Optional[Callable] = None,
        strength: float = 1.0,
        ensemble: int = 0,
        dtype=None,
        name: str = "",
        pack: int = 0,
    ):
        self.apply = apply
        self.params = params
        self.spec = spec
        self.channelSplit = channelSplit
        self.outC = outC
        self.prepare = prepare
        self.strength = float(strength)
        self.ensemble = int(ensemble)
        self.dtype = dtype or config.dtype()
        self.name = name
        # pack > 0: Y-channel model executed plane-packed — ``pack``
        # planes ride the channel axis against block-diagonal weights
        # (params must already be packBlockDiag(params, pack)).  pack=2
        # puts 96 channels in one 128-lane MXU block: ~2x over
        # plane-batched execution at 48 channels.
        self.pack = int(pack)
        self._jitCache: Dict = {}

    @property
    def scale(self) -> float:
        return self.spec.scale

    def _tileFn(self, params):
        if self.pack:
            p = self.pack

            def f(t):
                b, th, tw, c = t.shape
                n = b * c
                assert n % p == 0, (b, c, p)
                planes = jnp.transpose(t, (0, 3, 1, 2)).reshape(n // p, p, th, tw)
                planes = jnp.transpose(planes, (0, 2, 3, 1))
                out = self.apply(params, planes)
                ob, oh, ow, oc = out.shape
                assert oc == p
                out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, c, oh, ow)
                return jnp.transpose(out, (0, 2, 3, 1))

            return f
        if not self.channelSplit:
            return lambda t: self.apply(params, t)

        def f(t):
            b, th, tw, c = t.shape
            planes = jnp.transpose(t, (0, 3, 1, 2)).reshape(b * c, th, tw, 1)
            out = self.apply(params, planes)
            ob, oh, ow, oc = out.shape
            assert oc == 1
            return jnp.transpose(
                out.reshape(b, c, oh, ow), (0, 2, 3, 1)
            )

        return f

    def _mesh(self):
        """Inference mesh from ``config.meshShape`` (None = single
        device).  Tiles shard across it as pure data parallelism — see
        engine/tiling._chunked."""
        from moephoto_tpu.parallel.mesh import activeMesh

        return activeMesh()

    def _process(self, params, x, mesh=None):
        inp = x
        if self.prepare is not None:
            x = self.prepare(x)
        x = x.astype(self.dtype)
        outC = self.outC or x.shape[-1]

        def run(img):
            return tiledApply(img, self._tileFn(params), self.spec, outC, mesh)

        y = run(x)
        if self.ensemble:
            for fwd, inv in ENSEMBLE_TRANSFORMS[: self.ensemble]:
                y = y + inv(run(fwd(x)))
            y = y / (self.ensemble + 1)
        y = y.astype(jnp.float32)
        if self.strength != 1.0 and y.shape == inp.shape:
            y = self.strength * y + (1.0 - self.strength) * inp.astype(jnp.float32)
        return y

    def __call__(self, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        if x.dtype in (jnp.uint8, jnp.uint16, jnp.int32):
            raise TypeError("ModelExec expects a float image in [0, 1]")
        mesh = self._mesh()
        meshKey = tuple(mesh.devices.shape) if mesh is not None else None
        key = (x.shape, str(x.dtype), self.strength, self.ensemble, meshKey)
        if key not in self._jitCache:
            import functools

            self._jitCache[key] = jax.jit(
                functools.partial(self._process, mesh=mesh)
            )
        return self._jitCache[key](self.params, x)

    def _processWhole(self, params, x):
        """Un-tiled path (e.g. AiLUT, whose backbone codes must come from
        the whole image): pad to alignment, run once, crop."""
        from moephoto_tpu.engine.tiling import ceilTo, reflectPadHW

        inp = x
        if self.prepare is not None:
            x = self.prepare(x)
        x = x.astype(self.dtype)
        h, w = x.shape[0], x.shape[1]
        ph, pw = ceilTo(h, self.spec.align), ceilTo(w, self.spec.align)
        xp = reflectPadHW(x, ph - h, pw - w)
        y = self.apply(params, xp[None])[0]
        sc = self.spec.scale
        y = y[: int(round(h * sc)), : int(round(w * sc))].astype(jnp.float32)
        if self.strength != 1.0 and y.shape == inp.shape:
            y = self.strength * y + (1.0 - self.strength) * inp.astype(jnp.float32)
        return y

    def applyWhole(self, x) -> jnp.ndarray:
        """Whole-image apply.  NOTE: deliberately single-device — the
        untiled path exists for models whose output depends on global
        image statistics (AiLUT backbone codes), so there is no tile
        batch to shard; ``config.meshShape`` only affects the tiled
        path (see ``tiling.runTiled``)."""
        x = jnp.asarray(x)
        key = ("whole", x.shape, str(x.dtype), self.strength)
        if key not in self._jitCache:
            self._jitCache[key] = jax.jit(self._processWhole)
        return self._jitCache[key](self.params, x)


def rgbFilter(exec_: ModelExec) -> Callable:
    """Step function with alpha passthrough (reference ``_RGBFilter``
    ``imageProcess.py:370-377``): a trailing alpha channel bypasses the
    model and is re-attached (nearest-resized if the model scales).
    Device-resident throughout."""

    def f(im):
        im = jnp.asarray(im)
        alpha = None
        if im.shape[-1] == 4:
            alpha = im[..., 3:]
            im = im[..., :3]
        out = exec_(im)
        if alpha is not None:
            if alpha.shape[:2] != out.shape[:2]:
                from moephoto_tpu.models.api import resizeNearest

                alpha = resizeNearest(alpha[None], out.shape[0], out.shape[1])[0]
            out = jnp.concatenate([out, alpha.astype(out.dtype)], axis=-1)
        return out

    return f
