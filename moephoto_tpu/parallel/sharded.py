"""Sharded execution: halo-exchange spatial parallelism + data-parallel
training step over a (dp, sp) mesh.

The reference's tiler blends overlapping tiles sequentially on one GPU
(``imageProcess.py:157-172``); across chips the equivalent is: shard
image rows over the ``sp`` axis, ``ppermute`` halo rows between
neighbours over ICI, run the model on the locally-padded shard, crop the
halo.  Exact for models whose receptive field fits in the halo.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def haloExchange(
    x: jnp.ndarray, halo: int, axisName: str, mode: str = "reflect"
) -> jnp.ndarray:
    """Pad the local row-shard with ``halo`` rows from each neighbour.

    x: (B, Hlocal, W, C) inside shard_map.  At the global edges the
    wrap-around neighbour rows are invalid and are replaced according to
    ``mode``, matching what a single-device ``jnp.pad`` of the full
    image would produce there: 'reflect' (conv stages), 'edge'
    (border-mode warps), or 'zero' (zeros-mode warps / don't-care halos
    that get cropped).
    """
    n = jax.lax.psum(1, axisName)
    idx = jax.lax.axis_index(axisName)
    top = x[:, :halo]  # rows this shard sends upward
    bot = x[:, -halo:]
    fromAbove = jax.lax.ppermute(bot, axisName, [(i, (i + 1) % n) for i in range(n)])
    fromBelow = jax.lax.ppermute(top, axisName, [(i, (i - 1) % n) for i in range(n)])
    if mode == "reflect":
        edgeTop = x[:, 1 : halo + 1][:, ::-1]
        edgeBot = x[:, -halo - 1 : -1][:, ::-1]
    elif mode == "edge":
        edgeTop = jnp.broadcast_to(x[:, :1], top.shape)
        edgeBot = jnp.broadcast_to(x[:, -1:], bot.shape)
    elif mode == "zero":
        edgeTop = jnp.zeros_like(top)
        edgeBot = jnp.zeros_like(bot)
    else:
        raise ValueError(mode)
    fromAbove = jnp.where(idx == 0, edgeTop, fromAbove)
    fromBelow = jnp.where(idx == n - 1, edgeBot, fromBelow)
    return jnp.concatenate([fromAbove, x, fromBelow], axis=1)


def shardedTiledForward(
    apply: Callable,
    mesh: Mesh,
    halo: int,
    scale: int = 1,
):
    """Build a pjit-able forward over a (dp, sp) mesh.

    apply: (params, x_bhwc) -> y with spatial scale ``scale``.
    Input (B, H, W, C) sharded P('dp', 'sp'); output identically sharded.
    """

    def local(params, x):
        xp = haloExchange(x, halo, "sp")
        y = apply(params, xp)
        hs = halo * scale
        return y[:, hs:-hs]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("dp", "sp", None, None)),
        out_specs=P("dp", "sp", None, None),
        check_vma=False,
    )


def makeShardedTrainStep(
    apply: Callable,
    mesh: Mesh,
    halo: int,
    scale: int = 1,
    lr: float = 1e-4,
):
    """Full data+spatial-parallel training step: L1 loss against a
    sharded target, gradients all-reduced over both mesh axes, SGD
    update.  (The reference has no training at all — this is the
    TPU-native extension enabling fine-tuning of the zoo.)
    """

    def localLoss(params, x, y):
        xp = haloExchange(x, halo, "sp")
        pred = apply(params, xp)
        hs = halo * scale
        pred = pred[:, hs:-hs]
        loss = jnp.mean(jnp.abs(pred.astype(jnp.float32) - y.astype(jnp.float32)))
        # mean over shards = psum / n
        n = jax.lax.psum(1, "dp") * jax.lax.psum(1, "sp")
        return jax.lax.psum(loss, ("dp", "sp")) / n

    def localStep(params, x, y):
        loss, grads = jax.value_and_grad(localLoss)(params, x, y)
        # localLoss already psums the loss; grads are therefore summed
        # implicitly by autodiff of psum -> identical on every shard.
        newParams = jax.tree_util.tree_map(
            lambda p, g: (p.astype(jnp.float32) - lr * g.astype(jnp.float32)).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating)
            else p,
            params,
            grads,
        )
        return newParams, loss

    stepped = shard_map(
        localStep,
        mesh=mesh,
        in_specs=(P(), P("dp", "sp", None, None), P("dp", "sp", None, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(stepped)


def makeOptaxTrainStep(
    apply: Callable,
    mesh: Mesh,
    tx,
    halo: int,
    scale: int = 1,
    computeDtype=None,
):
    """``makeShardedTrainStep`` with a real optimizer: L1 loss over a
    dp (batch) x sp (rows, ICI halo exchange) sharded patch batch,
    gradients identical on every shard via the psum'd loss, optax
    update threaded through a replicated opt_state.  The fine-tuning
    CLI (tools/train.py) builds on this; the reference has no training
    path at all.

    ``computeDtype=jnp.bfloat16`` is the mixed-precision config
    matching the inference stack's convention (bf16 compute, fp32
    accumulation — CLAUDE.md): master params and optimizer state stay
    fp32; the forward/backward runs on bf16-cast params and inputs, the
    loss reduction in fp32, and gradients land fp32 on the masters
    through the cast.

    apply: (params, (B, h, w, C) LR) -> (B, h*scale, w*scale, C).
    Returns ``step(params, optState, x, y) -> (params, optState, loss)``
    (jitted; call under ``with mesh:``)."""
    import optax

    def forward(params, x):
        if computeDtype is None:
            return apply(params, x)
        # the model zoo's convention is weights-follow-input
        # (models/api.py conv2d casts w to x.dtype), so casting the
        # input runs the whole forward/backward in computeDtype while
        # the fp32 masters receive fp32 grads through the cast.  The
        # trainAccum context drops the convs' fp32 output pin during
        # tracing — JAX's conv transpose rule cannot type a bf16xfp32
        # operand mix (see models/api._convPET).
        from ..models.api import trainAccum

        with trainAccum():
            return apply(params, x.astype(computeDtype))

    def localLoss(params, x, y):
        xp = haloExchange(x, halo, "sp")
        pred = forward(params, xp)
        hs = halo * scale
        pred = pred[:, hs:-hs]
        loss = jnp.mean(jnp.abs(pred.astype(jnp.float32) - y.astype(jnp.float32)))
        n = jax.lax.psum(1, "dp") * jax.lax.psum(1, "sp")
        return jax.lax.psum(loss, ("dp", "sp")) / n

    def localStep(params, optState, x, y):
        loss, grads = jax.value_and_grad(localLoss)(params, x, y)
        updates, optState = tx.update(grads, optState, params)
        params = optax.apply_updates(params, updates)
        return params, optState, loss

    stepped = shard_map(
        localStep,
        mesh=mesh,
        in_specs=(P(), P(), P("dp", "sp", None, None), P("dp", "sp", None, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(stepped)
