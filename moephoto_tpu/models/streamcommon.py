"""Shared harness for temporal stream models (reference
``python/runSlomo.py``): per-frame driver with start/end reflection
padding, output trimming for segment-resume, and input alignment
padding."""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np


class StreamOpt:
    """Option object carried by a video step (reference ``getOptP``
    runSlomo.py:56-63 + video.prepare's start/end protocol)."""

    def __init__(self):
        self.startPadding = 0
        self.i = 0
        self.currentSize = 0
        self.outStart = 0
        self.outEnd = 0
        self.start = 0
        self.end = 0
        self.pad = lambda x: x
        self.unpad = lambda x: x


def ceilBy(d: int) -> Callable[[int], int]:
    return lambda x: -(-int(x) // d) * d


def alignPad(x: jnp.ndarray, align: int):
    """Reflection-pad an (H, W, C) frame bottom/right to a multiple of
    ``align``; returns (padded, unpad)."""
    h, w = x.shape[0], x.shape[1]
    H, W = ceilBy(align)(h), ceilBy(align)(w)

    def pad(f):
        return jnp.pad(f, ((0, H - h), (0, W - w), (0, 0)), mode="reflect")

    def unpad(f):
        return f[:h, :w]

    return pad, unpad, (H, W)


def extendRes(res: List, item):
    if isinstance(item, list):
        res.extend(item)
    elif item is not None:
        res.append(item)


def makeStreamFunc(
    func: Callable,
    node,
    opt: StreamOpt,
    nodes: Sequence,
    name: str,
    padStates: Sequence,
    initFunc: Callable,
    putFunc: Callable,
    graph,
    sink: List,
):
    """Build the per-frame function for a temporal step (reference
    ``makeStreamFunc`` runSlomo.py:66-108).

    ``func`` is the downstream per-frame pipeline; ``sink`` is the list
    the graph's final stage appends outputs to.  Contract: ``func`` must
    tolerate a single ``None`` call at end-of-stream (the forwarded
    flush sentinel) by returning ``None`` — pipeline funcs built by
    ``pipeline/steps.py`` are NonNullWrap'd and comply automatically.
    """
    for n in nodes:
        node.append(n)

    def f(x):
        node.reset()
        node.trace(0, p="{} start".format(name))
        if not opt.currentSize and x is not None:
            opt.currentSize = initFunc(opt, x)
        if opt.end:
            for s in padStates:
                s.setPadding(opt.end)
            opt.end = 0
        if opt.start:
            opt.startPadding = opt.start
            for s in padStates:
                s.setPadding(opt.start)
            opt.start = 0
        last = x is None
        if not last:
            putFunc(opt.pad(jnp.asarray(x)))
            opt.i += 1
            graph.run()
        else:
            graph.run(last=True)
        out = list(sink)
        del sink[:]
        if last and opt.outEnd:
            out = out[: opt.outEnd]
            opt.outEnd = 0
        l = len(out)
        out = out[opt.outStart :]
        opt.outStart = max(0, opt.outStart - l)
        node.trace(len(out))
        res: List = []
        for item in out:
            extendRes(res, func(opt.unpad(item)))
        if last:
            # Forward the end-of-stream sentinel so a CHAINED temporal
            # step (e.g. demob -> slomo) flushes its own graph too.  The
            # reference's pull-generator design drains downstream stages
            # through lookahead accounting alone (video.py:361-372 +
            # runSlomo.py:66-108); our eager StreamGraph only emits a
            # stage's tail under run(last=True), which this call
            # triggers.  Plain per-frame funcs are NonNullWrap'd, so the
            # sentinel passes through them as None harmlessly.
            extendRes(res, func(None))
        return res

    return f
