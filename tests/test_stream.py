"""Streaming runtime + temporal model graph tests."""

import os
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, needsReference

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def test_stream_window_pop():
    import jax.numpy as jnp

    from moephoto_tpu.engine.stream import Stream

    s = Stream(window=3)
    for i in range(5):
        s.put([jnp.full((2, 2), i, jnp.float32)])
    assert s.avail() == 3
    b = s.pop(2)  # (2, 3, 2, 2)
    assert b.shape == (2, 3, 2, 2)
    assert float(b[0, 0, 0, 0]) == 0 and float(b[1, 2, 0, 0]) == 3


def test_stream_start_padding():
    """Reference pad formula (imageProcess.py:447-459): padding=2 with 5
    items prepends state[4], state[3]."""
    from moephoto_tpu.engine.stream import Stream

    s = Stream(window=1)
    s.setPadding(2)
    for i in range(5):
        s.put([i])
    assert s.state[:4] == [4, 3, 0, 1]


def test_stream_graph_pipeline():
    from moephoto_tpu.engine.stream import Stream, StreamGraph

    graph = StreamGraph()
    src = Stream(tensor=False, batchFunc=lambda x: x)
    mid = Stream(tensor=False, batchFunc=lambda x: x)
    out = Stream(store=False)
    sink = []
    out.sink = sink
    graph.stage(lambda b, last=None: [v * 2 for v in b], [src], [mid])
    graph.stage(lambda b, last=None: [v + 1 for v in b], [mid], [out])
    for i in range(4):
        src.put([i])
        graph.run()
    graph.run(last=True)
    assert sink == [1, 3, 5, 7]


def _identityDown(x):
    return [x]


@needsReference
def test_estrnn_stream_graph():
    """End-to-end ESTRNN stream on random weights: output count and
    shape; parity of each compute stage is covered separately."""
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import ESTRNN as RE
    finally:
        os.chdir(cwd)
    import jax
    import jax.numpy as jnp

    from moephoto_tpu.models import estrnn as JE
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.progress import Node

    torch.manual_seed(0)
    cell = RE.RDBCell(RE.para)
    gsa = RE.GSA(RE.para)
    recons = RE.Reconstructor()
    params = {}

    def conv(mod, prefix, convT=None):
        sd = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        return {k: jnp.asarray(v) for k, v in convertStateDict(sd, convT).items()}

    params.update(conv(cell, "cell"))
    params.update(conv(gsa, "fusion"))
    params.update(
        conv(recons, "recons", lambda k, s: k in ("recons.0.weight", "recons.1.weight"))
    )
    opt = JE.ESTRNNOpt()
    opt.params = params
    opt.dtype = jnp.float32

    outs = []
    f = JE.doESTRNN(lambda x: None if x is None else [np.asarray(x)], Node({"op": "test"}), opt)
    n = 8
    rng = np.random.RandomState(0)
    frames = [rng.rand(32, 32, 3).astype(np.float32) for _ in range(n)]
    for fr in frames:
        outs.extend(f(jnp.asarray(fr)))
    outs.extend(f(None))
    assert len(outs) == n - 4  # 5-frame window, no start/end padding
    assert outs[0].shape == (32, 32, 3)


@needsReference
def test_estrnn_stream_with_padding():
    """start/end reflection padding yields one output per input frame."""
    import jax.numpy as jnp
    import torch

    from refshim import importReference

    importReference()
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import ESTRNN as RE
    finally:
        os.chdir(cwd)
    from moephoto_tpu.models import estrnn as JE
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.progress import Node

    torch.manual_seed(0)
    params = {}
    for mod, prefix, convT in (
        (RE.RDBCell(RE.para), "cell", None),
        (RE.GSA(RE.para), "fusion", None),
        (RE.Reconstructor(), "recons", lambda k, s: k in ("recons.0.weight", "recons.1.weight")),
    ):
        sd = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        params.update({k: jnp.asarray(v) for k, v in convertStateDict(sd, convT).items()})
    opt = JE.ESTRNNOpt()
    opt.params = params
    opt.dtype = jnp.float32
    opt.start = 2  # lookback (video.py:37: past_frames)
    opt.end = -2
    outs = []
    f = JE.doESTRNN(lambda x: None if x is None else [np.asarray(x)], Node({"op": "test"}), opt)
    n = 6
    rng = np.random.RandomState(0)
    for i in range(n):
        outs.extend(f(jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))))
    outs.extend(f(None))
    assert len(outs) == n


@needsReference
def test_ifrnet_stream_graph():
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import IFRNet as RI
    finally:
        os.chdir(cwd)
    import jax.numpy as jnp

    from moephoto_tpu.models import ifrnet as JI
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.progress import Node

    torch.manual_seed(0)
    chs = RI.Channels["S"]
    enc = RI.IFRNetEncoder(None, chs, 1e-3)
    dec = RI.IFRNetDecoder(None, chs, RI.SideChannels["S"], 0, 1e-3)
    params = {}
    for mod, prefix, convT in (
        (enc, "encoder", None),
        (
            dec,
            "decoder",
            lambda k, s: k.startswith("decoder.decoders.") and k.endswith(".2.weight"),
        ),
    ):
        sd = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        params.update({k: jnp.asarray(v) for k, v in convertStateDict(sd, convT).items()})

    opt = JI.IFRNetOpt()
    opt.params = params
    opt.dtype = jnp.float32
    opt.chs = chs
    opt.side = RI.SideChannels["S"]
    opt.sf = 2.0
    opt.dedupe = False
    opt.ensemble = 0

    outs = []
    f = JI.doSlomo(lambda x: None if x is None else [np.asarray(x)], Node({"op": "test"}), opt)
    n = 5
    rng = np.random.RandomState(0)
    for i in range(n):
        outs.extend(f(jnp.asarray(rng.rand(24, 20, 3).astype(np.float32))))
    outs.extend(f(None))
    # sf=2: first frame + per pair (interp + next) = 1 + 2*(n-1)
    assert len(outs) == 1 + 2 * (n - 1)
    assert outs[0].shape == (24, 20, 3)


@needsReference
def test_iconvsr_stream_graph():
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import videoSR as RV
    finally:
        os.chdir(cwd)
    import jax.numpy as jnp

    from moephoto_tpu.models import iconvsr as JV
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.progress import Node

    torch.manual_seed(0)
    mods = dict(
        spynet=RV.SpyNet(),
        edvr=RV.EDVRFeatureExtractor(7, 64),
        backward_trunk=RV.ConvResidualBlocks(64 + 3, 64, 2),
        forward_trunk=RV.ConvResidualBlocks(2 * 64 + 3, 64, 2),
        backward_fusion=RV.newFusion(),
        forward_fusion=RV.newFusion(),
        upsample=RV.Upsample(),
    )
    params = {}
    for prefix, mod in mods.items():
        sd = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        params.update({k: jnp.asarray(v) for k, v in convertStateDict(sd).items()})

    opt = JV.VSROpt()
    opt.params = params
    opt.dtype = jnp.float32
    # video.prepare sets reflection padding at stream start (lookback=3,
    # video.py:183-195) and end (lookahead=3, video.py:362-373)
    opt.start = 3

    # shrink the trunks for test speed: monkeypatch block count
    import moephoto_tpu.models.iconvsr as mod_iconvsr

    origTrunk = mod_iconvsr.trunkApply
    mod_iconvsr.trunkApply = lambda p, prefix, x, numBlocks=2: origTrunk(p, prefix, x, 2)
    try:
        outs = []
        f = JV.doVSR(lambda x: None if x is None else [np.asarray(x)], Node({"op": "test"}), opt)
        n = 8
        rng = np.random.RandomState(0)
        for i in range(n):
            outs.extend(f(jnp.asarray(rng.rand(48, 40, 3).astype(np.float32))))
        opt.end = -3
        outs.extend(f(None))
    finally:
        mod_iconvsr.trunkApply = origTrunk
    assert len(outs) == n  # one output per input frame with full padding
    assert outs[0].shape == (192, 160, 3)  # x4


@needsReference
def test_ifrnet_dedupe_paths():
    """Dedupe branch plumbing: with an unreachable skip threshold the
    output count matches the plain path; with identical frames and a
    reachable threshold, duplicates fold away (IFRNet.py:227-266)."""
    from refshim import importReference

    importReference()
    import torch

    cwd = os.getcwd()
    os.chdir(REFERENCE)
    try:
        import IFRNet as RI
    finally:
        os.chdir(cwd)
    import jax.numpy as jnp

    from moephoto_tpu.models import ifrnet as JI
    from moephoto_tpu.models.api import convertStateDict
    from moephoto_tpu.progress import Node

    torch.manual_seed(0)
    chs = RI.Channels["S"]
    enc = RI.IFRNetEncoder(None, chs, 1e-3)
    dec = RI.IFRNetDecoder(None, chs, RI.SideChannels["S"], 0, 1e-3)
    params = {}
    for mod, prefix, convT in (
        (enc, "encoder", None),
        (dec, "decoder", lambda k, s: k.startswith("decoder.decoders.") and k.endswith(".2.weight")),
    ):
        sd = {f"{prefix}.{k}": v.numpy() for k, v in mod.state_dict().items()}
        params.update({k: jnp.asarray(v) for k, v in convertStateDict(sd, convT).items()})

    def run(frames, high):
        opt = JI.IFRNetOpt()
        opt.params = params
        opt.dtype = jnp.float32
        opt.chs = chs
        opt.side = RI.SideChannels["S"]
        opt.sf = 2.0
        opt.dedupe = True
        opt.dedupeLow = -1.0
        opt.dedupeHigh = high
        opt.ensemble = 0
        outs = []
        f = JI.doSlomo(lambda x: None if x is None else [np.asarray(x)], Node({"op": "test"}), opt)
        for fr in frames:
            outs.extend(f(jnp.asarray(fr)))
        outs.extend(f(None))
        return outs

    rng = np.random.RandomState(0)
    frames = [rng.rand(24, 20, 3).astype(np.float32) for _ in range(4)]
    # threshold unreachable: behaves like the plain path
    outs = run(frames, high=2.0)
    assert len(outs) == 1 + 2 * (len(frames) - 1)
    assert outs[0].shape == (24, 20, 3)
    # identical frames with reachable threshold: everything folds
    a = frames[0]
    outsDup = run([a, a, a, a], high=0.999999)
    assert len(outsDup) < len(outs)


def test_lazy_row_refs_roundtrip():
    """put() of a batched array stores lazy RowRefs; pops re-merge runs
    into single slices; tees move refs; custom-batchFunc windows see
    materialized items — all value-identical to the eager behavior."""
    import jax.numpy as jnp

    from moephoto_tpu.engine.stream import RowRef, Stream, stackBatch

    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(5, 2, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 2, 3).astype(np.float32))

    # batched put -> lazy items; full-coverage pop returns the array itself
    s = Stream()
    s.put(a)
    assert all(isinstance(t, RowRef) for t in s.state)
    assert s.pop(5) is a

    # runs merge across two source batches + a loose item
    s = Stream()
    s.put(a)
    s.put([jnp.ones((2, 3), jnp.float32)])
    s.put(b)
    got = s.pop(8)
    want = np.concatenate([np.asarray(a), np.ones((1, 2, 3), np.float32), np.asarray(b)])
    np.testing.assert_array_equal(np.asarray(got), want)

    # windowed tensor pop builds (r, w, ...) column-wise, same values
    s = Stream(window=2)
    s.put(a)
    got = s.pop(4)
    assert got.shape == (4, 2, 2, 3)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(a[i : i + 2]))

    # popItems on a windowed tensor stream yields refs into ONE window
    # array (what tees forward); consumers restack losslessly
    s = Stream(window=2)
    s.put(a)
    items = s.popItems(4)
    assert all(isinstance(t, RowRef) for t in items)
    assert items[0].ref is items[3].ref
    np.testing.assert_array_equal(
        np.asarray(stackBatch(items)), np.stack([np.asarray(a[i : i + 2]) for i in range(4)])
    )

    # custom-batchFunc windows materialize RowRefs before user code
    seen = []
    s = Stream(window=2, tensor=False, batchFunc=lambda x: seen.append(x) or x)
    s.put(a)
    s.pop(2)
    for win in seen:
        assert all(not isinstance(t, RowRef) for t in win)

    # sinks receive materialized frames
    s = Stream(store=False)
    out: list = []
    s.sink = out
    s.put(a)
    assert len(out) == 5 and out[0].shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(a[2]))


def test_stack_runs_merges_and_pads():
    """stackRuns (engine/stream.py): (ref, idx) runs merge into single
    slices, Nones become zeros blocks, the tail pads to T rows, and the
    whole-array fast path aliases the source."""
    import jax.numpy as jnp

    from moephoto_tpu.engine.stream import stackRuns

    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.rand(4, 2, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(3, 2, 3).astype(np.float32))

    # full coverage of one source aliases it (no device ops)
    items = [(a, i) for i in range(4)]
    assert stackRuns(items, 4, 4, (2, 3)) is a

    # run merge across sources + Nones + tail padding
    items = [(a, 1), (a, 2), None, None, (b, 0)]
    got = np.asarray(stackRuns(items, 5, 7, (2, 3)))
    want = np.concatenate(
        [
            np.asarray(a[1:3]),
            np.zeros((2, 2, 3), np.float32),
            np.asarray(b[0:1]),
            np.zeros((2, 2, 3), np.float32),
        ]
    )
    np.testing.assert_array_equal(got, want)

    # non-contiguous indices split runs (values still exact)
    items = [(a, 2), (a, 0)]
    got = np.asarray(stackRuns(items, 2, 2, (2, 3)))
    np.testing.assert_array_equal(got, np.asarray(a)[[2, 0]])

    # dtype cast applies to merged segments
    got = stackRuns([(a, 0), None], 2, 2, (2, 3), dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
