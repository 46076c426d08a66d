"""Hierarchical progress tracking with an online per-op time model.

Fulfils the reference's progress contract (SURVEY.md section 5): every
pipeline stage is a node in a tree; finishing work on a node updates an
exponentially-averaged seconds-per-load estimate for that op kind,
estimates bubble up the tree as ETAs, and the learned weights persist
to ``.user/ops.json`` in the format the frontend's diagnosis page
consumes (``[{op, weight, samples}, ...]``).

Implementation is our own: op statistics live in an ``OpStats`` class
keyed by a frozen view of the op descriptor; file IO runs on daemon
threads.
"""

from __future__ import annotations

import json
import threading
import time
from os.path import exists
from typing import Callable, Dict, List, Optional

EMA_KEEP = 0.9  # weight retained per new sample
SILENT_OPS = {"toFloat", "toOutput", "Channel", "toBuffer", "toTorch"}


class OpStats:
    """Learned seconds-per-unit-load for one op kind."""

    __slots__ = ("op", "weight", "samples")

    def __init__(self, define: dict, learn):
        self.op = define
        self.reset(learn)

    def reset(self, learn=True):
        self.weight = 1e-6 if learn else 1
        self.samples = 0

    def addSample(self, secondsPerLoad: float):
        global _dirty
        if self.samples == 0:
            _dirty = True
        self.samples += 1
        if self.samples <= 2:
            self.weight = secondsPerLoad
        else:
            self.weight = EMA_KEEP * self.weight + (1 - EMA_KEEP) * secondsPerLoad

    def serialize(self) -> dict:
        return dict(op=self.op, weight=self.weight, samples=self.samples)


_registry: Dict[int, OpStats] = {}
_preloaded: Dict[int, tuple] = {}
_dirty = False

opKey = lambda define: hash(frozenset(define.items()))
# aliases used across the pipeline code
getOpKey = opKey
ops = _registry
NullFunc = lambda *args: None


def _statsFor(define: dict, learn) -> OpStats:
    key = opKey(define)
    st = _registry.get(key)
    if st is None:
        st = OpStats(define, learn)
        if key in _preloaded:
            st.weight, st.samples = _preloaded[key]
        _registry[key] = st
    return st


# --- persistence ------------------------------------------------------------

def serializeOps() -> List[dict]:
    return [st.serialize() for st in _registry.values()]


def _writeOps(path: str):
    with open(path, "w") as fp:
        json.dump(serializeOps(), fp, ensure_ascii=False, indent=2)


def saveOps(path: Optional[str] = None, force: bool = False):
    global _dirty
    if path and (_dirty or force):
        threading.Thread(target=_writeOps, args=(path,), daemon=True).start()
        _dirty = False
    return serializeOps()


def _readOps(path: str):
    if not exists(path):
        return
    with open(path, "r") as fp:
        for entry in json.load(fp):
            _preloaded[opKey(entry["op"])] = (entry["weight"], entry["samples"])


def loadOps(path: str):
    t = threading.Thread(target=_readOps, args=(path,), daemon=True)
    t.start()
    return t


def clearOps(node, flag: bool = True):
    """Forget learned weights below ``node`` (bench 'clear' option)."""
    if not flag:
        return
    _preloaded.clear()

    def walk(n):
        _registry[n.op].reset(n.learn)
        for c in n.nodes:
            walk(c)

    walk(node)


# --- tree math --------------------------------------------------------------

def _childEttSum(node) -> float:
    return sum(c.ett for c in node.nodes) if node.nodes else 1


def updateNode(node):
    perUnit = _registry[node.op].weight * node.load * _childEttSum(node)
    if node.total >= 0:
        node.ett = node.total * perUnit
        node.eta = (node.total - node.gone) * perUnit
    else:
        node.ett = node.eta = -1


def updateAncestor(node, adjustEta: bool = False):
    parent = node.parent
    while parent:
        idx = parent.nodes.index(node)
        updateNode(parent)
        if adjustEta and parent.total >= 0:
            parent.eta += node.eta - sum(c.ett for c in parent.nodes[: idx + 1])
            if parent.eta < 0:
                parent.eta = parent.ett * (parent.total - parent.gone) / parent.total
        node, parent = parent, parent.parent


def initialETA(node) -> float:
    node.gone = 0
    inner = sum(initialETA(c) for c in node.nodes) if node.nodes else 1
    base = _registry[node.op].weight * node.load * max(0, node.total - node.gone)
    node.eta = base * inner if node.total >= 0 else -1
    node.ett = node.eta
    return node.ett


def setCallback(node, callback, all: bool = False, bench: bool = False):
    def walk(n):
        if all or hasattr(n, "name"):
            n.setCallback(callback, bench)
        for c in n.nodes:
            walk(c)

    walk(node)


def recurse(f):
    def walk(n):
        f(n)
        for c in n.nodes:
            walk(c)

    return walk


class Node:
    """One pipeline stage in the progress tree."""

    def __init__(self, op: dict, load=1, total=1, learn=30, callback=NullFunc, name=None):
        self.load = load
        self.total = total
        self.gone = 0
        self.ett = 0.0
        self.eta = 0.0
        self.mark = 0.0
        self.parent = None
        self.bench = False
        self.learn = learn or 0
        self.callback = callback
        self.nodes: List[Node] = []
        if name is not None:
            self.name = name
        self.op = opKey(op)
        _statsFor(op, learn)

    # -- tree wiring --------------------------------------------------------
    def append(self, child: "Node") -> "Node":
        self.nodes.append(child)
        child.parent = self
        return self

    def remove(self, update: bool = False):
        parent = self.parent
        parent.nodes.remove(self)
        self.parent = None
        if update:
            updateNode(parent)
            updateAncestor(parent)

    def moveTo(self, target: "Node", pos: int = -1):
        changed = self.parent != target
        if self.parent:
            self.remove(changed)
        if pos < 0:
            target.append(self)
        else:
            target.nodes.insert(pos, self)
            self.parent = target
        if changed:
            updateAncestor(self)

    # -- progress -------------------------------------------------------------
    def setCallback(self, callback=NullFunc, bench: bool = False):
        stats = _registry[self.op]
        self.callback = NullFunc if stats.op.get("op", "") in SILENT_OPS else callback
        self.bench = bench and self.learn
        if self.bench:
            self.learn = float("inf")

    def multipleLoad(self, scale=1):
        if self.nodes:
            for child in self.nodes:
                child.multipleLoad(scale)
        else:
            self.load *= scale

    def reset(self) -> "Node":
        self.gone = 0
        stats = _registry[self.op]
        self.ett = stats.weight * self.load * max(0, self.total) * _childEttSum(self)
        self.eta = self.ett
        return self

    def trace(self, progress=1, **info):
        """Advance by ``progress`` units, learn timing, notify."""
        global _dirty
        self.gone += progress
        stats = _registry[self.op]
        if self.learn > stats.samples:
            now = time.perf_counter()
            if progress > 0:
                elapsed = now - self.mark
                if self.load > 0:
                    stats.addSample(elapsed / self.load / progress)
                if stats.samples >= self.learn:
                    self.learn = False
                    _dirty = True
                if self.bench:
                    info.update(stats.serialize())
            self.mark = now
        if progress > 0:
            updateNode(self)
            updateAncestor(self, True)
        return self.callback(self, info)

    def bindFunc(self, f: Callable) -> Callable:
        def wrapped(*args, **kwargs):
            self.reset()
            self.trace(0)
            result = f(*args, **kwargs)
            self.trace()
            return result

        return wrapped

    def update(self, content: dict):
        if "op" in content:
            content["op"] = opKey(content["op"])
        self.__dict__.update(content)
        updateNode(self)
        updateAncestor(self)

    def toStop(self):
        self.total = self.gone + 1
        return self.trace(0)
