"""Worker-process task runtime.

The worker side of the two-process split (SURVEY.md section 5): owns the
progress tree, decorates task handlers with structured error capture,
and services requests arriving over the mp.Pipe.  Progress callbacks
stream ``{eta, gone, total, stage}`` dicts to the server through the
notifier pipe; learned op timings persist via progress.saveOps.

Where the reference empties the CUDA allocator between tasks
(worker.py:71-72), JAX frees device buffers when their last Python
reference drops, so inter-task cleanup is a prompt GC pass; compiled
executables are deliberately retained (recompiling costs seconds).
"""

from __future__ import annotations

import gc
from traceback import format_exc

from moephoto_tpu.config import config
from moephoto_tpu.progress import clearOps, initialETA, loadOps, saveOps, setCallback
from moephoto_tpu.runtime.context import context
from moephoto_tpu.utils.logger import initLogging

log = initLogging(config.logPath).getLogger("Moe")
opsPath = config.opsPath


def _describeCall(f, args):
    """Loggable call signature with model opts elided (they hold arrays).

    Dict args are snapshot-COPIED here: genProcess attaches live
    ``ModelExec`` objects ('opt') to the step dicts it receives, so a
    description that aliases them becomes unpicklable the moment the
    task starts — and the failure REPLY carrying it would kill the
    worker's result pipe (one malformed request took the whole worker
    down before this copy)."""

    def strip(a):
        if isinstance(a, dict):
            return {k: v for k, v in a.items() if k != "opt"}
        return a

    return [f.__name__] + [strip(a) for a in args]


filterOpt = lambda item: _describeCall(lambda: 0, [item])[1]
getInfo = _describeCall


def _notify(payload: dict):
    if context.notifier is not None:
        context.notifier.send(payload)


def onProgress(node, kwargs={}):
    """Progress-tree callback: root ETA summary + per-stage detail."""
    root = context.root
    payload = dict(eta=root.eta, gone=root.gone, total=root.total) if root else {}
    payload.update(kwargs)
    saveOps(opsPath)
    if hasattr(node, "name") and node.gone < node.total:
        payload["stage"] = node.name
        if node.total > 1:
            payload["stageProgress"] = node.gone
            payload["stageTotal"] = node.total
    _notify(payload)


def begin(root, nodes=[], setAllCallback=True, bench=False, clear=False):
    """Rebuild the progress tree under ``root`` and wire callbacks.

    ``setAllCallback``: truthy → every named node reports; falsy → only
    the root; negative → reporting disabled (headless bench runs).
    """
    context.root = root
    root.nodes = []
    for node in nodes:
        root.append(node)
    if not setAllCallback:
        root.setCallback(onProgress)
    elif setAllCallback > 0:
        setCallback(root, onProgress, True, bench)
    clearOps(root, clear)
    initialETA(root)
    return root


def clean():
    """Release the previous task's device intermediates promptly."""
    gc.collect()


def enhance(f, verbose=True):
    """Decorate a task handler to return ``(body, status)``.

    Success → ``{'result': ...}, 200`` (and the op-timing file is
    flushed); any exception → ``{'result': 'Fail', 'call', 'exception'},
    400`` pushed through the notifier so the client sees the failure
    without polling.
    """

    def run(*args, **kwargs):
        called = _describeCall(f, args)
        try:
            body = {"result": f(*args, **kwargs)}
            saveOps(opsPath, True)
            if verbose:
                log.info(called)
            return body, 200
        except Exception:
            log.exception(called)
            body = {"result": "Fail", "call": called, "exception": format_exc()}
            _notify(body)
            return body, 400
        finally:
            clean()

    return run


def worker(main, taskIn, taskOut, notifier, stopEvent, isWindows):
    """Blocking request loop over the task pipe.

    ``main()`` returns the shared-memory handle and the route table;
    each message is ``(routeName, *args)`` and the handler's
    ``(body, status)`` is sent straight back.
    """
    mm, routes = main()
    if isWindows:
        context.shared, context.sharedView = mm, memoryview(mm)
    else:
        context.shared, context.sharedView = mm.buf.obj, mm.buf
    context.shared.seek(0)
    context.notifier = notifier
    context.stopFlag = stopEvent
    loadOps(opsPath)
    while True:
        name, *args = taskIn.recv()
        stopEvent.clear()
        taskOut.send(routes[name](*args))
