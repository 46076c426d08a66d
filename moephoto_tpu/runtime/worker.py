"""Worker-process task runtime (reference ``python/worker.py``): binds
the progress root, wraps task handlers with error capture and logging,
and runs the pipe-driven task loop."""

from __future__ import annotations

from traceback import format_exc

from moephoto_tpu.config import config
from moephoto_tpu.progress import clearOps, initialETA, loadOps, saveOps, setCallback
from moephoto_tpu.runtime.context import context
from moephoto_tpu.utils.logger import initLogging

log = initLogging(config.logPath).getLogger("Moe")
opsPath = config.opsPath
getInfo = lambda f, args: [f.__name__] + [filterOpt(arg) for arg in args]


def filterOpt(item):
    if isinstance(item, dict) and "opt" in item:
        res = item.copy()
        del res["opt"]
        return res
    return item


def begin(root, nodes=[], setAllCallback=True, bench=False, clear=False):
    context.root = root
    root.nodes = []
    for n in nodes:
        root.append(n)
    if setAllCallback:
        if not setAllCallback < 0:
            setCallback(root, onProgress, True, bench)
    else:
        root.setCallback(onProgress)
    clearOps(root, clear)
    initialETA(root)
    return root


def onProgress(node, kwargs={}):
    res = (
        {
            "eta": context.root.eta,
            "gone": context.root.gone,
            "total": context.root.total,
        }
        if context.root
        else {}
    )
    res.update(kwargs)
    saveOps(opsPath)
    if hasattr(node, "name") and node.gone < node.total:
        res["stage"] = node.name
        if node.total > 1:
            res["stageProgress"] = node.gone
            res["stageTotal"] = node.total
    if context.notifier is not None:
        context.notifier.send(res)


def enhance(f, verbose=True):
    """Wrap a task handler: exceptions -> structured Fail result; device
    caches dropped in finally (reference worker.py:52-74)."""

    def g(*args, **kwargs):
        try:
            res = {"result": f(*args, **kwargs)}
            code = 200
            saveOps(opsPath, True)
            if verbose:
                log.info(getInfo(f, args))
        except Exception:
            info = getInfo(f, args)
            log.exception(info)
            res = {"result": "Fail", "call": info, "exception": format_exc()}
            code = 400
            if context.notifier is not None:
                context.notifier.send(res)
        finally:
            clean()
        return res, code

    return g


def clean():
    """Between-task device cleanup (the analog of
    ``torch.cuda.empty_cache``, reference worker.py:71-72).  JAX device
    buffers are freed by GC when the last reference drops; compiled
    executables are deliberately kept (recompiling them costs seconds).
    A gc pass promptly releases the previous task's intermediates."""
    import gc

    gc.collect()


def worker(main, taskIn, taskOut, notifier, stopEvent, isWindows):
    """Task loop over the mp.Pipe (reference worker.py:76-94)."""
    mm, routes = main()
    context.sharedView = mm.buf if not isWindows else memoryview(mm)
    context.shared = mm.buf.obj if not isWindows else mm
    context.shared.seek(0)
    context.notifier = notifier
    context.stopFlag = stopEvent
    loadOps(opsPath)
    while True:
        task = taskIn.recv()
        stopEvent.clear()
        result = routes[task[0]](*task[1:])
        taskOut.send(result)
