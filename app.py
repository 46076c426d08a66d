"""Application entry (reference ``python/MoePhoto.py``): spawns the
compute worker process (JAX lives there), three pipes, a stop event and
the shared-memory image exchange, then serves HTTP.

Usage: ``python app.py [-g]``  (-g binds 0.0.0.0)
"""

import multiprocessing as mp
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moephoto_tpu.config import defaultConfig

sharedMemSize = defaultConfig["sharedMemSize"][0]
isWindows = sys.platform[:3] == "win"
mmName = "SharedMemoryMoeTPU"


def getMM(size, create=True):
    from multiprocessing.shared_memory import SharedMemory

    try:
        return SharedMemory(mmName, create, size)
    except FileExistsError:
        return SharedMemory(mmName, False, size)


def main():
    """Worker-side bootstrap: build the task route table (reference
    ``MoePhoto.py:23-62``); model imports happen lazily inside."""
    from moephoto_tpu.config import config, enableCompilationCache

    enableCompilationCache()
    from moephoto_tpu.pipeline.steps import genProcess
    from moephoto_tpu.progress import Node
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.runtime.worker import begin, enhance
    from moephoto_tpu.video.engine import SR_vid

    stepFile = [{"op": "file"}]
    imNode = Node({"op": "image"}, learn=0)

    def lock(duration):
        import time

        node = begin(Node({}, 1, duration, 0))
        node.reset().trace(0)
        while duration > 0 and not context.stopFlag.is_set():
            duration -= 1
            time.sleep(1)
            node.trace()
        return duration

    def imageEnhance(size, *args):
        outputOpt = args[-1]
        name = outputOpt.get("file") if isinstance(outputOpt, dict) else None
        if not (isinstance(outputOpt, dict) and outputOpt.get("op") == "output"):
            outputOpt = {}
        bench = outputOpt.get("diagnose", {}).get("bench", False)
        trace = outputOpt.get("trace", False) or bench
        process, nodes = genProcess(stepFile + list(args))
        return begin(imNode, nodes, trace, bench).bindFunc(process)(size, name=name)

    mm = getMM(sharedMemSize, False)
    return mm, {
        "lockInterface": lock,
        "image_enhance": enhance(imageEnhance, verbose=False),
        "batch": enhance(imageEnhance, verbose=False),
        "video_enhance": enhance(SR_vid),
        "systemInfo": enhance(config.system),
    }


if __name__ == "__main__":
    mp.set_start_method("spawn")
    from moephoto_tpu.runtime.worker import worker

    taskInReceiver, taskInSender = mp.Pipe(False)
    taskOutReceiver, taskOutSender = mp.Pipe(False)
    noter, notifier = mp.Pipe(False)
    stopEvent = mp.Event()
    mp.Process(
        target=worker,
        args=(main, taskInReceiver, taskOutSender, notifier, stopEvent, isWindows),
        daemon=True,
    ).start()
    from moephoto_tpu.runtime.server import config as serverConfig, runserver

    mm = getMM(sharedMemSize)
    run = runserver(taskInSender, taskOutReceiver, noter, stopEvent, mm, isWindows)
    host = "0.0.0.0" if "-g" in sys.argv[1:] else "127.0.0.1"
    port = serverConfig.get("port", 2333)
    run(host, port)
