"""Application entry: compute worker process + HTTP frontend.

Two processes connected by three pipes, a stop event, and a shared
memory block for image payloads (SURVEY.md section 5; reference
``python/MoePhoto.py``).  JAX only ever loads in the worker so the
HTTP process stays responsive during compiles.

Usage: ``python app.py [-g]``  (-g binds 0.0.0.0)
"""

import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moephoto_tpu.config import defaultConfig

SHM_NAME = "SharedMemoryMoeTPU"
SHM_SIZE = defaultConfig["sharedMemSize"][0]
onWindows = sys.platform.startswith("win")


def openShared(create: bool):
    from multiprocessing.shared_memory import SharedMemory

    try:
        return SharedMemory(SHM_NAME, create, SHM_SIZE)
    except FileExistsError:
        return SharedMemory(SHM_NAME, False, SHM_SIZE)


def main():
    """Worker-side bootstrap: returns (sharedMemory, route table).

    Imports are deferred to here so the server process never pays for
    them; the heavy model imports are lazier still, inside genProcess.
    """
    from moephoto_tpu.config import config, enableCompilationCache

    enableCompilationCache()
    from moephoto_tpu.pipeline.steps import genProcess
    from moephoto_tpu.progress import Node
    from moephoto_tpu.runtime.context import context
    from moephoto_tpu.runtime.worker import begin, enhance
    from moephoto_tpu.video.engine import SR_vid

    imageRoot = Node({"op": "image"}, learn=0)

    def holdInterface(seconds):
        """Countdown task that keeps the worker busy (UI lock test)."""
        import time

        node = begin(Node({}, 1, seconds, 0))
        node.reset().trace(0)
        while seconds > 0 and not context.stopFlag.is_set():
            seconds -= 1
            time.sleep(1)
            node.trace()
        return seconds

    def runImageTask(size, *steps):
        """Compile the step chain and run it on the shared-memory image."""
        last = steps[-1] if steps and isinstance(steps[-1], dict) else {}
        name = last.get("file")  # taken before the op gate, like the reference
        output = last if last.get("op") == "output" else {}
        bench = output.get("diagnose", {}).get("bench", False)
        process, nodes = genProcess([{"op": "file"}, *steps])
        tracked = begin(imageRoot, nodes, output.get("trace", False) or bench, bench)
        return tracked.bindFunc(process)(size, name=name)

    routes = {
        "lockInterface": holdInterface,
        "image_enhance": enhance(runImageTask, verbose=False),
        "batch": enhance(runImageTask, verbose=False),
        "video_enhance": enhance(SR_vid),
        "systemInfo": enhance(config.system),
    }
    return openShared(False), routes


def launch():
    mp.set_start_method("spawn")
    from moephoto_tpu.runtime.worker import worker

    taskRx, taskTx = mp.Pipe(False)
    resultRx, resultTx = mp.Pipe(False)
    noteRx, noteTx = mp.Pipe(False)
    stop = mp.Event()
    mp.Process(
        target=worker,
        args=(main, taskRx, resultTx, noteTx, stop, onWindows),
        daemon=True,
    ).start()

    from moephoto_tpu.runtime.server import config as serverConfig, runserver

    shm = openShared(True)  # bound here: GC of the wrapper closes the mmap
    serve = runserver(taskTx, resultRx, noteRx, stop, shm, onWindows)
    host = "0.0.0.0" if "-g" in sys.argv[1:] else "127.0.0.1"
    serve(host, serverConfig.get("port", 2333))


if __name__ == "__main__":
    launch()
