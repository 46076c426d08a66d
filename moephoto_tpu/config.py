"""Layered runtime configuration.

Mirrors the reference's config system (``python/defaultConfig.py``,
``python/userConfig.py:23-40``, ``python/config.py:21-94``): a defaults
table overlaid by a versioned ``.user/config.json``, exposed as a live
``Config`` object.  GPU-specific knobs (CUDA device id, fp16, free-VRAM
caps) are replaced by TPU-native ones (precision policy, tile buckets,
mesh axes); there is no free-memory solver because tile shapes are
static (see ``engine/tiling.py``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

VERSION = "5.15"

# key -> (default value, optional doc)
defaultConfig: Dict[str, tuple] = {
    "crop_sr": ("auto",),
    "crop_dn": ("auto",),
    "crop_dns": ("auto",),
    "videoName": ("out_{timestamp}.mkv",),
    "maxMemoryUsage": (0,),
    "maxGraphicMemoryUsage": (0,),
    "bf16": (True, "compute in bfloat16 with fp32 accumulation on TPU"),
    "deviceId": (0,),
    "defaultDecodec": ("",),
    "defaultEncodec": ("libx264 -pix_fmt yuv420p",),
    "ensembleSR": (0,),
    "outDir": ("download",),
    "uploadDir": ("upload",),
    "logPath": (".user/log.txt",),
    "opsPath": (".user/ops.json",),
    "videoPreview": ("jpeg",),
    "maxResultsKept": (1 << 10,),
    "sharedMemSize": (100 * 2**20, "server<->worker image exchange buffer bytes"),
    "port": (2333,),
    "progressDetail": (False,),
    "tileSize": (0, "0 = per-model default tile bucket"),
    "tileBatch": (0, "0 = per-model default tiles per jitted batch"),
    "meshShape": ([], "e.g. [2, 4] for a dp x sp mesh; [] = single device"),
    "meshBackend": (
        "",
        "platform whose devices form the mesh ('' = the default backend; "
        "'cpu' = the virtual host-device mesh used by sharding tests)",
    ),
    "ffmpegPath": ("ffmpeg", "external ffmpeg binary for video decode/encode"),
    "modelDir": ("./model", "root directory of converted / torch checkpoints"),
    "referenceRoot": (
        "",
        "optional read-only reference checkout used as a checkpoint/asset "
        "fallback during development; also settable via the "
        "MOEPHOTO_REFERENCE_ROOT environment variable",
    ),
}


def referenceRoot() -> str:
    """The explicit dev-only reference mount ('' = disabled)."""
    return os.environ.get("MOEPHOTO_REFERENCE_ROOT") or getattr(
        config, "referenceRoot", ""
    )

configPath = ".user/config.json"
manifestPath = "manifest.json"


def compareVersion(a: str, b: str) -> int:
    """Lexicographic dotted-version compare (reference ``userConfig.py:8-21``)."""
    pa = [int(x) for x in str(a).split(".")]
    pb = [int(x) for x in str(b).split(".")]
    for n0, n1 in zip(pa, pb):
        if n0 != n1:
            return -1 if n0 < n1 else 1
    return (len(pa) > len(pb)) - (len(pa) < len(pb))


def setConfig(target: Dict[str, Any], version: str = VERSION, dir: str = ".") -> None:
    """Fill ``target`` with defaults then overlay the versioned user config."""
    for key, val in defaultConfig.items():
        target[key] = val[0]
    target["version"] = version
    mpath = os.path.join(dir, manifestPath)
    if os.path.exists(mpath):
        with open(mpath, "r", encoding="utf-8") as fp:
            target["version"] = json.load(fp)["version"]
    upath = os.path.join(dir, configPath)
    if os.path.exists(upath):
        with open(upath, "r", encoding="utf-8") as fp:
            try:
                user = json.load(fp)
            except Exception:
                raise UserWarning("Loading user config failed, fallback to defaults.")
        c = compareVersion(version, user.pop("version", version))
        if c > 0:
            raise UserWarning("User config is too old and not supported.")
        for key, value in user.items():
            target[key] = value[0] if isinstance(value, (list, tuple)) else value


class Config:
    """Live config object used by the worker/engine side.

    ``getRunType()`` indexes per-model calibration tables, replacing the
    reference's cpu/fp32/fp16 index (``config.py:79-83``) with
    cpu / tpu-fp32 / tpu-bf16.
    """

    def __init__(self, dir: str = "."):
        self.dir = dir
        self.deviceId = 0
        self.initialize()

    def initialize(self) -> None:
        try:
            setConfig(self.__dict__, VERSION, dir=self.dir)
        except Exception as e:  # pragma: no cover - warning path
            import logging

            logging.getLogger("Moe").warning(e)
        self._platform = None

    # --- device / precision ----------------------------------------------
    def platform(self) -> str:
        if self._platform is None:
            import jax

            self._platform = jax.default_backend()
        return self._platform

    def onTPU(self) -> bool:
        return self.platform() not in ("cpu",)

    def dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if (self.bf16 and self.onTPU()) else jnp.float32

    def getRunType(self) -> int:
        if not self.onTPU():
            return 0
        return 2 if self.bf16 else 1

    def getConfig(self):
        f = lambda v: 0 if v == "auto" else v
        return tuple(f(self.__dict__[k]) for k in ("crop_sr", "crop_dn", "crop_dns"))

    def getPath(self, **kwargs) -> str:
        import time

        kwargs["timestamp"] = int(time.time())
        d = {k: v for k, v in kwargs.items() if k in self.videoName}
        return self.videoName.format(**d)

    def getFreeMem(self, emptyCache: bool = False) -> int:
        """Free host RAM in bytes (the tile planner itself is static)."""
        import psutil

        return psutil.virtual_memory().free - 2**28

    def calcFreeMem(self, ratio: float = 0.9) -> int:
        free = self.getFreeMem() * ratio
        if self.maxMemoryUsage > 0:
            import os as _os

            import psutil

            used = psutil.Process(_os.getpid()).memory_info()[0]
            free = min(free, self.maxMemoryUsage * 2**20 - used)
        return int(free)

    def system(self):
        """Device memory stats per chip in MiB (reference ``config.py:85-94``)."""
        try:
            import jax

            out = []
            for d in jax.local_devices():
                stats = d.memory_stats() or {}
                limit = stats.get("bytes_limit", 0)
                used = stats.get("bytes_in_use", 0)
                out.append((limit - used) // 2**20 if limit else 0)
            return out
        except Exception:
            return []


def enableCompilationCache(path: str = ".jax_cache") -> None:
    """Persistent XLA compilation cache: repeat runs (server restarts,
    bench, driver checks) load executables instead of recompiling
    (measured 264 s -> 19 s for a tiled model through the remote
    compiler).  Safe to call multiple times; must run before tracing."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


config = Config()
