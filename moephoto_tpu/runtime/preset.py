"""Preset CRUD under ``.user/preset_{image,video}`` (reference
``python/preset.py``): JSON files with mtime cache and version gate."""

from __future__ import annotations

import json
import os
import time

from moephoto_tpu.config import VERSION, compareVersion

version = VERSION
cache = {}

getBrief = lambda item: dict(name=item["name"], notes=item.get("notes", []))


def safeJoin(base, *parts):
    p = os.path.normpath(os.path.join(base, *parts))
    if not os.path.abspath(p).startswith(os.path.abspath(base)):
        raise ValueError("path escape")
    return p


def loadPreset(path):
    def f(filename, raw=False):
        if not filename.endswith(".json"):
            return None
        name = filename.rpartition(".")[0]
        filename = safeJoin(path, filename)
        if not os.path.exists(filename):
            return None
        mtime = cache[name][0] if name in cache else 0
        st_mtime = os.stat(filename).st_mtime
        if mtime < st_mtime:
            try:
                with open(filename, "r", encoding="utf-8") as fp:
                    text = fp.read()
                    item = json.loads(text)
                    name = item["name"]
                    if compareVersion(version, item["version"]) < 0:
                        return "Incompatible version" if raw else None
                    cache[name] = (st_mtime, text, getBrief(item))
            except Exception as e:
                return str(e) if raw else None
        return cache[name][1] if raw else cache[name][2]

    return f


def savePreset(path):
    def f(data):
        os.makedirs(path, exist_ok=True)
        brief = getBrief(json.loads(data))
        name = brief["name"]
        with open(safeJoin(path, name + ".json"), "w", encoding="utf-8") as fp:
            fp.write(data)
        cache[name] = (time.time(), data, brief)
        return name

    return f


def initPreset(config):
    global version
    if "version" in config:
        version = config["version"]


def handlePreset(values):
    """(body, status) for the /preset endpoint (reference preset.py:54-77)."""
    try:
        pType = values.get("path")
        if pType not in {"video", "image"}:
            return "", 403
        path = ".user/preset_" + pType
        name = values.get("name")
        data = values.get("data")
        if data:
            return savePreset(path)(data), 200
        if name:
            res = cache[name][1] if name in cache else loadPreset(path)(name + ".json", True)
            return (res, 200) if res else ("", 404)
        if os.path.exists(path):
            res = [x for x in map(loadPreset(path), os.listdir(path)) if x]
            return json.dumps(res, ensure_ascii=False, separators=(",", ":")), 200
        return "[]", 200
    except Exception:
        return "", 403
