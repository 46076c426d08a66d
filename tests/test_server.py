"""HTTP endpoint tests (werkzeug test client, stubbed worker pipes)."""

import io
import json
import threading

import numpy as np
import pytest


class FakePipe:
    """One end of a worker pipe pair."""

    def __init__(self):
        self.items = []
        self.cv = threading.Condition()

    def send(self, item):
        with self.cv:
            self.items.append(item)
            self.cv.notify_all()

    def poll(self, timeout=0):
        with self.cv:
            if not self.items:
                self.cv.wait(timeout or 0)
            return bool(self.items)

    def recv(self):
        # blocks until data, like a real mp.Pipe end
        with self.cv:
            while not self.items:
                self.cv.wait()
            return self.items.pop(0)


class FakeEvent:
    def __init__(self):
        self._s = False

    def is_set(self):
        return self._s

    def set(self):
        self._s = True

    def clear(self):
        self._s = False


@pytest.fixture()
def client(monkeypatch):
    import moephoto_tpu.runtime.server as S

    sender = FakePipe()
    receiver = FakePipe()
    noter = FakePipe()

    import mmap

    class FakeSHM:
        """SharedMemory stand-in: anonymous mmap (buf.obj seek/write
        like the real thing)."""

        def __init__(self, size=1 << 20):
            self.buf = memoryview(mmap.mmap(-1, size))

    mm = FakeSHM()

    # echo worker: replies with a canned success for any task
    def workerThread():
        while True:
            if sender.poll(0.05):
                task = sender.recv()
                receiver.send(({"result": "ok", "task": task[0]}, 200))

    t = threading.Thread(target=workerThread, daemon=True)
    t.start()

    run = S.runserver(sender, receiver, noter, FakeEvent(), mm, False)
    from werkzeug.test import Client

    S.current.session = None
    S.current.key = None
    return Client(S.app), S, noter


def test_page_root(client):
    c, S, _ = client
    resp = c.get("/")
    assert resp.status_code in (200, 404)  # 200 when frontend mounted


def test_system_info(client):
    c, S, _ = client
    resp = c.post("/systemInfo", data={"session": "s1"})
    assert resp.status_code == 200
    body = json.loads(resp.get_data())
    assert body["result"] == "ok"


def test_session_gate_busy(client):
    c, S, _ = client
    S.current.session = "other"
    try:
        resp = c.post("/systemInfo", data={"session": "s2"})
        assert resp.status_code == 503
    finally:
        S.current.session = None
        S.current.key = None


def test_image_enhance_roundtrip(client, tmp_path):
    c, S, _ = client
    from PIL import Image

    img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    buf.seek(0)
    resp = c.post(
        "/image_enhance",
        data={
            "session": "s3",
            "steps": json.dumps([{"op": "SR", "model": "lite", "scale": 2}]),
            "file": (buf, "test.png"),
        },
    )
    assert resp.status_code == 200
    body = json.loads(resp.get_data())
    assert body["result"] == "ok"


def test_stop_endpoint(client):
    c, S, _ = client
    resp = c.post("/stop", data={"session": "sX"})
    # no current session -> 404 per the control point table
    assert resp.status_code == 404


def test_preset_endpoint(client):
    c, S, _ = client
    resp = c.get("/preset", query_string={"path": "video"})
    assert resp.status_code == 200
    data = json.loads(resp.get_data())
    assert isinstance(data, list)


def test_preset_rejects_bad_path(client):
    c, S, _ = client
    resp = c.get("/preset", query_string={"path": "../etc"})
    assert resp.status_code == 403


def test_static_traversal_blocked(client, tmp_path):
    c, S, _ = client
    # a secret outside every static root must not be reachable
    for url in (
        "/static/../../../etc/passwd",
        "/static/..%2f..%2f..%2fetc/passwd",
        "/download/../tests/test_server.py",
        "/download/../../etc/passwd",
    ):
        resp = c.get(url)
        assert resp.status_code == 404, url


def test_static_legit_download(client):
    import os

    c, S, _ = client
    os.makedirs(S.outDir, exist_ok=True)
    p = os.path.join(S.outDir, "ok.txt")
    with open(p, "w") as f:
        f.write("fine")
    try:
        resp = c.get("/" + S.outDir + "/ok.txt")
        assert resp.status_code == 200
        assert resp.get_data() == b"fine"
    finally:
        os.remove(p)


def test_bench_note_end_to_end(client):
    """A diagnose/bench note walks the whole pipe: a bench-mode progress
    Node learns an op weight (progress.py trace), the worker-side
    callback payload lands in the server note cache, and GET /msg hands
    the client exactly the {op, weight, samples} fields the frontend's
    bench table consumes (static/js/logic.js benchMark; reference
    src/js/diagnose.js:77-92)."""
    import time as _t

    c, S, _ = client
    from moephoto_tpu import progress as P

    # worker side: bench-mode node learns a weight and emits it
    notes = []
    root = P.Node({"op": "SR", "model": "lite", "scale": 2}, load=100, learn=1)
    root.setCallback(lambda node, info: notes.append(dict(info)), bench=True)
    root.reset()
    root.trace(0)
    _t.sleep(0.01)
    root.trace()
    benched = [n for n in notes if "weight" in n]
    assert benched, notes
    note = benched[-1]
    assert note["op"]["op"] == "SR" and note["samples"] >= 1
    assert note["weight"] > 0

    # server side: note reaches the /msg long-poll for the session
    S.current.session = "sb"
    S.current.path = "/video_enhance"
    S.current.key = S.current.path + "sb"
    try:
        S.updateNote(S.current.key, dict(note))
        resp = c.get("/msg", query_string={
            "session": "sb", "path": "/video_enhance"})
        assert resp.status_code == 200
        got = json.loads(resp.get_data())
        assert got["op"]["op"] == "SR"
        assert got["weight"] == pytest.approx(note["weight"])
        assert got["samples"] == note["samples"]
        # the frontend score for this note (logic.js benchMark formula)
        mark = 3e-5 / max(got["weight"], 1e-12)
        assert mark > 0
    finally:
        S.current.session = None
        S.current.key = None


def test_session_acquire_is_atomic(client):
    """Two racing enhance POSTs: exactly one may own the worker."""
    c, S, _ = client
    import concurrent.futures as cf

    def post(i):
        return c.post("/systemInfo", data={"session": f"race{i}"}).status_code

    with cf.ThreadPoolExecutor(8) as ex:
        codes = list(ex.map(post, range(8)))
    # all succeed eventually or return Busy; never an error
    assert set(codes) <= {200, 503}
