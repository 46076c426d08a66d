"""Frontend logic tests (VERDICT round-3 weak #7).

The three pure-logic blocks of the frontend — steps-JSON serialization,
the output summary fold, and the bench-score math — live in
``static/js/logic.js`` (UMD).  Coverage here is two-tier:

- textual/consistency tests that always run: the bench weights against
  the actual reference formula source (``src/js/diagnose.js:12-18``),
  and the moe.js panel schema against ``pipeline/steps.py``'s accepted
  ops/coercions;
- execution tests that run the real JS under node (skipped when node is
  not installed — this image has no JS runtime).
"""

import json
import os
import re
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOGIC = os.path.join(ROOT, "static", "js", "logic.js")
MOE = os.path.join(ROOT, "static", "js", "moe.js")

HAVE_NODE = shutil.which("node") is not None


def _refPath(*parts):
    ref = os.environ.get("MOEPHOTO_REFERENCE_ROOT", "/root/reference")
    p = os.path.join(ref, *parts)
    return p if os.path.exists(p) else None


# --------------------------------------------------------------------------
# always-on consistency tests (no JS runtime needed)
# --------------------------------------------------------------------------

def _parseJsNumberMap(src, name):
    """Parse ``var NAME = { key: 3e-7, ... }`` out of JS source."""
    m = re.search(name + r"\s*=\s*\{([^}]*)\}", src)
    assert m, f"{name} not found"
    out = {}
    for k, v in re.findall(r"(\w+)\s*:\s*([\d.e+-]+)", m.group(1)):
        out[k] = float(v)
    return out


def test_bench_weights_match_reference_formula():
    """logic.js BENCH_W == the reference's diagnose weight table
    (src/js/diagnose.js:12-18) — the constants the score formula
    mark = weight / seconds-per-load divides by."""
    ours = _parseJsNumberMap(open(LOGIC).read(), "BENCH_W")
    refDiag = _refPath("src", "js", "diagnose.js")
    if refDiag is None:
        pytest.skip("reference checkout not mounted")
    theirs = _parseJsNumberMap(open(refDiag).read(), "weights")
    assert ours == theirs


def _parseMoeOps():
    """Extract {op: [fieldKey...]} from moe.js's OPS panel registry."""
    src = open(MOE).read()
    m = re.search(r"var OPS = \{(.*?)\n  \};", src, re.S)
    assert m, "OPS registry not found in moe.js"
    body = m.group(1)
    ops = {}
    # op blocks start at column 4: "    SR: {"
    blocks = re.split(r"\n    (\w+): \{", body)
    for name, block in zip(blocks[1::2], blocks[2::2]):
        ops[name] = re.findall(r"FIELD\('(\w+)'", block)
    return ops


def test_moe_panel_schema_matches_pipeline():
    """Every op the step builder can emit is accepted by
    pipeline/steps.py, and every numeric field it serializes is in that
    op's coercion table (so the server never sees an arg it would
    silently drop or crash coercing)."""
    from moephoto_tpu.pipeline.steps import procs, stepOpts

    ops = _parseMoeOps()
    assert ops, "no ops parsed"
    # accepted non-coerced string/number args per op (consumed by the
    # registry getOpt itself)
    extra = {
        "SR": {"model"},
        "DN": {"model"},
        "dehaze": {"model"},
        "resize": set(),
        "slomo": {"sf", "dedupe"},
        "VSR": set(),
        "demob": set(),
    }
    for op, fields in ops.items():
        assert op in procs, f"frontend emits op {op!r} the pipeline lacks"
        so = stepOpts.get(op, {})
        coerced = set(so.get("toInt", [])) | set(so.get("toFloat", [])) | set(
            so.get("isEnabled", [])
        )
        for f in fields:
            assert f in coerced or f in extra.get(op, set()), (
                f"{op}.{f} not in pipeline coercion tables"
            )


def test_video_chain_frame_ops_exist():
    """The video payload frame emitted by stepsPayload maps to the
    engine surface: output/file are pipeline ops; decode/range are
    consumed positionally by video/engine.prepare (steps[0]/steps[1])."""
    import inspect

    from moephoto_tpu.pipeline.steps import procs
    from moephoto_tpu.video import engine

    for op in ("output", "file"):
        assert op in procs
    src = inspect.getsource(engine.prepare)
    assert "steps[0]" in src and "steps[1]" in src


# --------------------------------------------------------------------------
# node-execution tests (run the real JS)
# --------------------------------------------------------------------------

def _nodeEval(expr):
    """Evaluate an expression against the loaded logic.js under node and
    return the JSON-parsed result."""
    script = (
        f"const L = require({json.dumps(LOGIC)});"
        f"process.stdout.write(JSON.stringify({expr}));"
    )
    r = subprocess.run(
        ["node", "-e", script], capture_output=True, text=True, timeout=60
    )
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout)


FIELD_KEYS = {
    "SR": ["model", "scale", "ensemble"],
    "DN": ["model", "strength"],
    "dehaze": ["model", "strength"],
    "resize": ["scaleW", "scaleH"],
    "slomo": ["sf", "dedupe", "ensemble"],
    "VSR": [],
    "demob": [],
}


@pytest.mark.skipif(not HAVE_NODE, reason="node not installed")
def test_steps_payload_image_mode_node():
    steps = [
        {"op": "DN", "model": "lite5", "strength": "0.8"},
        {"op": "SR", "model": "lite", "scale": "2", "ensemble": "0"},
    ]
    out = _nodeEval(
        f"L.stepsPayload({json.dumps(steps)}, {json.dumps(FIELD_KEYS)},"
        " 'image', null, {})"
    )
    # numeric coercion, stable order, no video frame
    assert out == [
        {"op": "DN", "model": "lite5", "strength": 0.8},
        {"op": "SR", "model": "lite", "scale": 2, "ensemble": 0},
    ]
    # and the pipeline accepts the coerced args
    from moephoto_tpu.pipeline.steps import stepOpts, convertValues

    for st in out:
        so = stepOpts[st["op"]]
        convertValues(int, st, so.get("toInt", []))
        convertValues(float, st, so.get("toFloat", []))


@pytest.mark.skipif(not HAVE_NODE, reason="node not installed")
def test_steps_payload_video_mode_node():
    steps = [{"op": "slomo", "sf": "2", "dedupe": "on", "ensemble": "0"}]
    video = {
        "decodec": "",
        "decWidth": 0,
        "decHeight": 0,
        "rangeStart": 30,
        "rangeStop": 0,
        "encodec": "libx264",
        "outFps": 0,
        "outName": "out.mp4",
    }
    out = _nodeEval(
        f"L.stepsPayload({json.dumps(steps)}, {json.dumps(FIELD_KEYS)},"
        f" 'video', {json.dumps(video)}, {{bench: true}})"
    )
    assert out[0] == {"op": "decode"}
    assert out[1] == {"op": "range", "start": 30}
    assert out[-1] == {
        "op": "output",
        "codec": "libx264",
        "file": "download/out.mp4",
        "diagnose": {"bench": True},
    }
    assert out[2]["op"] == "slomo" and out[2]["dedupe"] is True


@pytest.mark.skipif(not HAVE_NODE, reason="node not installed")
def test_summary_fold_node():
    """Reference summary semantics (src/js/summary.js:60-71): geometry
    multiplies through SR/VSR/resize, fps through slomo."""
    steps = [
        {"op": "SR", "scale": 2},
        {"op": "VSR"},
        {"op": "resize", "scaleW": 0.5, "scaleH": 0.25},
        {"op": "slomo", "sf": 3},
    ]
    s = _nodeEval(
        f"L.summarize({json.dumps(steps)}, {{w: 320, h: 240, fps: 10}}, null)"
    )
    assert s == {"w": 320 * 2 * 4 * 0.5, "h": 240 * 2 * 4 * 0.25, "fps": 30}


@pytest.mark.skipif(not HAVE_NODE, reason="node not installed")
def test_bench_score_node():
    """mark = weight/sec (diagnose.js:12-18); total = sum (:77-83)."""
    mark = _nodeEval("L.benchMark('SR', 2e-6)")
    assert mark == pytest.approx(3e-5 / 2e-6)
    total = _nodeEval("L.benchTotal({a: 1.5, b: 2.25})")
    assert total == pytest.approx(3.75)
    label = _nodeEval(
        "L.benchLabel({op: 'SR', model: 'lite', scale: 2})"
    )
    assert label == "SR: lite, 2"
