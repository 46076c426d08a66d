/* MoePhoto-TPU frontend logic — the PURE functions behind the step
 * builder, output summary, and bench-score table (moe.js owns only the
 * DOM glue).  UMD so the browser gets a `MoeLogic` global and the test
 * suite can `require()` it under node (tests/test_frontend.py).
 *
 * Semantics mirror the reference frontend:
 *   - steps payload: reference src/js/steps.js submit (:540-560) — a
 *     step list JSON with numeric coercion, video chains framed as
 *     [decode, range, ...steps, output].
 *   - summary fold: reference src/js/summary.js:60-71 — output W/H/fps
 *     folded over the step list.
 *   - bench score: reference src/js/diagnose.js:12-18,77-89 —
 *     mark = nominalWeight(op) / learnedSecondsPerLoad, total = sum.
 */
(function (root, factory) {
  'use strict';
  if (typeof module !== 'undefined' && module.exports) module.exports = factory();
  else root.MoeLogic = factory();
})(typeof self !== 'undefined' ? self : this, function () {
  'use strict';

  // ---- steps payload ------------------------------------------------------
  // fieldKeys: {op: [fieldKey...]} from the panel registry (moe.js OPS).
  // videoOpts: plain values read from the video page controls:
  //   {decodec, decWidth, decHeight, rangeStart, rangeStop,
  //    encodec, outFps, outName}
  // diag: {bench, clear} booleans.
  function stepsPayload(steps, fieldKeys, mode, videoOpts, diag) {
    var out = steps.map(function (st) {
      var o = { op: st.op };
      (fieldKeys[st.op] || []).forEach(function (key) {
        var v = st[key];
        if (v === '' || v == null) return;
        o[key] = isNaN(Number(v)) ? v : Number(v);
      });
      if (st.op === 'slomo' && o.dedupe) o.dedupe = true;
      return o;
    });
    diag = diag || {};
    var d = {};
    if (diag.bench) d.bench = true;
    if (diag.clear) d.clear = true;
    if (mode === 'video') {
      // engine layout (video/engine.py prepare): steps[0]=decode,
      // steps[1]=range, steps[-1]=output/encode
      var v = videoOpts || {};
      var dec = { op: 'decode' };
      if (v.decodec) dec.codec = v.decodec;
      if (Number(v.decWidth) > 0) dec.width = Number(v.decWidth);
      if (Number(v.decHeight) > 0) dec.height = Number(v.decHeight);
      var range = { op: 'range' };
      if (Number(v.rangeStart) > 0) range.start = Number(v.rangeStart);
      if (Number(v.rangeStop) > 0) range.stop = Number(v.rangeStop);
      var last = { op: 'output' };
      if (v.encodec) last.codec = v.encodec;
      if (Number(v.outFps) > 0) last.frameRate = Number(v.outFps);
      if (v.outName) last.file = 'download/' + v.outName;
      if (d.bench || d.clear) last.diagnose = d;
      out.unshift(range);
      out.unshift(dec);
      out.push(last);
    } else if (d.bench || d.clear) {
      out.push({ op: 'output', diagnose: d });
    }
    return out;
  }

  // ---- output summary -----------------------------------------------------
  // src: {w, h, fps} of the input; dec: {width, height} decode overrides.
  // Returns {w, h, fps} (0 where unknown).
  function summarize(steps, src, dec) {
    var w = src.w || 0, h = src.h || 0, fps = src.fps || 0;
    steps.forEach(function (st) {
      var sc;
      if (st.op === 'SR') {
        sc = Number(st.scale) || 1; w *= sc; h *= sc;
      } else if (st.op === 'VSR') {
        w *= 4; h *= 4;
      } else if (st.op === 'resize') {
        w *= Number(st.scaleW) || 1; h *= Number(st.scaleH) || 1;
      } else if (st.op === 'slomo') {
        fps *= Number(st.sf) || 1;
      }
    });
    dec = dec || {};
    if (Number(dec.width) > 0) w = Number(dec.width) * (src.w ? w / src.w : 1);
    if (Number(dec.height) > 0) h = Number(dec.height) * (src.h ? h / src.h : 1);
    return { w: w, h: h, fps: fps };
  }

  // ---- bench score --------------------------------------------------------
  var BENCH_W = { resize: 3e-7, SR: 3e-5, DN: 2e-5, slomo: 15e-6, dehaze: 3e-4 };
  var BENCH_KEYS = {
    SR: ['model', 'scale'], DN: ['model'], resize: ['mode'],
    dehaze: ['model'], slomo: [], sun: [], mddm: []
  };

  // One op's score: nominal weight / learned seconds-per-load
  // (reference diagnose.js:12-18).
  function benchMark(opName, weight) {
    return (BENCH_W[opName] || 1e-3) / Math.max(weight, 1e-12);
  }

  // Total = sum of per-op marks (reference diagnose.js:77-83).
  function benchTotal(marks) {
    var total = 0;
    for (var k in marks) total += marks[k];
    return total;
  }

  // Row label: op plus its identifying arg values (reference
  // diagnose.js:84-89 table rendering).
  function benchLabel(op) {
    var keys = BENCH_KEYS[op.op] || [];
    return op.op + (keys.length
      ? ': ' + keys.map(function (k) { return op[k]; }).join(', ') : '');
  }

  return {
    stepsPayload: stepsPayload,
    summarize: summarize,
    benchMark: benchMark,
    benchTotal: benchTotal,
    benchLabel: benchLabel,
    BENCH_W: BENCH_W,
    BENCH_KEYS: BENCH_KEYS
  };
});
