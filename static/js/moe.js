/* MoePhoto-TPU frontend: step builder + long-poll progress + presets.
 *
 * Written from the server protocol (moephoto_tpu/runtime/server.py):
 *   POST /image_enhance|/video_enhance|/batch_enhance
 *        form-data {session, steps: JSON, file|url} -> final JSON
 *   GET  /msg?session=S            long-poll: note {eta,gone,total,preview}
 *                                  or final {result...}; empty body = idle
 *   GET  /stop?session=S           interrupt current task
 *   GET  /preset?path=image|video[&name=N]  list briefs / fetch raw
 *   POST /preset {path, data}                save
 */
(function () {
  'use strict';

  // --- step vocabulary (pipeline/steps.py + pipeline/registry.py) ---------
  var FIELD = function (key, label, kind, opts, def) {
    return { key: key, label: label, kind: kind, opts: opts || [], def: def };
  };
  var OPS = {
    SR: {
      label: '超分辨率',
      fields: [
        FIELD('model', '模型', 'select',
          [['a', '动漫'], ['p', '照片'], ['lite', '快速'], ['gan', 'GAN'], ['gana', '动漫GAN']], 'a'),
        FIELD('scale', '倍数', 'select', [['2', '2'], ['3', '3'], ['4', '4'], ['8', '8']], '2'),
        FIELD('ensemble', '自集成', 'number', { min: 0, max: 7 }, '0')
      ]
    },
    DN: {
      label: '降噪',
      fields: [
        FIELD('model', '模型', 'select',
          [['lite5', '弱'], ['lite10', '中'], ['lite15', '强'],
           ['15', '经典15'], ['25', '经典25'], ['50', '经典50'],
           ['MPRNet_denoising', 'MPRNet'], ['NAFNet_32', 'NAFNet 32'],
           ['NAFNet_64', 'NAFNet 64'], ['VSR_Cleaning', 'VSR前置清理']], 'lite5'),
        FIELD('strength', '强度', 'number', { min: 0, max: 1, step: 0.05 }, '1')
      ]
    },
    dehaze: {
      label: '修复/调色',
      fields: [
        FIELD('model', '模型', 'select',
          [['dehaze', '去雾'], ['sun', '去摩尔纹(小)'], ['moire_obj', '去摩尔纹(自然)'],
           ['moire_screen_gan', '去摩尔纹(屏幕)'], ['MPRNet_deblurring', '去模糊 MPRNet'],
           ['MPRNet_deraining', '去雨'], ['NAFNet_deblur_32', '去模糊 NAFNet32'],
           ['NAFNet_deblur_64', '去模糊 NAFNet64'], ['NAFNet_deblur_JPEG_64', '去压缩模糊'],
           ['AiLUT_sRGB_3', '调色 sRGB'], ['AiLUT_XYZ_3', '调色 XYZ'],
           ['AiLUT_sRGB_5', '调色 PPR10K']], 'dehaze'),
        FIELD('strength', '强度', 'number', { min: 0, max: 1, step: 0.05 }, '1')
      ]
    },
    resize: {
      label: '缩放',
      fields: [
        FIELD('scaleW', '宽倍数', 'number', { min: 0.05, step: 0.05 }, '1'),
        FIELD('scaleH', '高倍数', 'number', { min: 0.05, step: 0.05 }, '1')
      ]
    },
    slomo: {
      label: '插帧慢动作',
      video: true,
      fields: [
        FIELD('sf', '倍率', 'number', { min: 2, step: 1 }, '2'),
        FIELD('dedupe', '去重', 'select', [['', '关'], ['on', '开']], ''),
        FIELD('ensemble', '光流TTA', 'number', { min: 0, max: 5 }, '0')
      ]
    },
    VSR: { label: '视频超分 ×4', video: true, fields: [] },
    demob: { label: '视频去模糊', video: true, fields: [] }
  };

  // per-step help notes (reference behavior: src/js/main.js attaches
  // `notes` per panel/option; text is our own).  Keyed by op, with
  // optional per-model overrides under `model`.
  var NOTES = {
    SR: {
      _op: '放大图像；GAN 模型细节更锐但可能引入伪纹理',
      model: {
        a: '动漫/插画线条优化，速度快',
        p: '照片通用，保真度优先',
        lite: '最快的超分模型，适合视频和大批量',
        gan: '真实感细节生成，不保证与原图逐像素一致',
        gana: '动漫 GAN：线稿更锐利'
      }
    },
    DN: {
      _op: '降噪强度可用“强度”滑杆调节，1 为完全应用',
      model: {
        lite5: '轻度噪点，速度最快',
        lite10: '中度噪点',
        lite15: '重度噪点',
        15: '经典 SEDN 模型：慢但对高 ISO 噪点更干净',
        25: '经典 SEDN 25：更强的平滑',
        50: '经典 SEDN 50：极端噪点用',
        MPRNet_denoising: 'MPRNet：多阶段修复，质量高、较慢',
        NAFNet_32: 'NAFNet 小模型：快，SIDD 训练',
        NAFNet_64: 'NAFNet 大模型：更慢一点，效果略好',
        VSR_Cleaning: '视频超分前置清理，单独用也可以'
      }
    },
    dehaze: {
      _op: '修复类模型按输入类型选择；摩尔纹(屏幕)需要 ≥512px 输入',
      model: {
        dehaze: 'AOD-Net 去雾',
        sun: '小摩尔纹模型：文档/扫描件',
        moire_obj: '自然图像摩尔纹',
        moire_screen_gan: '屏幕翻拍摩尔纹（输入需 ≥512px）',
        MPRNet_deblurring: '运动模糊修复',
        MPRNet_deraining: '雨纹去除',
        NAFNet_deblur_32: '快速去模糊',
        NAFNet_deblur_64: '高质量去模糊',
        NAFNet_deblur_JPEG_64: '同时修复 JPEG 压缩伪影',
        AiLUT_sRGB_3: '自适应 3D LUT 调色（sRGB）',
        AiLUT_XYZ_3: 'XYZ 空间调色：色彩风格差异较大',
        AiLUT_sRGB_5: 'PPR10K 风格：人像修图预设'
      }
    },
    resize: { _op: '双三次缩放；长宽按倍数分别取整' },
    slomo: { _op: '光流插帧；开启去重可跳过重复帧，TTA 提升光流质量但更慢' },
    VSR: { _op: 'IconVSR 视频超分 ×4：利用前后帧信息，比逐帧超分清晰' },
    demob: { _op: 'ESTRNN 视频去模糊：利用相邻帧' }
  };

  var $ = function (id) { return document.getElementById(id); };
  var app = $('app');

  // session id: reuse the server-set cookie, else mint one
  function sessionId() {
    var m = document.cookie.match(/(?:^|;\s*)session=([^;]+)/);
    if (m) return m[1];
    var s = String(Date.now() / 1000);
    document.cookie = 'session=' + s;
    return s;
  }

  // ======================= step builder ==================================
  var steps = [];

  function fieldInput(f, value) {
    var el;
    if (f.kind === 'select') {
      el = document.createElement('select');
      f.opts.forEach(function (o) {
        var opt = document.createElement('option');
        opt.value = o[0]; opt.textContent = o[1];
        el.appendChild(opt);
      });
      el.value = value != null ? String(value) : f.def;
    } else {
      el = document.createElement('input');
      el.type = 'number';
      ['min', 'max', 'step'].forEach(function (k) {
        if (f.opts[k] != null) el[k] = f.opts[k];
      });
      el.value = value != null ? String(value) : f.def;
      el.style.width = '5.5em';
    }
    el.dataset.key = f.key;
    return el;
  }

  function renderSteps() {
    var list = $('stepList');
    if (!list) return;
    list.textContent = '';
    steps.forEach(function (st, i) {
      var row = document.createElement('div');
      row.className = 'moe-step';
      var op = document.createElement('span');
      op.className = 'moe-op';
      op.textContent = (i + 1) + ' · ' + OPS[st.op].label;
      row.appendChild(op);
      OPS[st.op].fields.forEach(function (f) {
        var lab = document.createElement('label');
        lab.textContent = f.label + ' ';
        var inp = fieldInput(f, st[f.key]);
        inp.addEventListener('change', function () { st[f.key] = inp.value; renderSummary(); });
        lab.appendChild(inp);
        row.appendChild(lab);
      });
      var del = document.createElement('button');
      del.type = 'button'; del.className = 'moe-del'; del.textContent = '删除';
      del.addEventListener('click', function () { steps.splice(i, 1); renderSteps(); });
      row.appendChild(del);
      var note = document.createElement('div');
      note.className = 'moe-note';
      var refreshNote = function () {
        var n = NOTES[st.op] || {};
        var parts = [];
        if (n.model && st.model != null && n.model[st.model]) parts.push(n.model[st.model]);
        if (n._op) parts.push(n._op);
        note.textContent = parts.join(' — ');
        note.style.display = parts.length ? '' : 'none';
      };
      refreshNote();
      row.addEventListener('change', refreshNote);
      row.appendChild(note);
      list.appendChild(row);
    });
    renderSummary();
  }

  function buildAdders(mode) {
    var adders = $('stepAdders');
    if (!adders) return;
    Object.keys(OPS).forEach(function (op) {
      if (OPS[op].video && mode === 'image') return;
      if (OPS[op].video && mode === 'batch') return;
      var b = document.createElement('button');
      b.type = 'button';
      b.textContent = '+ ' + OPS[op].label;
      b.addEventListener('click', function () {
        var st = { op: op };
        OPS[op].fields.forEach(function (f) { st[f.key] = f.def; });
        steps.push(st);
        renderSteps();
      });
      adders.appendChild(b);
    });
  }

  function numVal(id) {
    var el = $(id);
    if (!el || el.value === '') return 0;
    var n = Number(el.value);
    return isNaN(n) ? 0 : n;
  }

  function diagnoseOpt() {
    var d = {};
    if ($('diagBench') && $('diagBench').checked) d.bench = true;
    if ($('diagClear') && $('diagClear').checked) d.clear = true;
    return d;
  }

  // pure logic lives in logic.js (MoeLogic) so it's testable under node
  var fieldKeys = {};
  Object.keys(OPS).forEach(function (op) {
    fieldKeys[op] = (OPS[op].fields || []).map(function (f) { return f.key; });
  });

  function stepsJSON(mode) {
    var videoOpts = {
      decodec: $('decodec') ? $('decodec').value : '',
      decWidth: numVal('decWidth'),
      decHeight: numVal('decHeight'),
      rangeStart: numVal('rangeStart'),
      rangeStop: numVal('rangeStop'),
      encodec: $('encodec') ? $('encodec').value : '',
      outFps: numVal('outFps'),
      outName: $('outName') ? $('outName').value : ''
    };
    return JSON.stringify(
      MoeLogic.stepsPayload(steps, fieldKeys, mode, videoOpts, diagnoseOpt())
    );
  }

  // ======================= summary (output W/H/fps) =======================
  // mirrors the reference src/js/summary.js:60-71 semantics: fold the
  // step list over the source geometry
  var src = { w: 0, h: 0, fps: 0 };

  function renderSummary() {
    var el = $('summary');
    if (!el) return;
    var s = MoeLogic.summarize(steps, src,
      { width: numVal('decWidth'), height: numVal('decHeight') });
    var t = [];
    if (s.w && s.h) t.push('输出尺寸 ' + Math.round(s.w) + '×' + Math.round(s.h));
    else t.push('输出尺寸 —（提交后显示）');
    if (s.fps) t.push(Math.round(s.fps * 100) / 100 + ' fps');
    el.textContent = t.join(' · ');
  }

  // ======================= diagnose (bench score table) ===================
  // score math in logic.js (MoeLogic.benchMark/benchTotal/benchLabel);
  // this block only renders the table
  var benchMarks = {};

  function benchRow(tbody, key) {
    var tr = document.getElementById('bench-' + key);
    if (!tr) {
      tr = document.createElement('tr');
      tr.id = 'bench-' + key;
      tr.innerHTML = '<td></td><td></td><td></td>';
      tbody.appendChild(tr);
    }
    return tr;
  }

  function showBench(op, weight, samples) {
    var tbody = $('benchBody');
    if (!tbody || !op || !op.op || !(op.op in MoeLogic.BENCH_KEYS)) return;
    var mark = MoeLogic.benchMark(op.op, weight);
    benchMarks[op.op] = mark;
    var total = MoeLogic.benchTotal(benchMarks);
    var label = MoeLogic.benchLabel(op);
    var tr = benchRow(tbody, label.replace(/[^\w.-]/g, '_').slice(0, 32));
    tr.children[0].textContent = label.slice(0, 32);
    tr.children[1].textContent = samples;
    tr.children[2].textContent = mark.toFixed(3);
    var tot = benchRow(tbody, '__total__');
    tot.children[0].textContent = '总分';
    tot.children[1].textContent = '';
    tot.children[2].textContent = total.toFixed(3);
    $('benchTable').hidden = false;
  }

  // ======================= progress (long-poll /msg) ======================
  var polling = false;

  function fmtETA(s) {
    s = Math.max(0, Math.round(s));
    return s >= 3600
      ? Math.floor(s / 3600) + 'h' + Math.floor((s % 3600) / 60) + 'm'
      : s >= 60 ? Math.floor(s / 60) + 'm' + (s % 60) + 's' : s + 's';
  }

  function showNote(note) {
    var bar = $('bar'), eta = $('etaText'), prev = $('preview');
    if (note.total && note.gone != null && bar)
      bar.style.width = Math.round(100 * note.gone / note.total) + '%';
    if (eta) {
      var t = [];
      if (note.gone != null && note.total) t.push(note.gone + '/' + note.total);
      if (note.eta != null) t.push('剩余约 ' + fmtETA(note.eta));
      eta.textContent = t.join(' · ');
    }
    if (prev && note.preview) {
      prev.src = '/' + note.preview + '?t=' + Date.now();
      prev.hidden = false;
    }
    if (note.op && note.weight != null) showBench(note.op, note.weight, note.samples);
    var dirty = false;
    if (note.shape && note.shape.length > 1) {
      src.h = note.shape[0]; src.w = note.shape[1]; dirty = true;
    }
    if (note.fps) { src.fps = note.fps; dirty = true; }
    if (dirty) renderSummary();
  }

  var pollFails = 0;

  function poll(session) {
    if (!polling) return;
    fetch('/msg?session=' + encodeURIComponent(session))
      .then(function (r) { return r.text(); })
      .then(function (body) {
        if (!polling) return;
        pollFails = 0;
        if (body) {
          try {
            var note = JSON.parse(body);
            if (note.result === undefined) showNote(note);
          } catch (e) { /* non-JSON idle body */ }
        }
        setTimeout(function () { poll(session); }, 500);
      })
      .catch(function () {
        // exponential reconnect backoff (reference src/js/app.js:85-89)
        pollFails = Math.min(pollFails + 1, 7);
        setTimeout(function () { poll(session); }, 200 << pollFails);
      });
  }

  // drag-drop a file anywhere on the page into the file input
  // (reference src/js/app.js:30-62)
  function wireDropZone() {
    var inp = $('fileInput');
    if (!inp) return;
    ['dragover', 'dragenter'].forEach(function (ev) {
      document.body.addEventListener(ev, function (e) {
        e.preventDefault();
        e.stopPropagation();
        if (e.dataTransfer) e.dataTransfer.dropEffect = 'copy';
      }, false);
    });
    document.body.addEventListener('drop', function (e) {
      e.preventDefault();
      e.stopPropagation();
      if (e.dataTransfer && e.dataTransfer.files && e.dataTransfer.files.length) {
        inp.files = e.dataTransfer.files;
        inp.dispatchEvent(new Event('change'));
      }
    }, false);
  }

  // ======================= submit =========================================
  function setBusy(b) {
    if ($('submitBtn')) $('submitBtn').disabled = b;
    if ($('stopBtn')) $('stopBtn').disabled = !b;
    if ($('progress')) $('progress').hidden = !b && !$('result').textContent;
  }

  function showResult(res, code) {
    var el = $('result');
    if (!el) return;
    el.textContent = '';
    var span = document.createElement('span');
    if (code === 200 && res && res.result && res.result !== 'Fail') {
      span.className = 'ok';
      if (typeof res.result === 'string') {
        var a = document.createElement('a');
        a.href = '/' + res.result; a.textContent = res.result; a.download = '';
        span.textContent = '完成: ';
        span.appendChild(a);
        var prev = $('preview');
        if (prev && /\.(png|jpe?g|webp|bmp|gif)$/i.test(res.result)) {
          prev.src = '/' + res.result + '?t=' + Date.now();
          prev.hidden = false;
        }
      } else {
        span.textContent = '完成: ' + JSON.stringify(res.result);
      }
    } else {
      span.className = 'err';
      span.textContent = '失败: ' + JSON.stringify(res);
    }
    el.appendChild(span);
  }

  function submit(mode, endpoint) {
    var session = sessionId();
    var fd = new FormData();
    fd.append('session', session);
    fd.append('steps', stepsJSON(mode));
    var files = $('fileInput') ? $('fileInput').files : [];
    if (mode === 'video' && $('urlInput') && $('urlInput').value) {
      fd.append('url', $('urlInput').value);
    } else if (mode === 'batch') {
      if (!files.length) return alert('请选择图片');
      for (var i = 0; i < files.length; i++) fd.append('file', files[i]);
    } else {
      if (!files.length) return alert('请选择文件');
      fd.append('file', files[0]);
    }
    setBusy(true);
    $('progress').hidden = false;
    $('result').textContent = '';
    polling = true;
    poll(session);
    fetch(endpoint, { method: 'POST', body: fd })
      .then(function (r) {
        return r.json().then(function (j) { return [j, r.status]; });
      })
      .then(function (t) { showResult(t[0], t[1]); })
      .catch(function (e) { showResult(String(e), 0); })
      .then(function () { polling = false; setBusy(false); });
  }

  // ======================= presets ========================================
  function presetPath(mode) { return mode === 'video' ? 'video' : 'image'; }

  function refreshPresets(mode) {
    var sel = $('presetSelect');
    if (!sel) return;
    fetch('/preset?path=' + presetPath(mode))
      .then(function (r) { return r.json(); })
      .then(function (briefs) {
        sel.length = 1;
        briefs.forEach(function (b) {
          var o = document.createElement('option');
          o.value = b.name; o.textContent = b.name;
          sel.appendChild(o);
        });
      })
      .catch(function () {});
  }

  function wirePresets(mode, version) {
    if (!$('presetSelect')) return;
    refreshPresets(mode);
    $('presetLoad').addEventListener('click', function () {
      var name = $('presetSelect').value;
      if (!name) return;
      fetch('/preset?path=' + presetPath(mode) + '&name=' + encodeURIComponent(name))
        .then(function (r) { return r.json(); })
        .then(function (p) {
          steps = (p.steps || []).filter(function (s) { return OPS[s.op]; });
          renderSteps();
        });
    });
    $('presetSave').addEventListener('click', function () {
      var name = $('presetName').value.trim();
      if (!name) return alert('请输入预设名');
      var data = JSON.stringify({
        name: name, version: version, notes: [],
        steps: JSON.parse(stepsJSON('image')).filter(function (s) {
          return s.op !== 'output';
        })
      });
      var fd = new FormData();
      fd.append('path', presetPath(mode));
      fd.append('data', data);
      fetch('/preset', { method: 'POST', body: fd }).then(function () {
        refreshPresets(mode);
      });
    });
  }

  // ======================= lock (system page) =============================
  function wireLock() {
    var btn = $('lockBtn');
    if (!btn) return;
    btn.addEventListener('click', function () {
      var secs = Number($('lockSecs').value) || 60;
      var q = 'session=' + encodeURIComponent(sessionId()) +
        '&steps=' + encodeURIComponent(JSON.stringify([{ duration: secs }]));
      $('lockState').textContent = '锁定中…';
      fetch('/lockInterface?' + q)
        .then(function (r) { return r.json(); })
        .then(function (j) { $('lockState').textContent = j.result; })
        .catch(function (e) { $('lockState').textContent = String(e); });
    });
  }

  // ======================= init ===========================================
  wireLock();
  if (!app) return;
  var mode = app.dataset.mode;
  var endpoint = app.dataset.endpoint;
  buildAdders(mode);
  renderSteps();
  wirePresets(mode, app.dataset.version);
  wireDropZone();
  if ($('submitBtn'))
    $('submitBtn').addEventListener('click', function () { submit(mode, endpoint); });
  if ($('stopBtn'))
    $('stopBtn').addEventListener('click', function () {
      fetch('/stop?session=' + encodeURIComponent(sessionId()));
    });
  if (mode === 'batch' && $('fileInput'))
    $('fileInput').addEventListener('change', function () {
      $('fileCount').textContent = this.files.length + ' 个文件';
    });
  ['decWidth', 'decHeight', 'outFps'].forEach(function (id) {
    if ($(id)) $(id).addEventListener('change', renderSummary);
  });
  // image mode: read the chosen file's natural size into the summary
  if (mode !== 'video' && $('fileInput'))
    $('fileInput').addEventListener('change', function () {
      var f = this.files && this.files[0];
      if (!f || !/^image\//.test(f.type)) return;
      var im = new Image();
      im.onload = function () {
        src.w = im.naturalWidth; src.h = im.naturalHeight;
        renderSummary();
        URL.revokeObjectURL(im.src);
      };
      im.src = URL.createObjectURL(f);
    });
})();
