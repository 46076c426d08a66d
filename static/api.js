#!/usr/bin/env node
/* MoePhoto-TPU batch client (Node, no dependencies).
 *
 * Written from the server protocol (moephoto_tpu/runtime/server.py):
 * posts each file to /image_enhance as multipart form-data with a
 * session id and a steps JSON, polls /msg for progress, downloads the
 * result.  Role analog of the reference's static/api.js batch client.
 *
 * Usage:
 *   node static/api.js [--host http://127.0.0.1:2333] \
 *     [--steps '[{"op":"SR","model":"lite","scale":2}]'] \
 *     [--out download] img1.png img2.jpg ...
 */
'use strict';

const fs = require('fs');
const path = require('path');
const http = require('http');
const https = require('https');
const { URL } = require('url');

function parseArgs(argv) {
  const opt = {
    host: 'http://127.0.0.1:2333',
    steps: '[{"op":"SR","model":"lite","scale":2}]',
    out: 'download',
    files: [],
  };
  for (let i = 2; i < argv.length; i++) {
    const a = argv[i];
    if (a === '--host') opt.host = argv[++i];
    else if (a === '--steps') opt.steps = argv[++i];
    else if (a === '--out') opt.out = argv[++i];
    else opt.files.push(a);
  }
  return opt;
}

function request(urlStr, options, body) {
  const url = new URL(urlStr);
  const mod = url.protocol === 'https:' ? https : http;
  return new Promise((resolve, reject) => {
    const req = mod.request(url, options, (res) => {
      const chunks = [];
      res.on('data', (c) => chunks.push(c));
      res.on('end', () =>
        resolve({ status: res.statusCode, body: Buffer.concat(chunks) })
      );
    });
    req.on('error', reject);
    if (body) req.write(body);
    req.end();
  });
}

function multipart(fields, fileField, filePath) {
  const boundary = '----moe' + Math.random().toString(16).slice(2);
  const parts = [];
  for (const [k, v] of Object.entries(fields)) {
    parts.push(
      Buffer.from(
        `--${boundary}\r\nContent-Disposition: form-data; name="${k}"\r\n\r\n${v}\r\n`
      )
    );
  }
  parts.push(
    Buffer.from(
      `--${boundary}\r\nContent-Disposition: form-data; name="${fileField}"; ` +
        `filename="${path.basename(filePath)}"\r\n` +
        'Content-Type: application/octet-stream\r\n\r\n'
    )
  );
  parts.push(fs.readFileSync(filePath));
  parts.push(Buffer.from(`\r\n--${boundary}--\r\n`));
  return { body: Buffer.concat(parts), boundary };
}

async function pollProgress(host, session, stop) {
  while (!stop.done) {
    try {
      const r = await request(`${host}/msg?session=${encodeURIComponent(session)}`, {
        method: 'GET',
      });
      if (r.body.length) {
        try {
          const note = JSON.parse(r.body.toString());
          if (note.eta != null && !stop.done)
            process.stderr.write(`  eta ~${Math.round(note.eta)}s\r`);
        } catch (e) { /* idle */ }
      }
    } catch (e) { /* server busy starting up */ }
    await new Promise((f) => setTimeout(f, 700));
  }
}

async function enhanceOne(host, steps, session, file, outDir) {
  const { body, boundary } = multipart({ session, steps }, 'file', file);
  const stop = { done: false };
  const poller = pollProgress(host, session, stop);
  let res;
  try {
    res = await request(`${host}/image_enhance`, {
      method: 'POST',
      headers: {
        'Content-Type': `multipart/form-data; boundary=${boundary}`,
        'Content-Length': body.length,
      },
    }, body);
  } finally {
    stop.done = true;
    await poller;
  }
  const text = res.body.toString();
  if (res.status === 503) throw new Error('server Busy: ' + text);
  const j = JSON.parse(text);
  if (res.status !== 200 || !j.result || j.result === 'Fail')
    throw new Error('enhance failed: ' + text);
  const dl = await request(`${host}/${j.result}`, { method: 'GET' });
  if (dl.status !== 200) throw new Error('download failed: ' + j.result);
  fs.mkdirSync(outDir, { recursive: true });
  const outPath = path.join(outDir, path.basename(j.result));
  fs.writeFileSync(outPath, dl.body);
  return outPath;
}

async function main() {
  const opt = parseArgs(process.argv);
  if (!opt.files.length) {
    console.error('usage: node api.js [--host H] [--steps JSON] [--out DIR] files...');
    process.exit(2);
  }
  JSON.parse(opt.steps); // validate early
  const session = String(Date.now() / 1000);
  let fail = 0;
  for (const f of opt.files) {
    try {
      const out = await enhanceOne(opt.host, opt.steps, session, f, opt.out);
      console.log(`${f} -> ${out}`);
    } catch (e) {
      fail++;
      console.error(`${f}: ${e.message}`);
    }
  }
  process.exit(fail ? 1 : 0);
}

// Library surface (typed in api.d.ts): `require('./api.js')` gives the
// building blocks; running the file directly runs the CLI.
module.exports = { parseArgs, request, multipart, pollProgress, enhanceOne };

if (require.main === module) {
  main().catch((e) => {
    console.error(e);
    process.exit(1);
  });
}
