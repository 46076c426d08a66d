/* Type declarations for the MoePhoto-TPU batch client (static/api.js).
 *
 * Role analog of the reference's static/api.d.ts (reference
 * static/api.d.ts:1-30): typed surface for headless batch processing
 * against the HTTP server (moephoto_tpu/runtime/server.py).
 */

/** Parsed CLI options. */
export interface ClientOptions {
  /** Server origin, e.g. "http://127.0.0.1:2333". */
  host: string;
  /** Steps JSON string (the `steps` form field — see templates/index.html). */
  steps: string;
  /** Output directory for downloaded results. */
  out: string;
  /** Input image paths. */
  files: string[];
}

/** HTTP response snapshot returned by {@link request}. */
export interface Response {
  status: number | undefined;
  body: Buffer;
}

/** Encoded multipart/form-data request body. */
export interface MultipartBody {
  body: Buffer;
  boundary: string;
}

/** Shared flag used to stop the progress poller. */
export interface StopFlag {
  done: boolean;
}

/** Parse `process.argv`-style arguments into {@link ClientOptions}. */
export function parseArgs(argv: string[]): ClientOptions;

/** One HTTP(S) request; resolves with status + full body. */
export function request(
  urlStr: string,
  options: { method: string; headers?: Record<string, string | number> },
  body?: Buffer
): Promise<Response>;

/** Build a multipart/form-data body with one file part. */
export function multipart(
  fields: Record<string, string>,
  fileField: string,
  filePath: string
): MultipartBody;

/** Long-poll `/msg` for the session until `stop.done`; prints ETA to stderr. */
export function pollProgress(
  host: string,
  session: string,
  stop: StopFlag
): Promise<void>;

/**
 * Enhance one image: POST to `/image_enhance`, poll progress, download
 * the result into `outDir`.  Resolves with the written file path;
 * rejects on Busy (503) or a Fail result.
 */
export function enhanceOne(
  host: string,
  steps: string,
  session: string,
  file: string,
  outDir: string
): Promise<string>;
