"""Serving front-end: chunked long-form generation with rolling voice
conditioning, plus a web UI / HTTP API.

Reference: app.py — text chunking by effective characters (tags count as one
char, :80-121), batches of 4 chunks joined with 0.2 s silences (:206-248),
rolling self-conditioning (each batch's audio+text become the next batch's
voice prompt, :221-226), per-batch max-token scaling (:216-218), speed-factor
resampling (:259-268), optional int8 weight quantization (:51-63 — note the
reference's quantize call is a no-op on its own model, quirk Q7; ours is real,
see ops/quant.py).

Front-end: Gradio when installed (reference UI on :7860); otherwise a
dependency-free stdlib HTTP JSON API with the same pipeline underneath —
POST /generate {"text": …, "chunk_size": …, "speed_factor": …} → WAV bytes.
"""

from __future__ import annotations

import argparse
import io
import itertools
import json
import os
import re
import tempfile
import time

import numpy as np

SAMPLE_RATE = 44100
BATCH_CHUNKS = 4
SILENCE_SEC = 0.2


# ---------------------------------------------------------------------------
# Chunking — behavioral spec from the reference (app.py:80-131): speaker tags
# are billed as one character; chunk budget auto-scales 48/64/96 with input
# size; splits never break words; chunks are consumed in groups.
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(r"\[S[12]\]")

# (input ceiling in effective chars, chunk budget) — longer inputs get larger
# chunks so the batch count stays bounded
_CHUNK_BUDGETS = ((1024, 48), (4096, 64), (float("inf"), 96))


def count_effective_length(text: str) -> int:
    """Character count where each speaker tag bills as a single character."""
    return len(text) - sum(len(m.group()) - 1 for m in _TAG_RE.finditer(text))


def auto_adjust_chunk_size(text: str, user_chunk_size: int = 0) -> int:
    """Pick the per-chunk character budget (user override wins)."""
    if user_chunk_size > 0:
        return int(user_chunk_size)
    n = count_effective_length(text)
    return next(budget for ceiling, budget in _CHUNK_BUDGETS if n <= ceiling)


def split_by_words_respecting_special_tokens(text: str, max_effective_chars: int = 64) -> list[str]:
    """Greedy word-boundary split: keep appending words while the chunk fits;
    a single word longer than the budget becomes its own chunk."""
    chunks: list[list[str]] = [[]]
    used = 0
    for word in text.split():
        cost = count_effective_length(word) + (1 if chunks[-1] else 0)
        if chunks[-1] and used + cost > max_effective_chars:
            chunks.append([])
            used = 0
            cost = count_effective_length(word)
        chunks[-1].append(word)
        used += cost
        if used > max_effective_chars:  # oversized lone word: close it out
            chunks.append([])
            used = 0
    return [" ".join(c) for c in chunks if c]


def batch_chunks(chunks: list[str], batch_size: int):
    """Consume chunks in fixed-size groups (last group may be short)."""
    it = iter(chunks)
    while group := list(itertools.islice(it, batch_size)):
        yield group


# ---------------------------------------------------------------------------
# Pipeline (reference: app.py:142-268)
# ---------------------------------------------------------------------------


def run_inference(
    dia,
    text_input: str,
    audio_prompt_path: str | None = None,
    audio_prompt_text: str | None = None,
    max_new_tokens: int = 1024,
    cfg_scale: float = 3.0,
    temperature: float = 1.3,
    top_p: float = 0.95,
    cfg_filter_top_k: int = 35,
    speed_factor: float = 1.0,
    chunk_size: int = 0,
    seed: int | None = None,
    verbose: bool = False,
) -> tuple[int, np.ndarray]:
    """Chunked generation with rolling self-conditioning.

    Returns (sample_rate, int16 waveform) like the reference Gradio handler.
    """
    if not text_input or not text_input.strip():
        raise ValueError("Text input is empty.")

    chunk_size = auto_adjust_chunk_size(text_input, chunk_size)
    chunks = split_by_words_respecting_special_tokens(text_input, chunk_size)
    if verbose:
        print(f"Chunked into {len(chunks)} chunks of ≤{chunk_size} effective chars.")

    n_batches = -(-len(chunks) // BATCH_CHUNKS)
    segments: list[np.ndarray] = []
    prev_audio: np.ndarray | None = None
    prev_text: str | None = None
    prompt_path = audio_prompt_path
    prompt_text = audio_prompt_text
    tmp_files: list[str] = []
    t0 = time.time()

    try:
        for batch_idx, chunk_batch in enumerate(batch_chunks(chunks, BATCH_CHUNKS)):
            batch_text = "\n".join(c.strip() for c in chunk_batch).strip()
            if not batch_text:
                continue
            # per-batch token budget scaling (reference: app.py:216-218)
            scaling = count_effective_length(batch_text) / chunk_size
            adjusted_tokens = max(256, int(max_new_tokens * scaling))

            # rolling self-conditioning (reference: app.py:221-226)
            if batch_idx > 0 and prev_audio is not None:
                from .utils.audio_io import write_wav

                f = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
                f.close()
                write_wav(f.name, prev_audio.astype(np.float32), SAMPLE_RATE)
                prompt_path = f.name
                prompt_text = prev_text
                tmp_files.append(f.name)

            audio = dia.generate(
                batch_text,
                max_tokens=adjusted_tokens,
                cfg_scale=cfg_scale,
                temperature=temperature,
                top_p=top_p,
                cfg_filter_top_k=cfg_filter_top_k,
                audio_prompt=prompt_path,
                audio_prompt_text=prompt_text,
                seed=seed,
                verbose=verbose,
            )
            if audio is not None:
                segments.append(audio)
                prev_audio = audio
                prev_text = batch_text
                if batch_idx < n_batches - 1:
                    segments.append(np.zeros(int(SAMPLE_RATE * SILENCE_SEC), np.float32))
    finally:
        for f in tmp_files:
            try:
                os.unlink(f)
            except OSError:
                pass

    if not segments:
        return SAMPLE_RATE, np.zeros(0, np.int16)
    out = np.concatenate(segments)
    if verbose:
        print(f"Generated {out.shape[0] / SAMPLE_RATE:.2f}s in {time.time() - t0:.2f}s.")

    # speed factor via linear resample (reference: app.py:259-268)
    from .utils.audio_io import speed_change

    out = speed_change(out, speed_factor)
    return SAMPLE_RATE, (np.clip(out, -1, 1) * 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# HTTP API (stdlib; used when gradio is unavailable) and Gradio UI
# ---------------------------------------------------------------------------


def _wav_bytes(sr: int, pcm16: np.ndarray) -> bytes:
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def _wav_stream_header(sr: int) -> bytes:
    """A 44-byte PCM WAV header with unknown (0xFFFFFFFF) lengths — players
    and ffmpeg treat it as a live stream and read until the socket closes."""
    import struct

    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", 0xFFFFFFFF))


def make_server(dia, host: str = "0.0.0.0", port: int = 7860, batcher=None):
    """Build the minimal JSON→WAV server: POST /generate|/stream, GET
    /health|/stats.

    With ``batcher`` (serving.DynamicBatcher), single-chunk requests from
    concurrent clients are coalesced into one batched decode loop — the
    aggregate-throughput serving mode (batch 8 ≈ 4× the tokens/s of serial
    single streams, docs/PERF.md).  Multi-chunk long-form requests keep the
    rolling-prompt pipeline (run_inference) unchanged."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"status": "ok"}).encode()
            elif self.path == "/stats" and batcher is not None:
                body = json.dumps(batcher.stats).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json_error(self, code: int, msg: str):
            body = json.dumps({"error": msg}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _do_stream(self):
            """POST /stream — live WAV: header + PCM chunks as generated.

            No Content-Length (HTTP/1.0 read-until-close), so `curl ... |
            ffplay -` starts playing at the first chunk.  The first chunk is
            pulled BEFORE the 200 commits, so invalid requests still get a
            JSON error status."""
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                kwargs = dict(
                    max_tokens=int(req.get("max_new_tokens", 1024)),
                    cfg_scale=float(req.get("cfg_scale", 3.0)),
                    temperature=float(req.get("temperature", 1.3)),
                    top_p=float(req.get("top_p", 0.95)),
                    seed=req.get("seed"),
                    audio_prompt=req.get("audio_prompt"),
                    audio_prompt_text=req.get("audio_prompt_text"),
                )
                if batcher is not None:
                    if not hasattr(batcher, "generate_stream"):
                        raise ValueError(
                            "streaming needs --continuous-batch (or no batcher); "
                            "--dynamic-batch groups cannot stream per-request")
                    chunks = batcher.generate_stream(req.get("text", ""), **kwargs)
                else:
                    chunks = dia.generate_stream(req.get("text", ""), **kwargs)
                first = next(chunks, None)
            except ValueError as e:
                self._send_json_error(400, str(e))
                return
            except Exception as e:  # noqa: BLE001 — surface as 500
                self._send_json_error(500, f"{type(e).__name__}: {e}")
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.end_headers()
            self.wfile.write(_wav_stream_header(SAMPLE_RATE))
            try:
                if first is not None:
                    for chunk in itertools.chain([first], chunks):
                        pcm = (np.clip(chunk, -1, 1) * 32767).astype(np.int16)
                        self.wfile.write(pcm.tobytes())
                        self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                pass  # client left; closing the generator frees the lane
            finally:
                if hasattr(chunks, "close"):
                    chunks.close()

        def do_POST(self):
            if self.path == "/stream":
                self._do_stream()
                return
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                text = req.get("text", "")
                speed = float(req.get("speed_factor", 1.0))
                chunk_size = auto_adjust_chunk_size(text, int(req.get("chunk_size", 0)))
                single_chunk = (
                    text.strip()
                    and len(split_by_words_respecting_special_tokens(text, chunk_size)) == 1
                )
                if batcher is not None and single_chunk and speed == 1.0:
                    audio = batcher.generate(
                        text,
                        max_tokens=int(req.get("max_new_tokens", 1024)),
                        cfg_scale=float(req.get("cfg_scale", 3.0)),
                        temperature=float(req.get("temperature", 1.3)),
                        top_p=float(req.get("top_p", 0.95)),
                        cfg_filter_top_k=int(req.get("cfg_filter_top_k", 35)),
                        audio_prompt=req.get("audio_prompt"),
                        audio_prompt_text=req.get("audio_prompt_text"),
                        seed=req.get("seed"),
                    )
                    if audio is None:
                        audio = np.zeros(0, np.float32)
                    sr = SAMPLE_RATE
                    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
                else:
                    sr, pcm = run_inference(
                        dia,
                        text,
                        audio_prompt_path=req.get("audio_prompt"),
                        audio_prompt_text=req.get("audio_prompt_text"),
                        max_new_tokens=int(req.get("max_new_tokens", 1024)),
                        cfg_scale=float(req.get("cfg_scale", 3.0)),
                        temperature=float(req.get("temperature", 1.3)),
                        top_p=float(req.get("top_p", 0.95)),
                        cfg_filter_top_k=int(req.get("cfg_filter_top_k", 35)),
                        speed_factor=speed,
                        chunk_size=int(req.get("chunk_size", 0)),
                        seed=req.get("seed"),
                    )
                body = _wav_bytes(sr, pcm)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ValueError as e:
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — surface as 500
                body = json.dumps({"error": f"{type(e).__name__}: {e}"}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(dia, host: str = "0.0.0.0", port: int = 7860, batcher=None):
    server = make_server(dia, host, port, batcher=batcher)
    mode = ("serial" if batcher is None else
            "continuous-batched" if type(batcher).__name__ == "ContinuousBatcher"
            else "dynamic-batched")
    print(f"Serving Dia TTS API on http://{host}:{server.server_address[1]} "
          f"(POST /generate, {mode})")

    # graceful drain on SIGTERM/SIGINT: stop accepting, let the batcher
    # finish queued + in-flight requests, then exit 0 (container-friendly)
    import signal
    import threading as _th

    def _drain(signum, frame):
        _th.Thread(target=server.shutdown, daemon=True).start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _drain)
        except ValueError:  # non-main thread (e.g. tests): skip handlers
            break
    try:
        server.serve_forever()
    finally:
        if batcher is not None:
            batcher.shutdown()
        print("Dia TTS server drained and stopped.")


def serve_gradio(dia, host: str = "0.0.0.0", port: int = 7860):
    """Gradio UI mirroring the reference app's controls (app.py:296-493)."""
    import gradio as gr

    def handler(text, prompt_audio, prompt_text, max_new_tokens, cfg_scale, temperature,
                top_p, cfg_filter_top_k, speed_factor, chunk_size, seed):
        seed = int(seed) if seed not in (None, "", -1) else None
        sr, pcm = run_inference(
            dia, text,
            audio_prompt_path=prompt_audio, audio_prompt_text=prompt_text or None,
            max_new_tokens=int(max_new_tokens), cfg_scale=cfg_scale,
            temperature=temperature, top_p=top_p, cfg_filter_top_k=int(cfg_filter_top_k),
            speed_factor=speed_factor, chunk_size=int(chunk_size), seed=seed,
        )
        return sr, pcm

    demo = gr.Interface(
        fn=handler,
        inputs=[
            gr.Textbox(label="Text ([S1]/[S2] speaker tags)", lines=5),
            gr.Audio(label="Voice prompt (optional)", type="filepath"),
            gr.Textbox(label="Voice prompt transcript"),
            gr.Slider(256, 3072, value=1024, step=64, label="Max new tokens / batch"),
            gr.Slider(1.0, 6.0, value=3.0, step=0.1, label="CFG scale"),
            gr.Slider(0.0, 2.0, value=1.3, step=0.05, label="Temperature"),
            gr.Slider(0.5, 1.0, value=0.95, step=0.01, label="Top-p"),
            gr.Slider(0, 100, value=35, step=1, label="CFG top-k"),
            gr.Slider(0.5, 2.0, value=1.0, step=0.05, label="Speed factor"),
            gr.Slider(0, 128, value=0, step=8, label="Chunk size (0 = auto)"),
            gr.Number(value=-1, label="Seed (-1 = random)"),
        ],
        outputs=gr.Audio(label="Generated audio"),
        title="Dia TTS (TPU-native)",
    )
    demo.launch(server_name=host, server_port=port)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Dia TTS serving app")
    parser.add_argument("--model-path", type=str, default="nari-labs/Dia-1.6B")
    parser.add_argument("--dac-checkpoint", type=str, default=None)
    parser.add_argument("--compute-dtype", type=str, default="bfloat16",
                        choices=["float16", "bfloat16", "float32"])
    parser.add_argument("--quantize-int8", action="store_true",
                        help="int8 weight quantization of dense kernels "
                             "(real, unlike reference quirk Q7)")
    parser.add_argument("--host", type=str, default=os.environ.get("GRADIO_SERVER_NAME", "0.0.0.0"))
    parser.add_argument("--port", type=int, default=int(os.environ.get("GRADIO_SERVER_PORT", 7860)))
    parser.add_argument("--no-gradio", action="store_true", help="Force the stdlib HTTP API")
    parser.add_argument("--dynamic-batch", action="store_true",
                        help="coalesce concurrent HTTP requests into batched "
                             "decode loops (implies the stdlib HTTP API)")
    parser.add_argument("--max-batch", type=int, default=8,
                        help="max coalesced requests per decode loop")
    parser.add_argument("--batch-wait-ms", type=float, default=50.0,
                        help="max extra latency spent waiting for companions")
    parser.add_argument("--continuous-batch", action="store_true",
                        help="slot-based continuous batching: requests join a "
                             "running batched decode at segment boundaries — "
                             "no wait-for-the-whole-batch latency (implies "
                             "the stdlib HTTP API; see cbatch.py)")
    parser.add_argument("--cb-slots", type=int, default=4,
                        help="resident decode lanes for --continuous-batch")
    parser.add_argument("--cb-segment-steps", type=int, default=64,
                        help="decode steps between admission opportunities")
    parser.add_argument("--cb-max-tokens", type=int, default=1024,
                        help="per-request token cap (sets the static cache)")
    parser.add_argument("--cb-text-window", type=int, default=256,
                        help="static cross-attention text window (encoded "
                             "bytes) shared by all lanes; longer requests "
                             "are rejected with a 400")
    parser.add_argument("--tp", type=int, default=0,
                        help="tensor-parallel serving over N chips (shards "
                             "heads/FFN; requires --continuous-batch — the "
                             "batcher's worker owns the mesh context)")
    args = parser.parse_args(argv)

    from .api import Dia

    dia = Dia.from_pretrained(args.model_path, compute_dtype=args.compute_dtype,
                              dac_checkpoint=args.dac_checkpoint)
    mesh = None
    if args.tp > 0:
        if not args.continuous_batch:
            parser.error("--tp requires --continuous-batch")
        import jax

        from .parallel.sharding import make_mesh, shard_params

        devs = jax.devices()
        if len(devs) < args.tp:
            parser.error(f"--tp {args.tp} needs {args.tp} devices, "
                         f"found {len(devs)}")
        mesh = make_mesh(data=1, model=args.tp, devices=devs[: args.tp])
        # shard the bf16 tree FIRST; quantizing sharded arrays yields
        # sharded packed kernels (packed kernels are custom pytree nodes
        # shard_params does not traverse — docs/SERVING.md)
        dia.params = shard_params(dia.params, mesh, config=dia.config)
        if args.quantize_int8:
            with mesh:
                dia.quantize_int8()  # rebuilds dia.generator on the new tree
        else:
            # rebuild the generator too: it must reference the sharded tree,
            # both for fallback (multi-chunk) requests and to release the
            # unsharded weights it would otherwise keep resident
            from .generate import DiaGenerator

            dia.generator = DiaGenerator(dia.params, dia.config,
                                         dia.compute_dtype)
    elif args.quantize_int8:
        dia.quantize_int8()

    batcher = None
    if args.continuous_batch:
        from .cbatch import ContinuousBatcher

        batcher = ContinuousBatcher(dia, n_slots=args.cb_slots,
                                    segment_steps=args.cb_segment_steps,
                                    max_tokens=args.cb_max_tokens,
                                    text_window=args.cb_text_window, mesh=mesh)
    elif args.dynamic_batch:
        from .serving import DynamicBatcher

        batcher = DynamicBatcher(dia, max_batch=args.max_batch,
                                 max_wait_ms=args.batch_wait_ms)

    if not args.no_gradio and batcher is None:
        try:
            serve_gradio(dia, args.host, args.port)
            return 0
        except ImportError:
            print("gradio not installed — falling back to the stdlib HTTP API.")
    serve_http(dia, args.host, args.port, batcher=batcher)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
