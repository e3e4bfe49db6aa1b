"""TTS HTTP server.

Mirror of /root/reference/TTS/server/server.py (routes `/api/tts`:191,
`/details`:163, MaryTTS-compat `/locales,/voices,/process`:212-237, global
synthesis lock :188) on the Python stdlib http.server — no Flask dependency.
"""

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

_INDEX_HTML = """<!DOCTYPE html>
<html>
<head><title>tpu-TTS</title>
<style>
 body { font-family: sans-serif; max-width: 720px; margin: 3em auto; }
 textarea { width: 100%; height: 5em; }
 select, button { margin-top: 0.6em; padding: 0.4em 1em; }
</style></head>
<body>
<h1>tpu-TTS server</h1>
<textarea id="text" placeholder="Type a sentence..."></textarea><br/>
<span id="speakers"></span>
<button onclick="speak()">Speak</button>
<p><audio id="audio" controls autoplay hidden></audio></p>
<script>
async function speak() {
  const text = document.getElementById('text').value;
  const sid = document.getElementById('speaker_id') ? document.getElementById('speaker_id').value : '';
  const r = await fetch('/api/tts?text=' + encodeURIComponent(text) + '&speaker_id=' + encodeURIComponent(sid));
  const b = await r.blob();
  const a = document.getElementById('audio');
  a.src = URL.createObjectURL(b); a.hidden = false; a.play();
}
</script>
</body></html>
"""


class TTSHandler(BaseHTTPRequestHandler):
    # HTTP/1.1 is REQUIRED for the chunked /api/tts_stream response: a 1.0
    # status line with chunked framing makes strict clients read-until-close
    # and deliver the hex chunk-size lines as audio bytes (RFC 7230 §3.3.1).
    # Non-stream routes are unaffected (_send always sets Content-Length).
    protocol_version = "HTTP/1.1"
    # HTTP/1.1 keep-alive would otherwise pin one handler thread per idle
    # persistent connection forever (readline with no timeout); idle
    # connections are reaped after this many seconds instead
    timeout = 60
    synthesizer = None
    lock = threading.Lock()
    details = {}
    # lazily-built shared XttsStreamPool: CONCURRENT /api/tts_stream requests
    # batch into one lockstep decode round (mixed text lengths share a bucket
    # — tpu_tts/infer/xtts_pool.py), so N clients cost barely more than one.
    # The blocking /api/tts route keeps the reference's global-lock behavior.
    _pool = None
    _pool_lock = threading.Lock()
    pool_max_streams = 8

    @classmethod
    def _get_pool(cls, model):
        with cls._pool_lock:
            if cls._pool is None:
                from tpu_tts.infer.xtts_pool import XttsStreamPool

                cls._pool = XttsStreamPool(model, max_streams=cls.pool_max_streams)
            return cls._pool

    # speaker_wav → (cond, spk) cache, keyed by (path, mtime): recomputing
    # the conditioning per request serializes mel+encoder work on the
    # request path and makes concurrent same-speaker clients miss each
    # other's 20 ms gather window. In-flight keys hold an Event so a cold
    # same-speaker burst computes ONCE and the followers wait for it (then
    # all land in the same pool round).
    _cond_cache = {}
    _cond_inflight = {}

    @classmethod
    def _cond_latents_cached(cls, model, speaker_wav):
        from tpu_tts.audio.numpy_transforms import load_wav

        key = (speaker_wav, os.path.getmtime(speaker_wav))
        while True:
            with cls._pool_lock:
                if key in cls._cond_cache:
                    return cls._cond_cache[key]
                evt = cls._cond_inflight.get(key)
                if evt is None:
                    cls._cond_inflight[key] = threading.Event()
                    break
            evt.wait(timeout=300)  # follower: wait for the leader's compute
        try:
            wav = load_wav(
                filename=speaker_wav, sample_rate=model.args.input_sample_rate, resample=True
            )
            out = model.get_conditioning_latents(wav, sr=model.args.input_sample_rate)
            with cls._pool_lock:
                if len(cls._cond_cache) > 64:  # bound memory for long-lived servers
                    cls._cond_cache.clear()
                cls._cond_cache[key] = out
            return out
        finally:
            with cls._pool_lock:
                cls._cond_inflight.pop(key).set()

    def _resolve_xtts(self):
        """The loaded TTS model, iff it supports incremental streaming."""
        from tpu_tts.models.xtts import Xtts

        model = getattr(self.synthesizer, "tts_model", None)
        return model if isinstance(model, Xtts) else None

    def _stream_pcm(self, q):
        """`/api/tts_stream`: chunked 16-bit PCM as the pool emits audio —
        first bytes land after prefill + one chunk, not the full utterance.
        Streaming has no reference-server counterpart (ref server.py renders
        the whole wav per request); the response is raw PCM16 frames with
        the rate in X-Sample-Rate (a WAV container needs a known length)."""
        text = q.get("text", "")
        if not text:
            self._send(400, "missing `text` parameter")
            return
        if getattr(self, "request_version", "HTTP/1.1") == "HTTP/1.0":
            # chunked framing is HTTP/1.1-only: a 1.0 client would read the
            # hex chunk-size lines as PCM bytes (RFC 7230 §3.3.1)
            self._send(505, "/api/tts_stream requires an HTTP/1.1 client (chunked response)")
            return
        model = self._resolve_xtts()
        if model is None:
            self._send(501, "streaming needs an XTTS model (got a batch-synthesis model)")
            return
        import numpy as np

        speaker_id = q.get("speaker_id", "")
        speaker_wav = q.get("speaker_wav", "")
        if speaker_wav and not os.path.isfile(speaker_wav):
            # validate BEFORE the cache: a bad path should be a clear 400,
            # not a FileNotFoundError-turned-500 from the mtime lookup
            self._send(400, "`speaker_wav` is not a readable file on the server")
            return
        if speaker_id and speaker_id in model._bundled_speakers():
            d = model._bundled_speakers()[speaker_id]
            cond = np.asarray(d["gpt_cond_latent"], np.float32).reshape(
                1, -1, int(model.args.gpt_n_model_channels)
            )
            spk = np.asarray(d["speaker_embedding"], np.float32).reshape(1, -1)
        elif speaker_wav:
            cond, spk = self._cond_latents_cached(model, speaker_wav)
        else:
            self._send(400, "XTTS streaming needs `speaker_id` (bundled) or `speaker_wav` (path)")
            return

        pool = self._get_pool(model)
        stream = pool.submit(
            text=text, language=q.get("language_id", "") or "en",
            gpt_cond_latent=cond, speaker_embedding=spk,
        )
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("X-Sample-Rate", str(model.args.output_sample_rate))
        self.send_header("X-Audio-Format", "pcm_s16le")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        # headers are out: NOTHING below may raise into do_GET's catch-all
        # (a second status line injected mid-body would be parsed as a chunk
        # size). On any error, drop the connection without the terminating
        # 0-chunk — the client sees a truncated chunked stream, not garbage.
        try:
            for chunk in stream:
                pcm = (np.clip(np.asarray(chunk, np.float32), -1.0, 1.0) * 32767).astype("<i2").tobytes()
                if pcm:
                    self.wfile.write(b"%x\r\n" % len(pcm) + pcm + b"\r\n")
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            self.close_connection = True  # client hung up; pool round finishes its rows
        except Exception as e:
            print(f" > stream error after headers: {e}", flush=True)
            self.close_connection = True

    def _send(self, code, body, ctype="text/plain"):
        if isinstance(body, str):
            body = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):
        print(" > %s - %s" % (self.address_string(), fmt % args), flush=True)

    # micro-batching queue for end-to-end batch models (VITS family):
    # concurrent /api/tts requests share ONE batched `inference` call instead
    # of serializing behind the lock (tpu_tts/infer/batcher.py). None → the
    # model doesn't qualify and requests take the reference-style locked path.
    _batcher = None

    def _synth_to_wav_bytes(self, text, speaker_id="", language_id="", style_wav=None):
        import numpy as np

        if self._batcher is not None and text and style_wav is None:
            wavs = self._batcher.tts(text, speaker_name=speaker_id, language_name=language_id)
            return self._wav_container(np.asarray(wavs, dtype=np.float32))
        # serialize synthesis — the reference holds a global lock too (:188)
        with self.lock:
            wavs = self.synthesizer.tts(text, speaker_name=speaker_id, language_name=language_id)
        return self._wav_container(np.array(wavs, dtype=np.float32))

    def _wav_container(self, wav):
        import numpy as np
        import scipy.io.wavfile

        wav_norm = (wav * (32767 / max(0.01, float(np.max(np.abs(wav)))))).astype(np.int16)
        buf = io.BytesIO()
        scipy.io.wavfile.write(buf, self.synthesizer.output_sample_rate, wav_norm)
        return buf.getvalue()

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path in ("/", "/index.html"):
                self._send(200, _INDEX_HTML, "text/html")
            elif url.path == "/details":
                self._send(200, json.dumps(self.details, indent=2, default=str), "application/json")
            elif url.path == "/api/tts":
                text = q.get("text", "")
                if not text:
                    self._send(400, "missing `text` parameter")
                    return
                wav = self._synth_to_wav_bytes(
                    text, q.get("speaker_id", ""), q.get("language_id", ""), q.get("style_wav")
                )
                self._send(200, wav, "audio/wav")
            elif url.path == "/api/tts_stream":
                self._stream_pcm(q)
            # ---- MaryTTS compatibility layer (ref :212-237) -----------------
            elif url.path == "/locales":
                self._send(200, "en_US\n")
            elif url.path == "/voices":
                self._send(200, "default en_US u\n")
            elif url.path == "/process":
                text = q.get("INPUT_TEXT", "")
                wav = self._synth_to_wav_bytes(text)
                self._send(200, wav, "audio/wav")
            else:
                self._send(404, "not found")
        except Exception as e:  # surface errors as 500s, keep serving
            self._send(500, f"error: {e}")

    def do_POST(self):
        url = urlparse(self.path)
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode("utf-8") if length else ""
        if url.path == "/process":  # MaryTTS form posts
            q = {k: v[0] for k, v in parse_qs(body).items()}
            try:
                wav = self._synth_to_wav_bytes(q.get("INPUT_TEXT", ""))
                self._send(200, wav, "audio/wav")
            except Exception as e:
                self._send(500, f"error: {e}")
        elif url.path == "/api/tts":
            try:
                q = json.loads(body) if body else {}
            except json.JSONDecodeError:
                q = {k: v[0] for k, v in parse_qs(body).items()}
            try:
                wav = self._synth_to_wav_bytes(q.get("text", ""), q.get("speaker_id", ""))
                self._send(200, wav, "audio/wav")
            except Exception as e:
                self._send(500, f"error: {e}")
        else:
            self._send(404, "not found")


def create_server(args):
    from tpu_tts.infer.synthesizer import Synthesizer

    model_path, config_path = args.model_path, args.config_path
    vocoder_path, vocoder_config_path = args.vocoder_path, args.vocoder_config_path
    vocoder_name = getattr(args, "vocoder_name", None)
    if args.model_name and not model_path:
        from tpu_tts.zoo.manage import ModelManager

        manager = ModelManager()
        model_path, config_path, model_item = manager.download_model(args.model_name)
        vocoder_name = vocoder_name or model_item.get("default_vocoder")
    if vocoder_name and not vocoder_path:
        from tpu_tts.zoo.manage import ModelManager

        vocoder_path, vocoder_config_path, _ = ModelManager().download_model(vocoder_name)

    synthesizer = Synthesizer(
        tts_checkpoint=model_path or "",
        tts_config_path=config_path or "",
        tts_speakers_file=getattr(args, "speakers_file_path", None) or "",
        vocoder_checkpoint=vocoder_path or "",
        vocoder_config=vocoder_config_path or "",
    )
    TTSHandler.synthesizer = synthesizer
    TTSHandler.pool_max_streams = int(getattr(args, "max_streams", 8) or 8)
    from tpu_tts.infer.batcher import TTSMicroBatcher

    if TTSMicroBatcher.supports(synthesizer):
        TTSHandler._batcher = TTSMicroBatcher(
            synthesizer, max_batch=int(getattr(args, "max_batch", 16) or 16)
        )
    TTSHandler.details = {
        "tts_config": synthesizer.tts_config.to_dict() if synthesizer.tts_config else {},
        "vocoder_config": synthesizer.vocoder_config.to_dict() if getattr(synthesizer, "vocoder_config", None) else None,
    }
    return ThreadingHTTPServer((args.host, args.port), TTSHandler)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run the tpu-tts HTTP server.")
    parser.add_argument("--model_name", type=str, default=None)
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--vocoder_path", type=str, default=None)
    parser.add_argument("--vocoder_config_path", type=str, default=None)
    parser.add_argument("--vocoder_name", type=str, default=None, help="Released vocoder model name.")
    parser.add_argument("--speakers_file_path", type=str, default=None, help="JSON file for multi-speaker model.")
    parser.add_argument("--list_models", action="store_true", help="List released models and exit.")
    parser.add_argument(
        "--max_streams", type=int, default=8,
        help="Concurrent /api/tts_stream requests batched per decode round (XTTS).",
    )
    parser.add_argument(
        "--max_batch", type=int, default=16,
        help="Max sentences per micro-batched /api/tts inference call (VITS family).",
    )
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=5002)
    parser.add_argument("--use_cuda", type=bool, default=False)
    parser.add_argument("--debug", type=bool, default=False, help="Accepted for reference-CLI compat.")
    parser.add_argument("--show_details", type=bool, default=False, help="Serve config details at /details.")
    args = parser.parse_args(argv)
    if args.list_models:
        from tpu_tts.zoo.manage import ModelManager

        ModelManager().list_models()
        return
    server = create_server(args)
    print(f" > Serving on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
