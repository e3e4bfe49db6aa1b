"""Verify drive: start the real HTTP server with a tiny XTTS model (CPU) and
exercise /api/tts_stream including the r5 input gates (bad speaker_wav -> 400,
HTTP/1.0 -> 505, good request -> 200 chunked PCM)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import http.client
import sys
import threading

import numpy as np
import scipy.io.wavfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from http.server import ThreadingHTTPServer

from tpu_tts.configs.xtts_config import XttsConfig
from tpu_tts.models.xtts import Xtts, XttsArgs
from tpu_tts.server.server import TTSHandler

cfg = XttsConfig()
cfg.model_args = XttsArgs(
    gpt_layers=2, gpt_n_heads=2, gpt_n_model_channels=32,
    gpt_number_text_tokens=50, gpt_num_audio_tokens=34,
    gpt_start_audio_token=32, gpt_stop_audio_token=33,
    gpt_start_text_token=48, gpt_stop_text_token=0,
    num_cond_latents=4, d_vector_dim=16, decoder_input_dim=32,
    decoder_upsample_rates=(4, 4), kv_cache_len=128,
)
model = Xtts(cfg)
model.init_params(jax.random.PRNGKey(0))
model.bpe.encode = lambda text, lang: [ord(c) % 40 + 1 for c in text][:12]

wav_path = "/tmp/drive_speaker.wav"
rng = np.random.default_rng(0)
scipy.io.wavfile.write(wav_path, 22050, (rng.standard_normal(11025) * 8000).astype(np.int16))


class _StubSynth:
    tts_model = model
    output_sample_rate = 24000
    tts_config = None


class _Handler(TTSHandler):
    synthesizer = _StubSynth()
    _pool = None
    _pool_lock = threading.Lock()
    pool_max_streams = 3


srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
threading.Thread(target=srv.serve_forever, daemon=True).start()
port = srv.server_address[1]

# 1. bad speaker_wav -> 400 (NOT a 500 from getmtime)
c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
c.request("GET", "/api/tts_stream?text=hello&speaker_wav=/no/such/file.wav")
r = c.getresponse()
body = r.read()
print("bad speaker_wav:", r.status, body[:80])
assert r.status == 400, r.status

# 2. HTTP/1.0 client -> 505
c10 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
c10._http_vsn, c10._http_vsn_str = 10, "HTTP/1.0"
c10.request("GET", f"/api/tts_stream?text=hello&speaker_wav={wav_path}")
r = c10.getresponse()
print("HTTP/1.0:", r.status, r.read()[:80])
assert r.status == 505, r.status

# 3. good request -> 200, chunked PCM, finite audio
c.request("GET", f"/api/tts_stream?text=hello+world&speaker_wav={wav_path}")
r = c.getresponse()
body = r.read()
pcm = np.frombuffer(body, dtype="<i2")
print("good:", r.status, r.getheader("X-Audio-Format"), len(pcm), "samples")
assert r.status == 200 and len(pcm) > 0 and np.isfinite(pcm.astype(np.float32)).all()

# 4. /api/tts missing text still 400 (regression check on the catch-all)
c.request("GET", "/api/tts_stream")
r = c.getresponse()
print("no text:", r.status, r.read()[:40])
assert r.status == 400

srv.shutdown()
print("DRIVE OK")
