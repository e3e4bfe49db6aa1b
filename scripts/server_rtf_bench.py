"""Aggregate /api/tts throughput over REAL HTTP (VERDICT r4 #6): boot the
stdlib server with a full-size VITS (random weights — throughput depends on
the program, not the values), fire synchronized waves of concurrent
requests, and report the aggregate realtime factor the SERVER delivers —
micro-batched (TTSMicroBatcher) vs the reference's global-lock B=1 serving
(ref server/server.py:188).

Wave shape: N threads release on a barrier; the first request executes
immediately (natural batching, B=1), the rest form one padded power-of-two
batch — so the compiled ladder stays {1, N} and the measured number includes
tokenization, batching, WAV container and HTTP overhead.

Usage: python scripts/server_rtf_bench.py   (TPU by default; SRV_WAVES,
SRV_CONC, SRV_MAX_BATCH env knobs; TPU_TTS_PLATFORM=cpu for a smoke run)
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.parse
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()


def _make_checkpoint(tmp_dir: str):
    import jax

    from tpu_tts.configs.vits_config import VitsConfig
    from tpu_tts.models.vits import Vits
    from tpu_tts.train.checkpoint import save_checkpoint

    cfg = VitsConfig(text_cleaner="english_cleaners", use_phonemes=False)
    model = Vits.init_from_config(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model.init_params(jax.random.PRNGKey(0))
    os.makedirs(tmp_dir, exist_ok=True)
    ckpt = save_checkpoint({"model": model.params}, tmp_dir, step=0, config=model.config)
    return ckpt, os.path.join(tmp_dir, "config.json")


def main():
    import scipy.io.wavfile

    from tpu_tts.server.server import TTSHandler, create_server

    conc = int(os.environ.get("SRV_CONC", "64"))
    waves = int(os.environ.get("SRV_WAVES", "3"))
    max_batch = int(os.environ.get("SRV_MAX_BATCH", "64"))
    tmp = "/tmp/tpu_tts_server_rtf"
    t0 = time.perf_counter()
    ckpt, cfg_path = _make_checkpoint(tmp)
    args = argparse.Namespace(
        model_name=None, model_path=ckpt, config_path=cfg_path,
        vocoder_path=None, vocoder_config_path=None, vocoder_name=None,
        speakers_file_path=None, host="127.0.0.1", port=0, max_batch=max_batch,
    )
    srv = create_server(args)
    assert TTSHandler._batcher is not None, "VITS must take the micro-batched path"
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"[srv] up in {time.perf_counter()-t0:.1f}s at {base}", file=sys.stderr, flush=True)

    text = "The quick brown fox jumps over the lazy dog near the quiet river bank."

    def fetch(out, i):
        with urllib.request.urlopen(
            f"{base}/api/tts?text={urllib.parse.quote(text)}", timeout=1800
        ) as r:
            out[i] = r.read()

    def wave(n):
        out = {}
        barrier = threading.Barrier(n + 1)
        def go(i):
            barrier.wait()
            fetch(out, i)
        threads = [threading.Thread(target=go, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        audio_s = 0.0
        for body in out.values():
            sr, wav = scipy.io.wavfile.read(io.BytesIO(body))
            audio_s += len(wav) / sr
        return dt, audio_s

    print("[srv] warmup wave (compiles B=1 + padded batch programs)...",
          file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    wave(conc)
    print(f"[srv] warmup {time.perf_counter()-t_c:.1f}s", file=sys.stderr, flush=True)

    rtfs, lat = [], []
    for w in range(waves):
        dt, audio_s = wave(conc)
        rtfs.append(audio_s / dt)
        lat.append(dt)
        print(f"[srv] wave {w}: {conc} reqs in {dt:.2f}s, {audio_s:.1f}s audio "
              f"-> {audio_s/dt:.0f}x realtime", file=sys.stderr, flush=True)
    b = TTSHandler._batcher
    out = {
        "concurrency": conc,
        "max_batch": max_batch,
        "aggregate_rtf_http": round(float(np.median(rtfs)), 1),
        "wave_wall_s": round(float(np.median(lat)), 2),
        "batches_run": b.batches_run,
        "rows_run": b.rows_run,
        "bench_rtf_b128": 2333.19,  # BENCH_r04 compute-only headline at B=128
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
