"""`/api/tts` micro-batching (VERDICT r4 #6): concurrent blocking requests to
an end-to-end batch model (VITS) must share ONE batched `inference` call
instead of serializing behind the global lock — the reference server holds a
global lock and runs B=1 per request (ref server/server.py:188)."""

import argparse
import io
import threading
import urllib.request

import numpy as np
import pytest
import scipy.io.wavfile


def _make_vits_checkpoint(tmp_path):
    import os

    import jax

    from tpu_tts.configs.vits_config import VitsArgs, VitsAudioConfig, VitsConfig
    from tpu_tts.models.vits import Vits
    from tpu_tts.train.checkpoint import save_checkpoint

    args = VitsArgs(
        num_chars=0,
        out_channels=129,
        spec_segment_size=8,
        hidden_channels=32,
        hidden_channels_ffn_text_encoder=32,
        num_heads_text_encoder=2,
        num_layers_text_encoder=1,
        num_layers_posterior_encoder=2,
        num_layers_flow=2,
        upsample_rates_decoder=[4, 4, 4],
        upsample_kernel_sizes_decoder=[8, 8, 8],
        upsample_initial_channel_decoder=16,
        resblock_kernel_sizes_decoder=[3],
        resblock_dilation_sizes_decoder=[[1, 3]],
        resblock_type_decoder="2",
        periods_multi_period_discriminator=[2, 3],
    )
    audio = VitsAudioConfig(
        fft_size=256, sample_rate=22050, win_length=256, hop_length=64,
        num_mels=40, mel_fmax=8000.0,
    )
    cfg = VitsConfig(
        model_args=args, audio=audio, text_cleaner="english_cleaners",
        use_phonemes=False,
    )
    model = Vits.init_from_config(cfg)
    model.init_params(jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir, exist_ok=True)
    ckpt = save_checkpoint({"model": model.params}, out_dir, step=0, config=model.config)
    return ckpt, os.path.join(out_dir, "config.json")


@pytest.fixture(scope="module")
def vits_server(tmp_path_factory):
    from tpu_tts.infer.batcher import TTSMicroBatcher
    from tpu_tts.server.server import TTSHandler, create_server

    tmp = tmp_path_factory.mktemp("vits_srv")
    ckpt, cfg_path = _make_vits_checkpoint(tmp)
    args = argparse.Namespace(
        model_name=None, model_path=ckpt, config_path=cfg_path,
        vocoder_path=None, vocoder_config_path=None, vocoder_name=None,
        speakers_file_path=None, host="127.0.0.1", port=0,
    )
    srv = create_server(args)
    assert TTSHandler._batcher is not None, "VITS must qualify for micro-batching"
    # widen the gather window so the concurrency test is deterministic
    TTSHandler._batcher.close()
    TTSHandler._batcher = TTSMicroBatcher(TTSHandler.synthesizer, gather_window_s=0.5)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", TTSHandler._batcher
    srv.shutdown()
    TTSHandler._batcher.close()
    TTSHandler._batcher = None


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_batched_api_tts_single(vits_server):
    base, batcher = vits_server
    status, ctype, body = _get(base + "/api/tts?text=hello%20batch%20server")
    assert status == 200 and ctype == "audio/wav"
    sr, wav = scipy.io.wavfile.read(io.BytesIO(body))
    assert sr == 22050 and len(wav) > 1000
    assert batcher.batches_run >= 1


def test_concurrent_api_tts_share_one_batch(vits_server):
    base, batcher = vits_server
    b0 = batcher.batches_run
    results = {}

    def go(i):
        results[i] = _get(base + f"/api/tts?text=concurrent%20request%20{i}")

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(4):
        status, ctype, body = results[i]
        assert status == 200 and ctype == "audio/wav"
        sr, wav = scipy.io.wavfile.read(io.BytesIO(body))
        assert np.isfinite(wav.astype(np.float32)).all() and len(wav) > 1000
    assert batcher.batches_run - b0 < 4, (
        f"4 concurrent requests ran {batcher.batches_run - b0} separate batches "
        "— micro-batching regressed to serial"
    )


def test_batched_matches_locked_path(vits_server):
    """The batched route must produce the same audio as the reference-style
    locked path for the same text/seed (same tokens, same padded program)."""
    from tpu_tts.server.server import TTSHandler

    base, batcher = vits_server
    _, _, body_batched = _get(base + "/api/tts?text=same%20words%20either%20way")
    TTSHandler._batcher, saved = None, TTSHandler._batcher
    try:
        _, _, body_locked = _get(base + "/api/tts?text=same%20words%20either%20way")
    finally:
        TTSHandler._batcher = saved
    sr1, wav1 = scipy.io.wavfile.read(io.BytesIO(body_batched))
    sr2, wav2 = scipy.io.wavfile.read(io.BytesIO(body_locked))
    assert sr1 == sr2
    assert wav1.shape == wav2.shape
    np.testing.assert_allclose(
        wav1.astype(np.float32), wav2.astype(np.float32),
        atol=np.abs(wav2).max() * 2e-3 + 2,
    )
