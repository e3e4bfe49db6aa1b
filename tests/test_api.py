"""Python `TTS` user-API tests (ref TTS/api.py:15, tests/inference_tests)."""

import os

import numpy as np
import pytest

from tpu_tts.api import TTS


def test_list_models_and_models_file():
    models = TTS.list_models()
    assert len(models) > 50
    assert any(m.startswith("tts_models/") for m in models)
    assert any(m.startswith("vocoder_models/") for m in models)
    assert any(m.startswith("voice_conversion_models/") for m in models)
    assert os.path.exists(TTS.get_models_file_path())


def _make_glow_checkpoint(tmp_path):
    import jax

    from tpu_tts.configs.glow_tts_config import GlowTTSConfig
    from tpu_tts.models.glow_tts import GlowTTS
    from tpu_tts.train.checkpoint import save_checkpoint

    cfg = GlowTTSConfig(
        out_channels=80,
        hidden_channels_enc=32,
        hidden_channels_dec=32,
        hidden_channels_dp=16,
        num_flow_blocks_dec=2,
        num_block_layers=1,
        encoder_params={
            "kernel_size": 3,
            "dropout_p": 0.1,
            "num_layers": 1,
            "num_heads": 2,
            "hidden_channels_ffn": 32,
        },
        data_dep_init_steps=0,
    )
    model = GlowTTS.init_from_config(cfg)
    model.init_params(jax.random.PRNGKey(0))
    out_dir = str(tmp_path / "run")
    os.makedirs(out_dir, exist_ok=True)
    ckpt = save_checkpoint({"model": model.params}, out_dir, step=0, config=model.config)
    return ckpt, os.path.join(out_dir, "config.json")


def test_api_tts_and_to_file(tmp_path):
    ckpt, cfg_path = _make_glow_checkpoint(tmp_path)
    api = TTS(model_path=ckpt, config_path=cfg_path)
    wav = api.tts("Hello world.")
    wav = np.asarray(wav)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
    out = api.tts_to_file("Hello again.", file_path=str(tmp_path / "out.wav"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert not api.is_multi_speaker and not api.is_multi_lingual
    assert api.speakers is None and api.languages is None


class _StubVC:
    output_sample_rate = 16000

    def __init__(self):
        self.calls = []

    def voice_conversion(self, source_wav, target_wav):
        self.calls.append((source_wav, target_wav))
        return np.zeros(160, dtype=np.float32)


def test_tts_with_vc_to_file(tmp_path):
    ckpt, cfg_path = _make_glow_checkpoint(tmp_path)
    api = TTS(model_path=ckpt, config_path=cfg_path)
    api.voice_converter = _StubVC()
    target = str(tmp_path / "target.wav")
    out = api.tts_with_vc_to_file(
        "Convert me.", speaker_wav=target, file_path=str(tmp_path / "vc.wav")
    )
    assert os.path.exists(out)
    (src, tgt), = api.voice_converter.calls
    assert tgt == target and os.path.exists(src)


def test_registry_resolution():
    api = TTS()
    # no-network test: only exercise the registry resolution logic
    item = api.manager.models_dict["tts_models"]["en"]["ljspeech"]["glow-tts"]
    assert "default_vocoder" in item
    api.manager.model_info_by_full_name("tts_models/en/ljspeech/glow-tts")
