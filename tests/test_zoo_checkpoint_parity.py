"""Released-checkpoint end-to-end parity (VERDICT r1 next-round #6; BASELINE
acceptance "mel MAE < 1e-3 vs reference checkpoints", mirror of the
reference's zoo tests, ref tests/zoo_tests/test_models.py:22).

Downloads the LJSpeech VITS release through the real ModelManager path
(zip URL → extract → _update_paths), runs the reference torch model AND the
ingested flax model on the same sentence with deterministic inference
settings, and compares mel spectrograms of the produced audio.

NETWORK GATE: this sandbox has zero egress (verified: DNS resolution fails
for github.com), so the download step cannot run here and the test SKIPS
with the blocker recorded. On any networked machine it executes fully. The
converter itself is exercised against random-init reference modules in
tests/test_torch_parity_vits.py (13 parity suites), so only the
artifact-download leg is blocked, not the numerical path.
"""

import os
import socket

import numpy as np
import pytest

MODEL_NAME = "tts_models/en/ljspeech/vits"


def _online(host="github.com") -> bool:
    try:
        socket.getaddrinfo(host, 443)
        return True
    except OSError:
        return False


@pytest.mark.slow
def test_zoo_vits_release_end_to_end_mel_parity(tmp_path):
    if not _online():
        pytest.skip(
            "zero-egress sandbox: cannot download the released checkpoint "
            f"({MODEL_NAME}); run on a networked machine for the full parity leg"
        )

    from tpu_tts.zoo.manage import ModelManager

    manager = ModelManager(output_prefix=str(tmp_path), progress_bar=False)
    model_path, config_path, _ = manager.download_model(MODEL_NAME)

    from tpu_tts.config import load_config
    from tpu_tts.models import setup_model

    config = load_config(config_path)
    model = setup_model(config)
    model.load_checkpoint(config, model_path)

    text = "The quick brown fox jumps over the lazy dog."
    ids = np.asarray(model.tokenizer.text_to_ids(text), dtype=np.int32)
    out = model.inference(ids, aux_input={"noise_scale": 0.0, "sdp_noise_scale": 0.0})
    wav_ours = np.asarray(out["model_outputs"]).reshape(-1)

    # reference torch model on the same checkpoint + settings
    from tests.ref_torch_loader import load_reference, ref_import

    assert load_reference() is not None
    torch = __import__("torch")
    ref_vits_mod = ref_import("TTS.tts.models.vits")
    ref_cfg = ref_import("TTS.tts.configs.vits_config").VitsConfig()
    ref_cfg = ref_cfg.from_dict(load_config(config_path).to_dict())
    ref_model = ref_vits_mod.Vits.init_from_config(ref_cfg)
    ref_model.load_checkpoint(ref_cfg, model_path, eval=True)
    ref_model.inference_noise_scale = 0.0
    ref_model.inference_noise_scale_dp = 0.0
    with torch.no_grad():
        ref_out = ref_model.inference(torch.tensor(ids)[None])
    wav_ref = ref_out["model_outputs"].squeeze().cpu().numpy()

    n = min(len(wav_ours), len(wav_ref))
    mel_ours = model.ap.melspectrogram(wav_ours[:n])
    mel_ref = model.ap.melspectrogram(wav_ref[:n])
    mae = float(np.mean(np.abs(mel_ours - mel_ref)))
    assert mae < 1e-3, f"mel MAE {mae} vs released checkpoint"
