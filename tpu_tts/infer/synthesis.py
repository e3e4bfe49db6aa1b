"""Single-utterance synthesis helpers.

Mirror of /root/reference/TTS/tts/utils/synthesis.py (`synthesis`:116,
`trim_silence`:71, `inv_spectrogram`): tokenize → model.inference → wav or
mel (+ Griffin-Lim fallback).
"""

from typing import Dict, Optional

import numpy as np

# model families whose inference returns waveform directly
END2END_MODELS = {"vits", "yourtts", "delightful_tts"}


def trim_silence(wav: np.ndarray, ap) -> np.ndarray:
    return wav[: ap.find_endpoint(wav)]


def inv_spectrogram(postnet_output: np.ndarray, ap, CONFIG) -> np.ndarray:
    if CONFIG.model.lower() in ("tacotron",):
        return ap.inv_spectrogram(postnet_output.T)
    return ap.inv_melspectrogram(postnet_output.T)


def synthesis(
    model,
    text: str,
    CONFIG,
    speaker_id: Optional[int] = None,
    style_wav=None,
    use_griffin_lim: bool = False,
    do_trim_silence: bool = False,
    d_vector=None,
    language_id: Optional[int] = None,
) -> Dict:
    """Tokenize + run model inference; optionally Griffin-Lim to waveform."""
    import jax.numpy as jnp

    language_name = None
    if language_id is not None and model.language_manager is not None:
        language = [k for k, v in model.language_manager.name_to_id.items() if v == language_id]
        if language:
            language_name = language[0]

    token_ids = np.asarray(model.tokenizer.text_to_ids(text, language=language_name), dtype=np.int32)
    aux_input = {}
    if speaker_id is not None:
        aux_input["speaker_ids"] = jnp.asarray([speaker_id], dtype=jnp.int32)
    if d_vector is not None:
        aux_input["d_vectors"] = jnp.asarray(np.asarray(d_vector, dtype=np.float32)[None])
    if language_id is not None:
        aux_input["language_ids"] = jnp.asarray([language_id], dtype=jnp.int32)

    outputs = model.inference(token_ids, aux_input=aux_input)
    model_outputs = np.asarray(outputs["model_outputs"])
    y_len = int(np.asarray(outputs.get("y_lengths", [model_outputs.shape[1]]))[0])

    wav = None
    if CONFIG.model.lower() in END2END_MODELS or model_outputs.shape[-1] == 1:
        # waveform output [1, T, 1]; valid length = frames * hop
        hop = model.ap.hop_length
        wav = model_outputs[0, : y_len * hop, 0]
    else:
        mel = model_outputs[0, :y_len]  # [T, C]
        if use_griffin_lim:
            wav = inv_spectrogram(mel, model.ap, CONFIG)
        model_outputs = mel
    if wav is not None and do_trim_silence:
        wav = trim_silence(wav, model.ap)
    return {
        "wav": wav,
        "model_outputs": model_outputs,
        "alignments": np.asarray(outputs.get("alignments")) if "alignments" in outputs else None,
        "text_inputs": token_ids,
        "outputs": outputs,
    }


def transfer_voice(
    model,
    CONFIG,
    reference_wav,
    speaker_id=None,
    d_vector=None,
    reference_speaker_id=None,
    reference_d_vector=None,
    do_trim_silence=False,
):
    """Voice conversion entry (ref synthesis.py:255)."""
    src_cond = reference_speaker_id if reference_speaker_id is not None else reference_d_vector
    tgt_cond = speaker_id if speaker_id is not None else d_vector
    wav = model.voice_conversion(reference_wav, src_cond, tgt_cond)
    if do_trim_silence:
        wav = trim_silence(wav, model.ap)
    return wav
