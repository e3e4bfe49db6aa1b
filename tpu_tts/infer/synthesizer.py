"""Synthesizer: the top inference orchestrator (models + vocoder + text).

Mirror of /root/reference/TTS/utils/synthesizer.py:26 (`tts`:257, vocoder
stage :411-429 incl. the denorm/renorm handshake between TTS and vocoder
audio configs, silence trim :437, sentence joining :441, RTF print :500).
"""

import os
import time
from typing import List, Optional

import numpy as np

from tpu_tts.config import load_config
from tpu_tts.infer.synthesis import synthesis, transfer_voice, trim_silence
from tpu_tts.text.sentence_split import split_sentences


class Synthesizer:
    def __init__(
        self,
        tts_checkpoint: str = "",
        tts_config_path: str = "",
        tts_speakers_file: str = "",
        tts_languages_file: str = "",
        vocoder_checkpoint: str = "",
        vocoder_config: str = "",
        encoder_checkpoint: str = "",
        encoder_config: str = "",
        vc_checkpoint: str = "",
        vc_config: str = "",
        model_dir: str = "",
        voice_dir=None,
        use_cuda: bool = False,  # accepted for CLI compat; device is JAX-managed
    ) -> None:
        self.tts_checkpoint = tts_checkpoint
        self.tts_config_path = tts_config_path
        self.tts_speakers_file = tts_speakers_file
        self.vocoder_checkpoint = vocoder_checkpoint
        self.vocoder_config_path = vocoder_config
        self.voice_dir = voice_dir
        self.tts_model = None
        self.vocoder_model = None
        self.vc_model = None
        self.speaker_manager = None
        self.language_manager = None
        self.output_sample_rate = 22050

        if tts_checkpoint:
            self._load_tts(tts_checkpoint, tts_config_path)
        if vocoder_checkpoint:
            self._load_vocoder(vocoder_checkpoint, vocoder_config)
        if vc_checkpoint:
            self._load_vc(vc_checkpoint, vc_config)
        if model_dir:
            if "fairseq" in model_dir:
                self._load_fairseq_from_dir(model_dir)
            else:
                self._load_tts_from_dir(model_dir)

    # ----------------------------------------------------------------- loads
    def _load_tts(self, checkpoint: str, config_path: str) -> None:
        from tpu_tts.models import setup_model

        self.tts_config = load_config(config_path)
        if self.tts_speakers_file:
            # CLI/server override of the config's speakers file (ref synthesizer.py:30)
            if hasattr(self.tts_config, "speakers_file"):
                self.tts_config.speakers_file = self.tts_speakers_file
            if getattr(self.tts_config, "model_args", None) is not None and hasattr(
                self.tts_config.model_args, "speakers_file"
            ):
                self.tts_config.model_args.speakers_file = self.tts_speakers_file
        self.tts_model = setup_model(self.tts_config)
        self.tts_model.load_checkpoint(self.tts_config, checkpoint, eval=True)
        self.speaker_manager = self.tts_model.speaker_manager
        self.language_manager = self.tts_model.language_manager
        self.output_sample_rate = self.tts_config.audio["sample_rate"]

    def _load_vocoder(self, checkpoint: str, config_path: str) -> None:
        from tpu_tts.audio import AudioProcessor
        from tpu_tts.vocoder.models import setup_model as setup_vocoder

        self.vocoder_config = load_config(config_path)
        self.vocoder_ap = AudioProcessor.init_from_config(self.vocoder_config, verbose=False)
        self.vocoder_model = setup_vocoder(self.vocoder_config)
        self.vocoder_model.load_checkpoint(self.vocoder_config, checkpoint, eval=True)
        self.output_sample_rate = self.vocoder_config.audio["sample_rate"]

    def _load_fairseq_from_dir(self, model_dir: str) -> None:
        """Load a fairseq-MMS VITS release directory (ref synthesizer.py:144):
        the model builds its own tokenizer from the shipped vocab."""
        from tpu_tts.configs.vits_config import VitsConfig
        from tpu_tts.models.vits import Vits

        self.tts_config = VitsConfig()
        self.tts_model = Vits.init_from_config(self.tts_config)
        self.tts_model.load_fairseq_checkpoint(self.tts_config, checkpoint_dir=model_dir, eval=True)
        self.tts_config = self.tts_model.config
        self.output_sample_rate = self.tts_config.audio["sample_rate"]

    def _load_tts_from_dir(self, model_dir: str) -> None:
        """Load a multi-file model directory with its own `config.json`
        (XTTS-style releases; ref synthesizer.py:156)."""
        import glob as _glob

        from tpu_tts.models import setup_model

        self.tts_config = load_config(os.path.join(model_dir, "config.json"))
        self.tts_model = setup_model(self.tts_config)
        if getattr(self.tts_config, "model", "") in ("bark", "tortoise"):
            # multi-checkpoint releases ingest the whole directory
            # (ref bark.py:242, tortoise.py:832)
            ckpt = model_dir
        else:
            ckpts = [p for p in ("model.pth", "model_file.pth", "checkpoint.pth") if os.path.exists(os.path.join(model_dir, p))]
            ckpt = os.path.join(model_dir, ckpts[0]) if ckpts else next(iter(sorted(_glob.glob(os.path.join(model_dir, "*.pth")))), model_dir)
        self.tts_model.load_checkpoint(self.tts_config, ckpt, eval=True)
        self.speaker_manager = getattr(self.tts_model, "speaker_manager", None)
        self.language_manager = getattr(self.tts_model, "language_manager", None)
        self.output_sample_rate = self.tts_config.audio["sample_rate"]

    def _load_vc(self, checkpoint: str, config_path: str) -> None:
        from tpu_tts.vc.models import setup_model as setup_vc

        self.vc_config = load_config(config_path)
        self.vc_model = setup_vc(self.vc_config)
        self.vc_model.load_checkpoint(self.vc_config, checkpoint)
        self.output_sample_rate = self.vc_config.audio["sample_rate"]

    # ------------------------------------------------------------------ text
    def split_into_sentences(self, text: str) -> List[str]:
        return split_sentences(text)

    def save_wav(self, wav: np.ndarray, path: str, pipe_out=None) -> None:
        wav = np.array(wav)
        self.tts_model.ap.save_wav(wav, path, self.output_sample_rate, pipe_out=pipe_out)

    # --------------------------------------------------------- id resolution
    def resolve_speaker(self, speaker_name: str = "", speaker_wav=None):
        """(speaker_id, d_vector) for a request — shared by the blocking
        `tts` path and the server micro-batcher (ref synthesizer.py:305)."""
        speaker_id = None
        d_vector = None
        if self.speaker_manager is not None and getattr(self.speaker_manager, "name_to_id", None):
            if speaker_name and isinstance(speaker_name, str):
                if getattr(self.tts_config, "use_d_vector_file", False) or (
                    hasattr(self.tts_config, "model_args")
                    and getattr(self.tts_config.model_args, "use_d_vector_file", False)
                ):
                    d_vector = self.speaker_manager.get_mean_embedding(speaker_name, num_samples=None)
                else:
                    speaker_id = self.speaker_manager.name_to_id[speaker_name]
            elif len(self.speaker_manager.name_to_id) == 1:
                speaker_id = list(self.speaker_manager.name_to_id.values())[0]
            elif not speaker_wav:
                if len(self.speaker_manager.name_to_id) > 1:
                    raise ValueError(
                        " [!] Looks like you are using a multi-speaker model. "
                        "You need to define either a `speaker_idx` or a `speaker_wav` to use a multi-speaker model."
                    )
        if speaker_wav is not None and self.speaker_manager is not None and self.speaker_manager.encoder is not None:
            d_vector = self.speaker_manager.compute_embedding_from_clip(speaker_wav)
        return speaker_id, d_vector

    def resolve_language(self, language_name: str = ""):
        language_id = None
        if self.language_manager is not None and getattr(self.language_manager, "name_to_id", None):
            if language_name and isinstance(language_name, str):
                language_id = self.language_manager.name_to_id[language_name]
            elif len(self.language_manager.name_to_id) == 1:
                language_id = list(self.language_manager.name_to_id.values())[0]
        return language_id

    # ------------------------------------------------------------------- tts
    def tts(
        self,
        text: str = "",
        speaker_name: str = "",
        language_name: str = "",
        speaker_wav=None,
        style_wav=None,
        style_text=None,
        reference_wav=None,
        reference_speaker_name=None,
        split_sentences: bool = True,
        **kwargs,
    ) -> List[float]:
        start_time = time.time()
        wavs = []

        if not text and not reference_wav:
            raise ValueError("You need to define either `text` or a `reference_wav` to use the Coqui TTS API.")

        if text:
            sens = [text]
            if split_sentences:
                sens = self.split_into_sentences(text)
            print(" > Text splitted to sentences.")
            print(sens)

        # --- resolve speaker / language --------------------------------------
        speaker_id, d_vector = self.resolve_speaker(speaker_name, speaker_wav)
        language_id = self.resolve_language(language_name)

        use_gl = self.vocoder_model is None

        if reference_wav is not None:
            # voice transfer path
            ref = self.tts_model.ap.load_wav(reference_wav) if isinstance(reference_wav, str) else reference_wav
            ref_spk_id = None
            ref_d_vector = None
            if reference_speaker_name and self.speaker_manager is not None:
                ref_spk_id = self.speaker_manager.name_to_id.get(reference_speaker_name)
            wav = transfer_voice(
                self.tts_model, self.tts_config, ref,
                speaker_id=speaker_id, d_vector=d_vector,
                reference_speaker_id=ref_spk_id, reference_d_vector=ref_d_vector,
            )
            wavs = list(np.asarray(wav, dtype=np.float32))
        else:
            for sen in sens:
                if hasattr(self.tts_model, "synthesize"):
                    # self-contained pipelines: Bark / Tortoise / XTTS
                    # (ref synthesizer.py:385)
                    outputs = self.tts_model.synthesize(
                        text=sen, config=self.tts_config,
                        speaker_id=speaker_name or "random",
                        voice_dirs=self.voice_dir,
                        speaker_wav=speaker_wav,
                        language=language_name or "en", **kwargs,
                    )
                else:
                    outputs = synthesis(
                        model=self.tts_model,
                        text=sen,
                        CONFIG=self.tts_config,
                        speaker_id=speaker_id,
                        d_vector=d_vector,
                        language_id=language_id,
                        use_griffin_lim=use_gl,
                        do_trim_silence=False,
                    )
                if outputs["wav"] is not None:
                    waveform = outputs["wav"]
                else:
                    # vocoder stage: TTS-mel denormalize → vocoder-mel normalize
                    mel = outputs["model_outputs"]  # [T, C] normalized TTS mel
                    mel_denorm = self.tts_model.ap.denormalize(mel.T).T
                    vocoder_input = self.vocoder_ap.normalize(mel_denorm.T).T
                    scale_factor = self.vocoder_config.audio["sample_rate"] / self.tts_config.audio["sample_rate"]
                    if scale_factor != 1.0:
                        vocoder_input = _interpolate_mel(vocoder_input, scale_factor)
                    waveform = self.vocoder_model.inference(vocoder_input.astype(np.float32))[0, :, 0]
                if getattr(self.tts_config.audio, "do_trim_silence", False) and self.tts_model.ap is not None:
                    waveform = trim_silence(waveform, self.tts_model.ap)
                wavs += list(np.asarray(waveform, dtype=np.float32))
                wavs += [0.0] * 10000  # inter-sentence silence (ref :441)

        process_time = time.time() - start_time
        audio_time = len(wavs) / self.output_sample_rate
        print(f" > Processing time: {process_time}")
        print(f" > Real-time factor: {process_time / max(audio_time, 1e-9)}")
        return wavs

    def voice_conversion(self, source_wav: str, target_wav: str, **kwargs) -> List[float]:
        if self.vc_model is None:
            raise RuntimeError(" [!] Voice-conversion model is not loaded.")
        return list(self.vc_model.voice_conversion(source_wav, target_wav))


def _interpolate_mel(mel: np.ndarray, scale_factor: float) -> np.ndarray:
    """Time-axis linear interpolation on SR mismatch (ref
    vocoder/utils/generic_utils.py:11)."""
    T, C = mel.shape
    new_T = int(round(T * scale_factor))
    x_old = np.linspace(0, 1, T)
    x_new = np.linspace(0, 1, new_T)
    return np.stack([np.interp(x_new, x_old, mel[:, c]) for c in range(C)], axis=1)
