"""Python user API: `from tpu_tts import TTS`.

Mirror of /root/reference/TTS/api.py:15: zoo-or-local model loading, `tts()`,
`tts_to_file()`, `voice_conversion()`.
"""

from pathlib import Path
from typing import List, Optional

import numpy as np


class TTS:
    """High-level TTS interface.

    Example:
        >>> tts = TTS(model_path="ckpt_dir", config_path="config.json")
        >>> tts.tts_to_file(text="Hello world!", file_path="out.wav")
    """

    def __init__(
        self,
        model_name: str = "",
        model_path: str = None,
        config_path: str = None,
        vocoder_path: str = None,
        vocoder_config_path: str = None,
        progress_bar: bool = True,
        gpu: bool = False,  # compat no-op; JAX manages devices
    ):
        from tpu_tts.zoo.manage import ModelManager

        self.manager = ModelManager(verbose=False, progress_bar=progress_bar)
        self.synthesizer = None
        self.voice_converter = None
        self.model_name = model_name
        if model_name:
            if "voice_conversion" in model_name:
                self.load_vc_model_by_name(model_name)
            else:
                self.load_tts_model_by_name(model_name)
        elif model_path:
            self.load_tts_model_by_path(model_path, config_path, vocoder_path, vocoder_config_path)

    @property
    def models(self) -> List[str]:
        return self.manager.list_tts_models()

    @staticmethod
    def list_models() -> List[str]:
        from tpu_tts.zoo.manage import ModelManager

        return ModelManager(verbose=False).list_models()

    @staticmethod
    def get_models_file_path() -> str:
        """Path to the bundled released-model registry (ref api.py:122)."""
        import os

        import tpu_tts.zoo as zoo

        return os.path.join(os.path.dirname(zoo.__file__), "models.json")

    @property
    def is_multi_speaker(self) -> bool:
        sm = self.synthesizer.tts_model.speaker_manager if self.synthesizer and self.synthesizer.tts_model else None
        return bool(sm and sm.num_speakers > 1)

    @property
    def speakers(self):
        return self.synthesizer.tts_model.speaker_manager.speaker_names if self.is_multi_speaker else None

    @property
    def is_multi_lingual(self) -> bool:
        lm = self.synthesizer.tts_model.language_manager if self.synthesizer and self.synthesizer.tts_model else None
        return bool(lm and lm.num_languages > 1)

    @property
    def languages(self):
        return self.synthesizer.tts_model.language_manager.language_names if self.is_multi_lingual else None

    def download_model_by_name(self, model_name: str):
        """Resolve a zoo name to (model, config, vocoder, vocoder_config, model_dir) paths (ref api.py:128)."""
        model_path, config_path, model_item = self.manager.download_model(model_name)
        if "fairseq" in model_name or (model_item is not None and isinstance(model_item.get("model_url"), list)):
            return None, None, None, None, model_path
        if not model_item.get("default_vocoder"):
            return model_path, config_path, None, None, None
        vocoder_path, vocoder_config_path, _ = self.manager.download_model(model_item["default_vocoder"])
        return model_path, config_path, vocoder_path, vocoder_config_path, None

    def load_model_by_name(self, model_name: str, gpu: bool = False):
        """Alias of `load_tts_model_by_name` (ref api.py:139)."""
        self.load_tts_model_by_name(model_name)

    def load_vc_model_by_name(self, model_name: str, gpu: bool = False):
        """Load a released voice-conversion model (ref api.py:148)."""
        from tpu_tts.infer.synthesizer import Synthesizer

        self.model_name = model_name
        model_path, config_path, _, _, _ = self.download_model_by_name(model_name)
        self.voice_converter = Synthesizer(vc_checkpoint=model_path, vc_config=config_path)

    def load_tts_model_by_name(self, model_name: str):
        from tpu_tts.infer.synthesizer import Synthesizer

        model_path, config_path, model_item = self.manager.download_model(model_name)
        if config_path is None:
            # multi-file release (fairseq / XTTS-style): the model loads
            # itself from the directory (ref api.py:130)
            self.synthesizer = Synthesizer(model_dir=model_path)
            return
        vocoder_path, vocoder_config_path = None, None
        if model_item.get("default_vocoder"):
            vocoder_path, vocoder_config_path, _ = self.manager.download_model(model_item["default_vocoder"])
        self.synthesizer = Synthesizer(
            tts_checkpoint=model_path,
            tts_config_path=config_path,
            vocoder_checkpoint=vocoder_path or "",
            vocoder_config=vocoder_config_path or "",
        )

    def load_tts_model_by_path(self, model_path, config_path, vocoder_path=None, vocoder_config_path=None):
        from tpu_tts.infer.synthesizer import Synthesizer

        self.synthesizer = Synthesizer(
            tts_checkpoint=model_path,
            tts_config_path=config_path,
            vocoder_checkpoint=vocoder_path or "",
            vocoder_config=vocoder_config_path or "",
        )

    def _check_arguments(self, speaker=None, language=None, speaker_wav=None, **kwargs):
        if self.is_multi_speaker and (speaker is None and speaker_wav is None):
            raise ValueError("Model is multi-speaker but no `speaker` is provided.")
        if self.is_multi_lingual and language is None:
            raise ValueError("Model is multi-lingual but no `language` is provided.")

    def tts(self, text: str, speaker: str = None, language: str = None, speaker_wav: str = None, **kwargs):
        self._check_arguments(speaker=speaker, language=language, speaker_wav=speaker_wav)
        return self.synthesizer.tts(
            text=text, speaker_name=speaker or "", language_name=language or "", speaker_wav=speaker_wav, **kwargs
        )

    def tts_to_file(
        self,
        text: str,
        speaker: str = None,
        language: str = None,
        speaker_wav: str = None,
        file_path: str = "output.wav",
        pipe_out=None,
        **kwargs,
    ) -> str:
        wav = self.tts(text=text, speaker=speaker, language=language, speaker_wav=speaker_wav, **kwargs)
        self.synthesizer.save_wav(wav=wav, path=file_path, pipe_out=pipe_out)
        return file_path

    def voice_conversion(self, source_wav: str, target_wav: str):
        synth = self.voice_converter or self.synthesizer
        return synth.voice_conversion(source_wav=source_wav, target_wav=target_wav)

    def voice_conversion_to_file(self, source_wav: str, target_wav: str, file_path: str = "output.wav") -> str:
        from tpu_tts.audio.numpy_transforms import save_wav

        wav = self.voice_conversion(source_wav, target_wav)
        save_wav(wav=np.array(wav), path=file_path, sample_rate=self._vc_output_sample_rate())
        return file_path

    def _vc_output_sample_rate(self) -> int:
        synth = self.voice_converter or self.synthesizer
        return synth.output_sample_rate

    def tts_with_vc(
        self,
        text: str,
        language: str = None,
        speaker_wav: str = None,
        speaker: str = None,
        split_sentences: bool = True,
    ):
        """Text-to-speech then voice conversion onto `speaker_wav` (ref api.py:381).

        Synthesizes with the loaded TTS model, then converts the result to the
        target speaker with FreeVC (loading the released model if none is).
        """
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as fp:
            self.tts_to_file(
                text=text, speaker=speaker, language=language, file_path=fp.name, split_sentences=split_sentences
            )
        if self.voice_converter is None:
            self.load_vc_model_by_name("voice_conversion_models/multilingual/vctk/freevc24")
        return self.voice_converter.voice_conversion(source_wav=fp.name, target_wav=speaker_wav)

    def tts_with_vc_to_file(
        self,
        text: str,
        language: str = None,
        speaker_wav: str = None,
        file_path: str = "output.wav",
        speaker: str = None,
        split_sentences: bool = True,
    ) -> str:
        from tpu_tts.audio.numpy_transforms import save_wav

        wav = self.tts_with_vc(
            text=text, language=language, speaker_wav=speaker_wav, speaker=speaker, split_sentences=split_sentences
        )
        save_wav(wav=np.array(wav), path=file_path, sample_rate=self.voice_converter.output_sample_rate)
        return file_path
