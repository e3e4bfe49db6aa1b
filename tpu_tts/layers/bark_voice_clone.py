"""Bark voice cloning: audio → (semantic, coarse, fine) history prompts.

Behavioral mirror of /root/reference/TTS/tts/layers/bark/
{hubert/hubert_manager.py:9, hubert/kmeans_hubert.py:39, hubert/tokenizer.py:16,
inference_funcs.py:30-150 (`get_voices`, `load_npz`, `load_voice`,
`generate_voice`)}. The heavy externals (HuBERT base encoder, the community
quantizer checkpoint, EnCodec) are host-side torch models pulled in lazily and
gated with clear errors when unavailable — they run once per cloned voice and
produce an `.npz` prompt cache; everything after that is our JAX cascade.
"""

import glob as _glob
import os
import shutil
from typing import Dict, List, Optional, Tuple

import numpy as np

HUBERT_BASE_URL = "https://dl.fbaipublicfiles.com/hubert/hubert_base_ls960.pt"
TOKENIZER_REPO = "GitMylo/bark-voice-cloning"
TOKENIZER_NAME = "quantifier_hubert_base_ls960_14.pth"


def _resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return np.asarray(x, dtype=np.float32)
    import math

    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    return resample_poly(x, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


class HubertManager:
    """Fetch-or-find the HuBERT encoder + quantizer checkpoints
    (ref hubert_manager.py:9)."""

    @staticmethod
    def make_sure_hubert_installed(download_url: str = HUBERT_BASE_URL, model_path: str = "") -> Optional[str]:
        if model_path and not os.path.isfile(model_path):
            import urllib.request

            print(" > Downloading HuBERT base model")
            urllib.request.urlretrieve(download_url, model_path)
            return model_path
        return None

    @staticmethod
    def make_sure_tokenizer_installed(
        model: str = TOKENIZER_NAME, repo: str = TOKENIZER_REPO, model_path: str = ""
    ) -> Optional[str]:
        if model_path and not os.path.isfile(model_path):
            import huggingface_hub

            print(" > Downloading HuBERT custom tokenizer")
            model_dir = os.path.dirname(model_path)
            huggingface_hub.hf_hub_download(repo, model, local_dir=model_dir)
            got = os.path.join(model_dir, model)
            if got != model_path:
                shutil.move(got, model_path)
            return model_path
        return None


def build_hubert_tokenizer_torch(hidden_size=1024, input_size=768, output_size=10000, version=0):
    """The community HuBERT-feature→semantic-token quantizer: a 2-layer LSTM
    (+ optional 4096 intermediate in version 1) with a linear head
    (ref hubert/tokenizer.py:16). Built as a torch module so the released
    checkpoints load directly; returns the module class instance."""
    import torch
    from torch import nn

    class HubertTokenizer(nn.Module):
        def __init__(self):
            super().__init__()
            next_size = input_size
            if version in (0, 1):
                self.lstm = nn.LSTM(input_size, hidden_size, 2, batch_first=True)
                next_size = hidden_size
            if version == 1:
                self.intermediate = nn.Linear(hidden_size, 4096)
                next_size = 4096
            self.fc = nn.Linear(next_size, output_size)
            self.softmax = nn.LogSoftmax(dim=1)
            self.input_size = input_size
            self.hidden_size = hidden_size
            self.output_size = output_size
            self.version = version

        def forward(self, x):
            x, _ = self.lstm(x)
            if self.version == 1:
                x = self.intermediate(x)
            return self.softmax(self.fc(x))

        @torch.no_grad()
        def get_token(self, x):
            """[N, input_size] features → [N] semantic token ids."""
            return torch.argmax(self(x), dim=1)

    return HubertTokenizer()


def load_hubert_tokenizer(path: str, map_location=None):
    """Load a released quantizer checkpoint; model hyperparameters come from
    the `.info` json embedded in the checkpoint zip (ref tokenizer.py:105)."""
    import json
    from zipfile import ZipFile

    import torch

    kwargs = {}
    try:
        with ZipFile(path) as zf:
            infos = [n for n in zf.namelist() if n.endswith("/.info")]
            if infos:
                data = json.loads(zf.read(infos[0]).decode("utf-8"))
                kwargs = dict(
                    hidden_size=data["hidden_size"], input_size=data["input_size"],
                    output_size=data["output_size"], version=data["version"],
                )
    except Exception:
        pass
    model = build_hubert_tokenizer_torch(**kwargs)
    model.load_state_dict(torch.load(path, map_location=map_location, weights_only=False))
    model.eval()
    return model


class CustomHubert:
    """HuBERT base encoder features for the quantizer (ref kmeans_hubert.py:39):
    resample to 16 kHz, run `facebook/hubert-base-ls960`, take hidden layer 9."""

    def __init__(self, checkpoint_path: Optional[str] = None, target_sample_hz: int = 16000, output_layer: int = 9):
        from transformers import HubertModel

        self.target_sample_hz = target_sample_hz
        self.output_layer = output_layer
        source = checkpoint_path if checkpoint_path and os.path.isdir(checkpoint_path) else "facebook/hubert-base-ls960"
        self.model = HubertModel.from_pretrained(source)
        self.model.eval()

    def __call__(self, wav, input_sample_hz: Optional[int] = None):
        """wav `[T]` or `[1, T]` torch tensor → features `[N, 768]`."""
        import torch

        if wav.dim() == 1:
            wav = wav[None]
        if input_sample_hz is not None and input_sample_hz != self.target_sample_hz:
            wav = torch.from_numpy(_resample(wav.cpu().numpy(), input_sample_hz, self.target_sample_hz))
        with torch.no_grad():
            out = self.model(wav, output_hidden_states=True)
        return out.hidden_states[self.output_layer].reshape(-1, 768)


# ------------------------------------------------------------------- voices
def get_voices(extra_voice_dirs: List[str] = []) -> Dict[str, List[str]]:  # pylint: disable=dangerous-default-value
    """Map voice name → [prompt files] across voice dirs (ref
    inference_funcs.py:30): `.npz` prompt caches win, else audio files."""
    voices: Dict[str, List[str]] = {}
    for d in extra_voice_dirs:
        if not os.path.isdir(d):
            continue
        for sub in os.listdir(d):
            subj = os.path.join(d, sub)
            if os.path.isdir(subj):
                found = sorted(_glob.glob(f"{subj}/*.npz"))
                if not found:
                    found = sorted(_glob.glob(f"{subj}/*.wav")) + sorted(_glob.glob(f"{subj}/*.mp3"))
                voices[sub] = found
    return voices


def load_npz(npz_file: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    x = np.load(npz_file)
    return x["semantic_prompt"], x["coarse_prompt"], x["fine_prompt"]


def load_voice(model, voice: str, extra_voice_dirs: List[str] = []):  # pylint: disable=dangerous-default-value
    """Resolve a voice name to (semantic, coarse, fine) prompts; clones from a
    raw audio file on first use and caches the `.npz` next to it
    (ref inference_funcs.py:59)."""
    if voice == "random":
        return None, None, None
    voices = get_voices(extra_voice_dirs)
    try:
        paths = voices[voice]
    except KeyError as e:
        raise KeyError(f"Voice {voice} not found in {extra_voice_dirs}") from e
    if len(paths) > 1:
        raise ValueError(f"Voice {voice} has multiple paths: {paths}")
    if len(paths) == 1 and paths[0].endswith(".npz"):
        return load_npz(paths[0])
    audio_path = paths[0]
    output_path = os.path.splitext(audio_path)[0] + ".npz"
    generate_voice(audio=audio_path, model=model, output_path=output_path)
    return load_voice(model, voice, extra_voice_dirs)


def generate_voice(audio, model, output_path: str, hubert_model=None, hubert_tokenizer=None, codec_encoder=None):
    """Clone a voice: EnCodec-encode the audio into fine/coarse prompts and
    quantize HuBERT features into the semantic prompt; save as `.npz`
    (ref inference_funcs.py:105). The torch dependencies are injectable so
    deployments can supply local checkpoints (no-egress environments)."""
    import torch

    sample_rate = model.config.sample_rate
    if isinstance(audio, str):
        from tpu_tts.audio.numpy_transforms import load_wav as _load_wav

        data = _load_wav(filename=audio, sample_rate=sample_rate, resample=True)
        audio_t = torch.from_numpy(np.asarray(data, dtype=np.float32))[None]
        sr = sample_rate
    else:
        audio_t = torch.as_tensor(audio, dtype=torch.float32)
        if audio_t.dim() == 1:
            audio_t = audio_t[None]
        sr = sample_rate

    if sr != sample_rate:
        audio_t = torch.from_numpy(_resample(audio_t.cpu().numpy(), sr, sample_rate))
    if codec_encoder is None and getattr(model, "encodec", None) is not None and (
        model.params or {}
    ).get("encodec") is not None:
        # the model's own (JAX) EnCodec — ref uses model.encodec.encode at
        # 6 kbps = 8 codebooks (inference_funcs.py:124, load via bark.py:49)
        import jax.numpy as jnp

        from tpu_tts.layers.encodec import EncodecModel as _JaxEncodec

        n_fine = getattr(model, "N_FINE_CODEBOOKS", 8)
        wav = jnp.asarray(audio_t.cpu().numpy().reshape(1, -1, 1))
        codes = np.asarray(
            model.encodec.apply(
                {"params": model.params["encodec"]}, wav, n_q=n_fine,
                method=_JaxEncodec.encode,
            )
        )[0].T  # [n_q, T]
    else:
        if codec_encoder is None:
            from transformers import EncodecModel

            codec_encoder = EncodecModel.from_pretrained("facebook/encodec_24khz")
            codec_encoder.eval()
        with torch.no_grad():
            enc = codec_encoder.encode(audio_t[None])
        codes = enc.audio_codes if hasattr(enc, "audio_codes") else enc[0]
        codes = torch.cat([c for c in codes], dim=-1).squeeze().cpu().numpy()  # [n_q, T]

    paths = getattr(model.config, "LOCAL_MODEL_PATHS", {}) or {}
    if hubert_model is None:
        hubert_model = CustomHubert(checkpoint_path=paths.get("hubert"))
    if hubert_tokenizer is None:
        tok_path = paths.get("hubert_tokenizer", "")
        HubertManager.make_sure_tokenizer_installed(model_path=tok_path)
        hubert_tokenizer = load_hubert_tokenizer(tok_path)

    semantic_vectors = hubert_model(audio_t, input_sample_hz=sample_rate)
    semantic_tokens = hubert_tokenizer.get_token(semantic_vectors).cpu().numpy()

    np.savez(output_path, fine_prompt=codes, coarse_prompt=codes[:2, :], semantic_prompt=semantic_tokens)
    return output_path
