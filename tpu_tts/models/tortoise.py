"""Tortoise: multi-stage inference-only TTS (AR candidates → CLVP rerank →
diffusion mel decoder → UnivNet vocoder).

Weight-compatible TPU rebuild of /root/reference/TTS/tts/models/tortoise.py:
302 composing the exact reference stages: `UnifiedVoice`
(layers/tortoise/autoregressive.py:262 → tpu_tts.layers.tortoise_ar), `CLVP`
(clvp.py:20 → tortoise_clvp), `DiffusionTts` + spaced Gaussian diffusion
(diffusion_decoder.py:141, diffusion.py:176 → tortoise_diffusion), the
mindslab UnivNet (vocoder.py:277 → vocoder.models.univnet_generator in its
tortoise configuration), and the random-latent generators
(random_latent_generator.py:39).

TPU design: every AR candidate decodes in ONE batched `lax.scan` over a
static KV-cache (the reference loops HF `generate` per batch,
tortoise.py:721); top-p/temperature/repetition-penalty act on-device inside
the scan; the diffusion step function is jitted once and iterated over the
static spaced-timestep list.
"""

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.tortoise_ar import UnifiedVoice
from tpu_tts.layers.tortoise_arch import RandomLatentConverter
from tpu_tts.layers.tortoise_clvp import CLVP
from tpu_tts.layers.tortoise_diffusion import (
    DiffusionTts,
    SpacedDiffusion,
    denormalize_tacotron_mel,
    normalize_tacotron_mel,
)
from tpu_tts.models.base_tts import BaseTTSModel
from tpu_tts.vocoder.models.univnet_generator import UnivnetGenerator


@dataclass
class TortoiseArgs(Coqpit):
    """Mirrors ref TortoiseConfig/TortoiseArgs (tortoise.py:200-304) field
    groups: ar_* = UnifiedVoice, diff_* = DiffusionTts, clvp_* = CLVP,
    voc_* = UnivNet."""

    # UnifiedVoice (ref :267-279)
    ar_layers: int = 30
    ar_model_dim: int = 1024
    ar_heads: int = 16
    ar_max_text_tokens: int = 402
    ar_max_mel_tokens: int = 604
    ar_max_conditioning_inputs: int = 2
    ar_number_text_tokens: int = 255
    ar_start_text_token: int = 255
    ar_number_mel_codes: int = 8194
    ar_start_mel_token: int = 8192
    ar_stop_mel_token: int = 8193
    ar_mel_length_compression: int = 1024
    # DiffusionTts (ref :281-291)
    diff_model_channels: int = 1024
    diff_num_layers: int = 10
    diff_in_channels: int = 100
    diff_out_channels: int = 200
    diff_in_latent_channels: int = 1024
    diff_in_tokens: int = 8193
    diff_num_heads: int = 16
    # CLVP (ref :292-304)
    clvp_dim_text: int = 768
    clvp_dim_speech: int = 768
    clvp_dim_latent: int = 768
    clvp_num_text_tokens: int = 256
    clvp_text_enc_depth: int = 20
    clvp_text_heads: int = 12
    clvp_num_speech_tokens: int = 8192
    clvp_speech_enc_depth: int = 20
    clvp_speech_heads: int = 12
    # UnivNet (ref layers/tortoise/vocoder.py:284)
    voc_noise_dim: int = 64
    voc_channel_size: int = 32
    voc_strides: Tuple[int, ...] = (8, 8, 4)
    voc_n_mel_channels: int = 100
    # pipeline constants
    calm_token: int = 83  # ref tortoise.py:712
    pad_fill_token: int = 83  # ref fix_autoregressive_output :109
    tail_tokens: Tuple[int, ...] = (45, 45, 248)  # ref :113-115
    calm_patience: int = 8  # ref :790
    output_sample_rate: int = 24000
    duration_const: int = 102400  # ref :268 (diffusion cond clip samples)
    enable_redaction: bool = False
    # path to the released BPE vocab (ref utils/assets/tortoise/tokenizer.json)
    tokenizer_vocab_file: Optional[str] = None


class Tortoise(BaseTTSModel):
    """Inference-only (ref tortoise.py:910: train_step raises)."""

    def __init__(self, config, ap=None, tokenizer=None):
        super().__init__(config, ap, tokenizer)
        args = config.model_args
        if isinstance(args, dict) or args is None:
            args = TortoiseArgs.from_dict(args or {})
        self.args = args
        a = args
        self.autoregressive = UnifiedVoice(
            layers=a.ar_layers, model_dim=a.ar_model_dim, heads=a.ar_heads,
            max_text_tokens=a.ar_max_text_tokens, max_mel_tokens=a.ar_max_mel_tokens,
            max_conditioning_inputs=a.ar_max_conditioning_inputs,
            mel_length_compression=a.ar_mel_length_compression,
            number_text_tokens=a.ar_number_text_tokens, start_text_token=a.ar_start_text_token,
            number_mel_codes=a.ar_number_mel_codes, start_mel_token=a.ar_start_mel_token,
            stop_mel_token=a.ar_stop_mel_token,
        )
        self.diffusion = DiffusionTts(
            model_channels=a.diff_model_channels, num_layers=a.diff_num_layers,
            in_channels=a.diff_in_channels, in_latent_channels=a.diff_in_latent_channels,
            in_tokens=a.diff_in_tokens, out_channels=a.diff_out_channels,
            num_heads=a.diff_num_heads,
        )
        self.clvp = CLVP(
            dim_text=a.clvp_dim_text, dim_speech=a.clvp_dim_speech,
            dim_latent=a.clvp_dim_latent, num_text_tokens=a.clvp_num_text_tokens,
            text_enc_depth=a.clvp_text_enc_depth, text_heads=a.clvp_text_heads,
            num_speech_tokens=a.clvp_num_speech_tokens,
            speech_enc_depth=a.clvp_speech_enc_depth, speech_heads=a.clvp_speech_heads,
        )
        # tortoise UnivNet configuration (ref vocoder.py:277: slope 0.2,
        # reflect pads, per-block kpnet residuals, 100-mel conditioning)
        self.vocoder = UnivnetGenerator(
            in_channels=a.voc_noise_dim, hidden_channels=a.voc_channel_size,
            cond_channels=a.voc_n_mel_channels, upsample_factors=tuple(a.voc_strides),
            kpnet_lrelu_slope=0.2, kpnet_per_block_residual=True,
            post_lrelu_slope=0.2, pad_mode="reflect",
        )
        self.rlg_auto = RandomLatentConverter(a.ar_model_dim)
        self.rlg_diffusion = RandomLatentConverter(a.diff_model_channels * 2)
        if self.tokenizer is None and a.tokenizer_vocab_file:
            from tpu_tts.layers.tortoise_tokenizer import VoiceBpeTokenizer

            self.tokenizer = VoiceBpeTokenizer(vocab_file=a.tokenizer_vocab_file)
        self._aligner = None
        self.params: Optional[Dict] = None
        self._jit_cache: Dict = {}

    # ---------------------------------------------------------------- trainer
    def init_params(self, rng):
        a = self.args
        r = jax.random.split(rng, 6)
        text = jnp.zeros((1, 4), dtype=jnp.int32)
        codes = jnp.zeros((1, 6), dtype=jnp.int32)

        def uv_init(mdl, mel, text, codes):
            # touch every parameterized path (flax creates params lazily)
            cond = mdl.get_conditioning(mel)
            return mdl(cond, text, codes)

        def diff_init(mdl, cond_mel, latents, codes, x, ts):
            cond = mdl.get_conditioning(cond_mel)
            emb = mdl.timestep_independent(latents, cond, x.shape[1], is_latent=True)
            emb_c = mdl.timestep_independent(codes, cond, x.shape[1], is_latent=False)
            return mdl(x, ts, precomputed_aligned_embeddings=emb + 0.0 * emb_c)

        self.params = {
            "autoregressive": self.autoregressive.init(
                r[0], jnp.zeros((1, 8, 80)), text, codes, method=uv_init
            )["params"],
            "clvp": self.clvp.init(r[1], text, codes)["params"],
            "diffusion": self.diffusion.init(
                r[2], jnp.zeros((1, 12, a.diff_in_channels)),
                jnp.zeros((1, 4, a.diff_in_latent_channels)), codes,
                jnp.zeros((1, 8, a.diff_in_channels)), jnp.zeros((1,), dtype=jnp.int32),
                method=diff_init,
            )["params"],
            "vocoder": self.vocoder.init(
                {"params": r[3], "noise": r[4]}, jnp.zeros((1, 8, a.voc_n_mel_channels))
            )["params"],
            "rlg_auto": self.rlg_auto.init(r[5], jax.random.PRNGKey(0))["params"],
            "rlg_diffusion": self.rlg_diffusion.init(r[5], jax.random.PRNGKey(0))["params"],
        }
        return self.params

    def loss_fn(self, *args, **kwargs):
        raise NotImplementedError(" [!] Tortoise training is not supported (inference-only, as in the reference).")

    def _jit(self, key, build):
        if key not in self._jit_cache:
            self._jit_cache[key] = build()
        return self._jit_cache[key]

    # ------------------------------------------------------------ conditioning
    def get_conditioning_latents(self, voice_samples: List[np.ndarray],
                                 sample_rates: Optional[List[int]] = None):
        """wav clips (22.05 kHz) → (ar latent `[1, C]`, diffusion latent
        `[1, 2*C_diff]`) (ref tortoise.py:405; mels via TorchMelSpectrogram
        and wav_to_univnet_mel). `self.mel_norms` (per-bin divisors from the
        released mel_norms.pth) are applied to the AR mel when present."""
        from tpu_tts.audio.jax_transforms import torchaudio_mel

        a = self.args
        ar_mels = []
        diff_mels = []
        for wav in voice_samples:
            wav = np.asarray(wav, dtype=np.float32).reshape(1, -1)
            # ref format_conditioning :75: clip/pad to 132300 samples @22k
            clip = wav[:, :132300]
            if clip.shape[1] < 132300:
                clip = np.pad(clip, ((0, 0), (0, 132300 - clip.shape[1])))
            mel = torchaudio_mel(
                jnp.asarray(clip), fft_size=1024, hop_length=256, win_length=1024,
                sample_rate=22050, num_mels=80, fmin=0, fmax=8000, htk=True,
                mel_norms=getattr(self, "mel_norms", None),
            )
            ar_mels.append(mel)
            # diffusion conditioning: 24 kHz univnet mel over duration_const
            clip24 = wav[:, : a.duration_const]
            if clip24.shape[1] < a.duration_const:
                clip24 = np.pad(clip24, ((0, 0), (0, a.duration_const - clip24.shape[1])))
            dmel = torchaudio_mel(
                jnp.asarray(clip24), fft_size=1024, hop_length=256, win_length=1024,
                sample_rate=24000, num_mels=a.voc_n_mel_channels, fmin=0, fmax=12000,
                htk=False,
            )
            diff_mels.append(dmel)
        ar_stack = jnp.stack(ar_mels, axis=1)  # [1, n, T, 80]
        auto_latent = self.autoregressive.apply(
            {"params": self.params["autoregressive"]}, ar_stack,
            method=UnifiedVoice.get_conditioning,
        )
        diff_stack = jnp.stack(diff_mels, axis=1)  # [1, n, T, 100]
        diff_latent = self.diffusion.apply(
            {"params": self.params["diffusion"]}, diff_stack,
            method=DiffusionTts.get_conditioning,
        )
        return auto_latent, diff_latent

    def get_random_conditioning_latents(self, seed: int = 0):
        """ref tortoise.py:480 via the released RLG checkpoints."""
        auto = self.rlg_auto.apply(
            {"params": self.params["rlg_auto"]}, jax.random.PRNGKey(seed)
        )
        diff = self.rlg_diffusion.apply(
            {"params": self.params["rlg_diffusion"]}, jax.random.PRNGKey(seed + 1)
        )
        return auto, diff

    # ------------------------------------------------------------ AR sampling
    def _ar_sample(self, text_tokens: np.ndarray, auto_cond, num_samples: int,
                   max_mel_tokens: int, temperature: float, top_p: float,
                   repetition_penalty: float, seed: int):
        """All candidates in one batched scan (ref tortoise.py:721 loops HF
        generate per sub-batch). Returns codes `[num_samples, max_mel_tokens]`
        stop-padded."""
        a = self.args
        text = np.asarray(text_tokens, dtype=np.int32).reshape(1, -1)
        T_text = text.shape[1]
        stop = a.ar_stop_mel_token
        V = a.ar_number_mel_codes

        def build():
            model = self.autoregressive

            @jax.jit
            def run(params, text, cond, rng, temp, top_p, rep_pen):
                tt = jnp.repeat(text, num_samples, axis=0)
                cond = jnp.repeat(cond, num_samples, axis=0)
                B = num_samples
                T_max = (T_text + 3) + 1 + max_mel_tokens
                cache = model.init_cache(
                    B, T_max, dtype=jax.tree_util.tree_leaves(params)[0].dtype
                )
                cache, P, logits0 = model.apply(
                    {"params": params}, cond, tt, cache, method=UnifiedVoice.prefill
                )
                # HF generate penalizes over the whole input_ids: the fake
                # prompt is all 1s with a trailing start token
                seen0 = jnp.zeros((B, V), bool).at[:, 1].set(True).at[:, a.ar_start_mel_token].set(True)

                def pick(logits, seen, key):
                    pen = jnp.where(logits > 0, logits / rep_pen, logits * rep_pen)
                    logits = jnp.where(seen, pen, logits)
                    logits = logits / temp
                    # nucleus filter (HF TopPLogitsWarper semantics)
                    sort_idx = jnp.argsort(-logits, axis=-1)
                    sorted_l = jnp.take_along_axis(logits, sort_idx, axis=-1)
                    cum = jnp.cumsum(jax.nn.softmax(sorted_l, axis=-1), axis=-1)
                    remove = cum - jax.nn.softmax(sorted_l, axis=-1) > top_p
                    inv = jnp.argsort(sort_idx, axis=-1)
                    keep = jnp.take_along_axis(~remove, inv, axis=-1)
                    logits = jnp.where(keep, logits, -jnp.inf)
                    return jax.random.categorical(key, logits).astype(jnp.int32)

                def step(carry, i):
                    cache, logits, seen, done, key = carry
                    key, sub = jax.random.split(key)
                    nxt = pick(logits, seen, sub)
                    tok = jnp.where(done, stop, nxt)
                    done = done | (nxt == stop)
                    seen = seen.at[jnp.arange(B), tok].set(True)
                    logits_next, cache = model.apply(
                        {"params": params}, tok, jnp.full((B,), i + 1), cache, P + i,
                        method=UnifiedVoice.decode_step,
                    )
                    return (cache, logits_next, seen, done, key), tok

                (_, _, _, _, _), toks = jax.lax.scan(
                    step, (cache, logits0, seen0, jnp.zeros((B,), bool), rng),
                    jnp.arange(max_mel_tokens),
                )
                return jnp.swapaxes(toks, 0, 1)

            return run

        run = self._jit(("ar", T_text, num_samples, max_mel_tokens), build)
        return np.asarray(
            run(self.params["autoregressive"], jnp.asarray(text), auto_cond,
                jax.random.PRNGKey(seed), float(temperature), float(top_p),
                float(repetition_penalty))
        )

    def _fix_autoregressive_output(self, codes: np.ndarray) -> np.ndarray:
        """ref tortoise.py:89: strip the stop token, pad with the DVAE
        silence code, re-assert the learned tail codes."""
        a = self.args
        codes = codes.copy()
        stops = np.nonzero(codes == a.ar_stop_mel_token)[0]
        if len(stops) == 0:
            return codes
        codes[stops] = a.pad_fill_token
        stm = int(stops.min())
        codes[stm:] = a.pad_fill_token
        if stm - 3 < codes.shape[0]:
            tail = np.asarray(a.tail_tokens, dtype=codes.dtype)
            codes[-len(tail):] = tail
        return codes

    # ------------------------------------------------------------- inference
    def inference(
        self,
        text_tokens: np.ndarray,
        voice_samples: Optional[List[np.ndarray]] = None,
        conditioning_latents: Optional[Tuple] = None,
        num_autoregressive_samples: int = 4,
        max_mel_tokens: int = 96,
        temperature: float = 0.8,
        top_p: float = 0.8,
        repetition_penalty: float = 2.0,
        diffusion_iterations: int = 30,
        cond_free: bool = True,
        cond_free_k: float = 2.0,
        diffusion_temperature: float = 1.0,
        sampler: str = "ddim",
        correcting_x0_fn: Optional[str] = None,
        seed: int = 0,
        text: Optional[str] = None,
        k: int = 1,
    ) -> Dict:
        """Full pipeline (ref tortoise.py:598)."""
        a = self.args
        text_arr = np.asarray(text_tokens, dtype=np.int32).reshape(1, -1)
        # ref :673 pads one extra 0
        text_arr = np.pad(text_arr, ((0, 0), (0, 1)))

        if voice_samples is not None:
            auto_cond, diff_cond = self.get_conditioning_latents(voice_samples)
        elif conditioning_latents is not None:
            auto_cond, diff_cond = (jnp.asarray(c) for c in conditioning_latents)
        else:
            auto_cond, diff_cond = self.get_random_conditioning_latents(seed)

        codes = self._ar_sample(
            text_arr, auto_cond, num_autoregressive_samples, max_mel_tokens,
            temperature, top_p, repetition_penalty, seed,
        )
        fixed = np.stack([self._fix_autoregressive_output(c) for c in codes])

        scores = np.asarray(
            self.clvp.apply(
                {"params": self.params["clvp"]},
                jnp.asarray(np.repeat(text_arr, fixed.shape[0], axis=0)),
                jnp.asarray(np.minimum(fixed, a.clvp_num_speech_tokens - 1)),
            )
        )
        best_idx = np.argsort(-scores)[:k]
        best_codes = fixed[best_idx]

        # the diffusion conditioning wants the AR's last hidden states for
        # the winning codes (ref :758-773)
        latents = np.asarray(
            self.autoregressive.apply(
                {"params": self.params["autoregressive"]},
                jnp.repeat(auto_cond, len(best_idx), axis=0),
                jnp.asarray(np.repeat(text_arr, len(best_idx), axis=0)),
                jnp.asarray(best_codes), return_latent=True,
            )
        )

        diffuser = SpacedDiffusion(
            trained_steps=4000, desired_steps=diffusion_iterations,
            cond_free=cond_free, cond_free_k=cond_free_k, sampler=sampler,
            correcting_x0_fn=correcting_x0_fn,
        )

        wavs, mels = [], []
        rng = jax.random.PRNGKey(seed + 17)
        for b in range(len(best_idx)):
            lat, code_row = latents[b], best_codes[b]
            # trim trailing calm-token run (ref :783-792)
            ctokens = 0
            for t in range(code_row.shape[-1]):
                ctokens = ctokens + 1 if code_row[t] == a.calm_token else 0
                if ctokens > a.calm_patience:
                    lat = lat[:t]
                    break
            mel, wav, rng = self._diffuse_and_vocode(
                lat[None], diff_cond, diffuser, diffusion_temperature, rng
            )
            mels.append(mel)
            wavs.append(wav)
            if a.enable_redaction and text is not None:
                wavs[-1] = self.aligner.redact(wavs[-1], text, a.output_sample_rate)

        return {
            "wav": wavs[0] if k == 1 else wavs,
            "model_outputs": mels[0],
            "clvp_scores": scores,
            "best_candidate": int(best_idx[0]),
            "gpt_codes": fixed,
            "deterministic_seed": seed,
        }

    def _diffuse_and_vocode(self, latents, diff_cond, diffuser, diffusion_temperature, rng):
        """ref do_spectrogram_diffusion (:119) + vocoder.inference (:802)."""
        a = self.args
        T_lat = latents.shape[1]
        output_seq_len = T_lat * 4 * 24000 // 22050  # ref :131
        emb = self.diffusion.apply(
            {"params": self.params["diffusion"]}, jnp.asarray(latents), diff_cond,
            output_seq_len, method=DiffusionTts.timestep_independent,
        )

        def build():
            @jax.jit
            def denoise(params, x, ts, emb):
                return self.diffusion.apply(
                    {"params": params}, x, ts, precomputed_aligned_embeddings=emb
                )

            @jax.jit
            def denoise_free(params, x, ts):
                return self.diffusion.apply(
                    {"params": params}, x, ts, conditioning_free=True
                )

            return denoise, denoise_free

        denoise, denoise_free = self._jit(("diff_step", output_seq_len), build)

        def model_fn(x, ts, conditioning_free):
            if conditioning_free:
                return denoise_free(self.params["diffusion"], x, ts)
            return denoise(self.params["diffusion"], x, ts, emb)

        rng, sub1, sub2 = jax.random.split(rng, 3)
        noise = jax.random.normal(sub1, (1, output_seq_len, a.diff_in_channels)) * diffusion_temperature
        mel_norm = diffuser.sample_loop(model_fn, noise, sub2)
        mel = denormalize_tacotron_mel(mel_norm)[:, :output_seq_len]
        wav = self.vocoder.apply(
            {"params": self.params["vocoder"]}, mel, rngs={"noise": sub2}
        )
        return np.asarray(mel), np.asarray(wav)[0, :, 0], rng

    # ------------------------------------------------------------- interface
    def synthesize(self, text: str, config, speaker_id: str = "random",
                   voice_dirs=None, **kwargs):
        """ref tortoise.py:500: resolve the voice then run inference."""
        from tpu_tts.layers.tortoise_voices import load_voice

        kwargs.pop("speaker_wav", None)
        kwargs.pop("language", None)

        tokens = self._text_to_tokens(text)
        voice_samples, conditioning_latents = None, None
        if speaker_id not in (None, "random"):
            voice_samples, conditioning_latents = load_voice(
                speaker_id, voice_dirs if isinstance(voice_dirs, list) else [voice_dirs] if voice_dirs else []
            )
        out = self.inference(
            tokens, voice_samples=voice_samples,
            conditioning_latents=conditioning_latents, text=text, **kwargs,
        )
        return {"wav": out["wav"], "deterministic_seed": out["deterministic_seed"],
                "text_inputs": text}

    def _text_to_tokens(self, text: str) -> np.ndarray:
        """VoiceBpeTokenizer (ref layers/tortoise/tokenizer.py:13) when a
        BPE vocab is attached, else byte ids clamped to the text vocab."""
        if self.tokenizer is not None and hasattr(self.tokenizer, "encode"):
            return np.asarray(self.tokenizer.encode(text), dtype=np.int32)
        ids = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.int32)
        return np.minimum(ids, self.args.ar_number_text_tokens - 1)

    @property
    def aligner(self):
        """Lazy wav2vec2 aligner for redaction (ref tortoise.py:336)."""
        if self._aligner is None:
            from tpu_tts.layers.tortoise_align import Wav2VecAlignment

            self._aligner = Wav2VecAlignment()
        return self._aligner

    # ------------------------------------------------------------ checkpoint
    def load_checkpoint(
        self,
        config,
        checkpoint_dir,
        ar_checkpoint=None,
        clvp_checkpoint=None,
        diff_checkpoint=None,
        vocoder_checkpoint=None,
        eval=True,
        strict=True,
        **kwargs,
    ):
        """Ingest the released tortoise directory (ref tortoise.py:832-905:
        autoregressive.pth / clvp2.pth / diffusion_decoder.pth / vocoder.pth
        / rlg_auto.pth / rlg_diffuser.pth)."""
        from tpu_tts.models.tortoise_convert import (
            convert_clvp_state_dict,
            convert_diffusion_state_dict,
            convert_rlg_state_dict,
            convert_tortoise_vocoder_state_dict,
            convert_unified_voice_state_dict,
        )
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        d = str(checkpoint_dir)

        def sd_of(path):
            ckpt = load_torch_checkpoint(path)
            return ckpt.get("torch_state_dict") or {
                k: v for k, v in ckpt.items() if hasattr(v, "shape") or isinstance(v, dict)
            }

        params = dict(self.params or {})
        pairs = (
            ("autoregressive", ar_checkpoint or os.path.join(d, "autoregressive.pth"),
             convert_unified_voice_state_dict),
            ("clvp", clvp_checkpoint or os.path.join(d, "clvp2.pth"), convert_clvp_state_dict),
            ("diffusion", diff_checkpoint or os.path.join(d, "diffusion_decoder.pth"),
             convert_diffusion_state_dict),
            ("vocoder", vocoder_checkpoint or os.path.join(d, "vocoder.pth"),
             convert_tortoise_vocoder_state_dict),
            ("rlg_auto", os.path.join(d, "rlg_auto.pth"), convert_rlg_state_dict),
            ("rlg_diffusion", os.path.join(d, "rlg_diffuser.pth"), convert_rlg_state_dict),
        )
        for name, path, conv in pairs:
            if os.path.exists(path):
                params[name] = conv(sd_of(path))
        self.params = params
        self._jit_cache = {}
        return params

    @staticmethod
    def init_from_config(config, samples=None):
        return Tortoise(config)


def classify_audio_clip(clip: np.ndarray, model_dir: str) -> float:
    """Probability the clip was generated by Tortoise (ref tortoise.py:150:
    AudioMiniEncoderWithClassifierHead over the raw waveform, classifier.pth)."""
    from tpu_tts.layers.tortoise_classifier import AudioMiniEncoderWithClassifierHead
    from tpu_tts.models.tortoise_convert import convert_classifier_state_dict
    from tpu_tts.train.torch_convert import load_torch_checkpoint

    model = AudioMiniEncoderWithClassifierHead(
        classes=2, spec_dim=1, embedding_dim=512, depth=5, downsample_factor=4,
        resnet_blocks=2, attn_blocks=4, num_attn_heads=4, base_channels=32,
        kernel_size=5,
    )
    ckpt = load_torch_checkpoint(os.path.join(str(model_dir), "classifier.pth"))
    sd = ckpt.get("torch_state_dict") or ckpt
    params = {"params": convert_classifier_state_dict(sd)}
    x = jnp.asarray(np.asarray(clip, dtype=np.float32).reshape(1, -1, 1))
    logits = model.apply(params, x)
    return float(jax.nn.softmax(logits, axis=-1)[0, 0])
