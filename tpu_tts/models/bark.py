"""Bark: cascade GPT TTS (text → semantic → coarse → fine codec → waveform).

Weight-compatible TPU-native rebuild of /root/reference/TTS/tts/models/
bark.py:30 and layers/bark/inference_funcs.py:152 (`generate_text_semantic`),
:313 (`generate_coarse` sliding-window), :483 (`generate_fine`), :600
(`codec_decode`). The three GPT stages carry the exact suno checkpoint layout
(`tpu_tts.layers.bark_gpt`), the waveform stage is a full EnCodec
re-implementation (`tpu_tts.layers.encodec`) instead of the external
`encodec` dependency.

TPU design: each stage's sampled decode is a single `lax.scan` over a static
KV-cache (the reference re-runs a growing-context torch loop per token); the
coarse stage's variable-length prompt is right-padded to one fixed bucket
with masked attention so every sliding window hits one compiled program; all
top-k/top-p filtering happens on device inside the scan.
"""

import os
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_tts.config.base import Coqpit
from tpu_tts.layers.bark_gpt import BarkFineGPT, BarkGPT
from tpu_tts.layers.encodec import EncodecModel
from tpu_tts.models.base_tts import BaseTTSModel


@dataclass
class BarkGPTArgs(Coqpit):
    """Mirrors ref layers/bark/model.py:135 `GPTConfig` (values below are the
    suno text-stage release; per-checkpoint `model_args` override on load)."""

    block_size: int = 1024
    input_vocab_size: int = 129600
    output_vocab_size: int = 129600
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    dropout: float = 0.0
    bias: bool = True


@dataclass
class BarkFineGPTArgs(BarkGPTArgs):
    """Mirrors ref model_fine.py:139 `FineGPTConfig`."""

    input_vocab_size: int = 1056
    output_vocab_size: int = 1056
    n_codes_total: int = 8
    n_codes_given: int = 1


@dataclass
class BarkEncodecArgs(Coqpit):
    """EnCodec 24 kHz shape (the fixed external codec in the reference)."""

    hidden_size: int = 128
    num_filters: int = 32
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    num_quantizers: int = 32
    codebook_size: int = 1024
    num_residual_layers: int = 1
    num_lstm_layers: int = 2
    sample_rate: int = 24000


def _coarse_default():
    return BarkGPTArgs(input_vocab_size=12096, output_vocab_size=12096)


@dataclass
class BarkArgs(Coqpit):
    num_chars: int = 0
    semantic_config: BarkGPTArgs = field(default_factory=BarkGPTArgs)
    coarse_config: BarkGPTArgs = field(default_factory=_coarse_default)
    fine_config: BarkFineGPTArgs = field(default_factory=BarkFineGPTArgs)
    encodec_config: BarkEncodecArgs = field(default_factory=BarkEncodecArgs)


def _cfg_get(config, name, default):
    v = getattr(config, name, None)
    return default if v is None else v


class Bark(BaseTTSModel):
    """Inference-only cascade (ref bark.py:63: train_step raises)."""

    def __init__(self, config, ap=None, tokenizer=None):
        super().__init__(config, ap, tokenizer)
        args = config.model_args if getattr(config, "model_args", None) is not None else BarkArgs()
        if isinstance(args, dict):
            args = BarkArgs.from_dict(args)
        for f in ("semantic_config", "coarse_config", "fine_config", "encodec_config"):
            sub = getattr(args, f)
            if isinstance(sub, dict):
                cls = {"fine_config": BarkFineGPTArgs, "encodec_config": BarkEncodecArgs}.get(
                    f, BarkGPTArgs
                )
                setattr(args, f, cls.from_dict(sub))
        self.args = args
        self._build_modules()
        self.params: Optional[Dict] = None
        self._jit_cache: Dict = {}

    def _build_modules(self):
        a = self.args

        def gpt(c):
            return BarkGPT(
                input_vocab_size=c.input_vocab_size, output_vocab_size=c.output_vocab_size,
                n_layer=c.n_layer, n_head=c.n_head, n_embd=c.n_embd,
                block_size=c.block_size, bias=c.bias,
                merge_context_width=self.TEXT_CONTEXT,
            )

        self.semantic_model = gpt(a.semantic_config)
        self.coarse_model = gpt(a.coarse_config)
        f = a.fine_config
        self.fine_model = BarkFineGPT(
            input_vocab_size=f.input_vocab_size, output_vocab_size=f.output_vocab_size,
            n_layer=f.n_layer, n_head=f.n_head, n_embd=f.n_embd,
            n_codes_total=f.n_codes_total, n_codes_given=f.n_codes_given,
            block_size=f.block_size, bias=f.bias,
        )
        e = a.encodec_config
        self.encodec = EncodecModel(
            hidden_size=e.hidden_size, num_filters=e.num_filters,
            upsampling_ratios=tuple(e.upsampling_ratios), num_quantizers=e.num_quantizers,
            codebook_size=e.codebook_size, num_residual_layers=e.num_residual_layers,
            num_lstm_layers=e.num_lstm_layers, sample_rate=e.sample_rate,
        )

    # ----------------------------------------------------- reference constants
    # (ref configs/bark_config.py:55-70; overridable through the config for
    # scaled-down tests)
    @property
    def CONTEXT_WINDOW_SIZE(self):
        return _cfg_get(self.config, "CONTEXT_WINDOW_SIZE", 1024)

    @property
    def SEMANTIC_RATE_HZ(self):
        return _cfg_get(self.config, "SEMANTIC_RATE_HZ", 49.9)

    @property
    def SEMANTIC_VOCAB_SIZE(self):
        return _cfg_get(self.config, "SEMANTIC_VOCAB_SIZE", 10_000)

    @property
    def CODEBOOK_SIZE(self):
        return _cfg_get(self.config, "CODEBOOK_SIZE", 1024)

    @property
    def N_COARSE_CODEBOOKS(self):
        return _cfg_get(self.config, "N_COARSE_CODEBOOKS", 2)

    @property
    def N_FINE_CODEBOOKS(self):
        return _cfg_get(self.config, "N_FINE_CODEBOOKS", 8)

    @property
    def COARSE_RATE_HZ(self):
        return _cfg_get(self.config, "COARSE_RATE_HZ", 75)

    @property
    def SAMPLE_RATE(self):
        return _cfg_get(self.config, "SAMPLE_RATE", 24_000)

    @property
    def TEXT_ENCODING_OFFSET(self):
        return _cfg_get(self.config, "TEXT_ENCODING_OFFSET", 10_048)

    @property
    def SEMANTIC_PAD_TOKEN(self):
        return _cfg_get(self.config, "SEMANTIC_PAD_TOKEN", 10_000)

    @property
    def TEXT_PAD_TOKEN(self):
        return _cfg_get(self.config, "TEXT_PAD_TOKEN", 129_595)

    @property
    def SEMANTIC_INFER_TOKEN(self):
        return _cfg_get(self.config, "SEMANTIC_INFER_TOKEN", 129_599)

    @property
    def COARSE_SEMANTIC_PAD_TOKEN(self):
        return _cfg_get(self.config, "COARSE_SEMANTIC_PAD_TOKEN", 12_048)

    @property
    def COARSE_INFER_TOKEN(self):
        return _cfg_get(self.config, "COARSE_INFER_TOKEN", 12_050)

    @property
    def TEXT_CONTEXT(self):
        """Width of each merged context block (256 text + 256 history)."""
        return _cfg_get(self.config, "TEXT_CONTEXT", 256)

    @property
    def SEMANTIC_STEPS(self):
        """Max generated semantic tokens (ref inference_funcs.py:236)."""
        return _cfg_get(self.config, "SEMANTIC_STEPS", 768)

    # -------------------------------------------------------------- trainer
    def init_params(self, rng):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        toks = jnp.zeros((1, 4), dtype=jnp.int32)
        self.params = {
            "semantic": self.semantic_model.init(r1, toks)["params"],
            "coarse": self.coarse_model.init(r2, toks)["params"],
            "fine": self.fine_model.init(
                r3, self.args.fine_config.n_codes_total - 1,
                jnp.zeros((1, 4, self.args.fine_config.n_codes_total), dtype=jnp.int32),
            )["params"],
            "encodec": self.encodec.init(
                r4, jnp.zeros((1, 8, 1)), method=EncodecModel.__call__
            )["params"],
        }
        return self.params

    def loss_fn(self, *args, **kwargs):
        raise NotImplementedError(" [!] Bark training is not supported (inference-only, as in the reference).")

    # ---------------------------------------------------------- stage 1: text
    def _jit(self, key, build):
        if key not in self._jit_cache:
            self._jit_cache[key] = build()
        return self._jit_cache[key]

    def text_to_semantic(
        self,
        text_tokens: np.ndarray,
        history_prompt=None,
        temp: float = 0.7,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        min_eos_p: float = 0.2,
        max_gen_duration_s: Optional[float] = None,
        allow_early_stop: bool = True,
        seed: int = 0,
    ) -> np.ndarray:
        """Text ids (already +TEXT_ENCODING_OFFSET) → semantic tokens.

        Prompt layout (ref inference_funcs.py:206-232): [text padded to W
        with TEXT_PAD | semantic history padded to W with SEMANTIC_PAD |
        SEMANTIC_INFER]; the two W-blocks share positions via merged
        embeddings.
        """
        W = self.TEXT_CONTEXT
        enc = np.asarray(text_tokens, dtype=np.int64).reshape(-1)[:W]
        enc = np.pad(enc, (0, W - len(enc)), constant_values=self.TEXT_PAD_TOKEN)
        sem_hist = None if history_prompt is None else history_prompt[0]
        if sem_hist is not None:
            h = np.asarray(sem_hist, dtype=np.int64)[-W:]
            h = np.pad(h, (0, W - len(h)), constant_values=self.SEMANTIC_PAD_TOKEN)
        else:
            h = np.full((W,), self.SEMANTIC_PAD_TOKEN, dtype=np.int64)
        x = np.hstack([enc, h, [self.SEMANTIC_INFER_TOKEN]]).astype(np.int32)[None]

        n_steps = self.SEMANTIC_STEPS
        V = self.SEMANTIC_VOCAB_SIZE
        eos_src = self.SEMANTIC_PAD_TOKEN  # logit reused as EOS (ref :245)
        rate = self.SEMANTIC_RATE_HZ
        max_dur = -1.0 if max_gen_duration_s is None else float(max_gen_duration_s)

        def build():
            model = self.semantic_model

            @jax.jit
            def run(params, prompt, rng, temp, top_k, top_p, min_eos, max_dur):
                B = prompt.shape[0]
                prompt_emb_len = prompt.shape[1] - W  # merged contexts share rows
                T_max = prompt_emb_len + n_steps
                cache = model.init_cache(
                    B, T_max, dtype=jax.tree_util.tree_leaves(params)[0].dtype
                )
                bind = model.bind({"params": params})
                cache, hidden = bind.prefill(prompt, cache, merge_context=True)
                logits0 = bind.logits_at(hidden[:, -1])

                def pick(logits, key):
                    rel = jnp.concatenate(
                        [logits[:, :V], logits[:, eos_src : eos_src + 1]], axis=-1
                    )
                    rel = _filter_top_p(rel, top_p)
                    rel = _filter_top_k(rel, top_k)
                    probs = jax.nn.softmax(rel / temp, axis=-1)
                    nxt = jax.random.categorical(key, jnp.log(probs + 1e-20), axis=-1)
                    return nxt.astype(jnp.int32), probs[:, -1]

                def step(carry, i):
                    cache, logits, done, key = carry
                    key, sub = jax.random.split(key)
                    nxt, p_eos = pick(logits, sub)
                    stop_now = allow_early_stop & ((nxt == V) | ((min_eos > 0) & (p_eos >= min_eos)))
                    valid = ~done & ~stop_now
                    done = done | stop_now
                    # duration cap applies after appending (ref :278-280)
                    done = done | ((max_dur > 0) & ((i + 1.0) / rate > max_dur))
                    tok = jnp.where(valid, nxt, 0)
                    logits_next, cache = bind.decode_step(
                        tok, jnp.full((B,), prompt_emb_len + i), cache, prompt_emb_len + i
                    )
                    return (cache, logits_next, done, key), (tok, valid)

                (_, _, _, _), (toks, valid) = jax.lax.scan(
                    step,
                    (cache, logits0, jnp.zeros((B,), bool), rng),
                    jnp.arange(n_steps),
                )
                return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(valid, 0, 1)

            return run

        run = self._jit(("semantic", x.shape), build)
        toks, valid = run(
            self.params["semantic"], jnp.asarray(x), jax.random.PRNGKey(seed),
            float(temp), -1 if top_k is None else int(top_k),
            -1.0 if top_p is None else float(top_p), float(min_eos_p), max_dur,
        )
        toks, valid = np.asarray(toks)[0], np.asarray(valid)[0]
        n = int(valid.sum())
        out = toks[:n]
        assert (out >= 0).all() and (out < V).all()
        return out

    # -------------------------------------------------------- stage 2: coarse
    def semantic_to_coarse(
        self,
        x_semantic: np.ndarray,
        history_prompt=None,
        temp: float = 0.7,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        max_coarse_history: int = 630,
        sliding_window_len: int = 60,
        seed: int = 0,
    ) -> np.ndarray:
        """Semantic tokens → coarse codes `[N_COARSE, T]` via the reference's
        sliding-window decode (inference_funcs.py:313-480)."""
        V = self.SEMANTIC_VOCAB_SIZE
        CB = self.CODEBOOK_SIZE
        NC = self.N_COARSE_CODEBOOKS
        W = self.TEXT_CONTEXT
        ratio = self.COARSE_RATE_HZ / self.SEMANTIC_RATE_HZ * NC
        max_sem_hist = int(np.floor(max_coarse_history / ratio))

        x_semantic = np.asarray(x_semantic, dtype=np.int32).reshape(-1)
        if history_prompt is not None and all(v is not None for v in history_prompt[:2]):
            sem_hist = np.asarray(history_prompt[0], dtype=np.int32).reshape(-1)
            coarse_hist = np.asarray(history_prompt[1], dtype=np.int32)
            flat = coarse_hist.copy()
            for n in range(1, flat.shape[0]):
                flat[n] += CB * n
            flat = flat.ravel("F") + V
            n_sem = min(
                max_sem_hist,
                len(sem_hist) - len(sem_hist) % 2,
                int(np.floor(len(flat) / ratio)),
            )
            n_coarse = int(round(n_sem * ratio))
            sem_hist = sem_hist[-n_sem:] if n_sem else sem_hist[:0]
            flat = flat[-n_coarse:] if n_coarse else flat[:0]
            flat = flat[:-2]  # time-alignment hack (ref :392)
        else:
            sem_hist = np.array([], dtype=np.int32)
            flat = np.array([], dtype=np.int32)

        n_steps = int(round(np.floor(len(x_semantic) * ratio / NC) * NC))
        assert n_steps > 0 and n_steps % NC == 0, "no coarse steps to generate"
        x_sem_all = np.hstack([sem_hist, x_semantic]).astype(np.int32)
        x_coarse = flat.astype(np.int32)
        base_sem_idx = len(sem_hist)

        P_max = W + 1 + max_coarse_history

        def build():
            model = self.coarse_model

            @jax.jit
            def run(params, prompt, true_len, first_parity, rng, temp, top_k, top_p):
                B = prompt.shape[0]
                T_max = P_max + sliding_window_len
                cache = model.init_cache(
                    B, T_max, dtype=jax.tree_util.tree_leaves(params)[0].dtype
                )
                bind = model.bind({"params": params})
                rows = jnp.arange(T_max)[None]
                key_valid = rows < true_len
                cache, hidden = bind.prefill(prompt, cache, key_valid=key_valid)
                idx_last = true_len - 1
                logits0 = bind.logits_at(
                    jnp.take_along_axis(hidden, idx_last[:, None, None].repeat(hidden.shape[-1], -1), 1)[:, 0]
                )

                def step(carry, i):
                    cache, key_valid, logits, key = carry
                    key, sub = jax.random.split(key)
                    is_major = ((first_parity + i) % NC) == 0
                    start = V + jnp.where(is_major, 0, CB)
                    rel = jax.lax.dynamic_slice_in_dim(logits, start, CB, axis=-1)
                    rel = _filter_top_p(rel, top_p)
                    rel = _filter_top_k(rel, top_k)
                    probs = jax.nn.softmax(rel / temp, axis=-1)
                    nxt = jax.random.categorical(key=sub, logits=jnp.log(probs + 1e-20)).astype(jnp.int32)
                    tok = nxt + start
                    write_idx = P_max + i
                    key_valid = key_valid.at[:, write_idx].set(True)
                    logits_next, cache = bind.decode_step(
                        tok, true_len + i, cache, write_idx, key_valid=key_valid
                    )
                    return (cache, key_valid, logits_next, key), tok

                (_, _, _, _), toks = jax.lax.scan(
                    step,
                    (cache, key_valid, logits0, rng),
                    jnp.arange(sliding_window_len),
                )
                return jnp.swapaxes(toks, 0, 1)

            return run

        run = self._jit(("coarse", P_max, sliding_window_len), build)
        rng = jax.random.PRNGKey(seed)
        n_windows = int(np.ceil(n_steps / sliding_window_len))
        n_step = 0
        for w in range(n_windows):
            sem_idx = base_sem_idx + int(round(n_step / ratio))
            window = x_sem_all[max(0, sem_idx - max_sem_hist):][:W]
            x_in = np.full((P_max,), self.COARSE_SEMANTIC_PAD_TOKEN, dtype=np.int32)
            x_in[: len(window)] = window
            x_in[len(window):W] = self.COARSE_SEMANTIC_PAD_TOKEN
            x_in[W] = self.COARSE_INFER_TOKEN
            hist = x_coarse[-max_coarse_history:]
            x_in[W + 1 : W + 1 + len(hist)] = hist
            true_len = W + 1 + len(hist)
            rng, sub = jax.random.split(rng)
            toks = np.asarray(
                run(
                    self.params["coarse"], jnp.asarray(x_in)[None],
                    jnp.asarray([true_len], dtype=jnp.int32), int(n_step % NC), sub,
                    float(temp), -1 if top_k is None else int(top_k),
                    -1.0 if top_p is None else float(top_p),
                )
            )[0]
            take = min(sliding_window_len, n_steps - n_step)
            x_coarse = np.hstack([x_coarse, toks[:take]])
            n_step += take
        gen = x_coarse[len(flat):]
        assert len(gen) == n_steps
        arr = gen.reshape(-1, NC).T - V
        for n in range(1, NC):
            arr[n, :] -= n * CB
        return arr

    # ---------------------------------------------------------- stage 3: fine
    def coarse_to_fine(
        self,
        x_coarse_gen: np.ndarray,
        history_prompt=None,
        temp: Optional[float] = 0.5,
        seed: int = 0,
    ) -> np.ndarray:
        """Coarse codes `[n_coarse, T]` → all-codebook codes
        `[N_FINE, T]` (ref inference_funcs.py:483-597)."""
        CB = self.CODEBOOK_SIZE
        NF = self.N_FINE_CODEBOOKS
        CTX = min(self.fine_model.block_size, self.CONTEXT_WINDOW_SIZE)
        half = CTX // 2
        x_coarse_gen = np.asarray(x_coarse_gen, dtype=np.int32)
        n_coarse = x_coarse_gen.shape[0]
        fine_hist = None if history_prompt is None else history_prompt[2]
        in_arr = np.vstack(
            [x_coarse_gen, np.full((NF - n_coarse, x_coarse_gen.shape[1]), CB, dtype=np.int32)]
        )
        if fine_hist is not None:
            fh = np.asarray(fine_hist, dtype=np.int32)[:, -half:]
            in_arr = np.hstack([fh, in_arr])
            n_history = fh.shape[1]
        else:
            n_history = 0
        n_remove = 0
        if in_arr.shape[1] < CTX:
            n_remove = CTX - in_arr.shape[1]
            in_arr = np.hstack([in_arr, np.full((NF, n_remove), CB, dtype=np.int32)])
        n_loops = max(0, int(np.ceil((x_coarse_gen.shape[1] - (CTX - n_history)) / half))) + 1
        in_arr = in_arr.T  # [T, NF]

        def build():
            model = self.fine_model

            def one(pred_idx):
                @jax.jit
                def run(params, buf, rng, temp, rel_start):
                    logits = model.apply({"params": params}, pred_idx, buf)[0, :, :CB]
                    greedy = jnp.argmax(logits, axis=-1)
                    keys = jax.random.split(rng, logits.shape[0])
                    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, logits / jnp.maximum(temp, 1e-6))
                    pred = jnp.where(temp > 0, sampled, greedy).astype(jnp.int32)
                    pos = jnp.arange(logits.shape[0])
                    return jnp.where(pos >= rel_start, pred, buf[0, :, pred_idx])

                return run

            return {nn_: one(nn_) for nn_ in range(1, NF)}

        runs = self._jit(("fine", CTX), build)
        rng = jax.random.PRNGKey(seed)
        for n in range(n_loops):
            start_idx = min(n * half, in_arr.shape[0] - CTX)
            start_fill_idx = min(n_history + n * half, in_arr.shape[0] - half)
            rel_start = start_fill_idx - start_idx
            buf = in_arr[start_idx : start_idx + CTX][None].copy()
            for nn_ in range(n_coarse, NF):
                rng, sub = jax.random.split(rng)
                filled = np.asarray(
                    runs[nn_](
                        self.params["fine"], jnp.asarray(buf), sub,
                        -1.0 if temp is None else float(temp), rel_start,
                    )
                )
                buf[0, :, nn_] = filled
                in_arr[start_fill_idx : start_fill_idx + (CTX - rel_start), nn_] = filled[rel_start:]
        fine = in_arr.T[:, n_history:]
        if n_remove > 0:
            fine = fine[:, :-n_remove]
        assert fine.shape[-1] == x_coarse_gen.shape[-1]
        return fine

    # --------------------------------------------------------------- stage 4
    def codec_decode(self, fine_tokens: np.ndarray) -> np.ndarray:
        """codes `[N_FINE, T]` → waveform (ref inference_funcs.py:600)."""

        def build():
            @jax.jit
            def run(params, codes):
                return self.encodec.apply(
                    {"params": params}, codes, method=EncodecModel.decode
                )

            return run

        run = self._jit(("codec",), build)
        codes = jnp.asarray(np.asarray(fine_tokens, dtype=np.int32).T)[None]
        wav = run(self.params["encodec"], codes)
        return np.asarray(wav)[0, :, 0]

    # ------------------------------------------------------------ full chain
    def semantic_to_waveform(self, semantic_tokens, history_prompt=None, temp=0.7, seed=0, **kwargs):
        coarse = self.semantic_to_coarse(
            semantic_tokens, history_prompt=history_prompt, temp=temp, seed=seed,
            **{k: v for k, v in kwargs.items() if k in ("top_k", "top_p", "max_coarse_history", "sliding_window_len")},
        )
        fine = self.coarse_to_fine(
            coarse, history_prompt=history_prompt, temp=kwargs.get("fine_temp", 0.5), seed=seed + 1
        )
        return self.codec_decode(fine), coarse, fine

    def generate_audio(
        self,
        text_tokens: np.ndarray,
        history_prompt=None,
        text_temp: float = 0.7,
        waveform_temp: float = 0.7,
        seed: int = 0,
        **kwargs,
    ):
        """Full cascade (ref bark.py:132-165). `history_prompt` is the cloned
        voice `(semantic, coarse, fine)` tuple (inference_funcs.py:51 npz
        layout)."""
        hp = history_prompt if history_prompt is not None else (None, None, None)
        semantic = self.text_to_semantic(
            text_tokens, history_prompt=hp, temp=text_temp, seed=seed,
            **{k: v for k, v in kwargs.items()
               if k in ("top_k", "top_p", "min_eos_p", "max_gen_duration_s", "allow_early_stop")},
        )
        wav, coarse, fine = self.semantic_to_waveform(
            semantic, history_prompt=hp, temp=waveform_temp, seed=seed + 1,
            **{k: v for k, v in kwargs.items()
               if k in ("top_k", "top_p", "max_coarse_history", "sliding_window_len", "fine_temp")},
        )
        return wav, semantic, fine.T

    # ------------------------------------------------------------- synthesize
    def _text_to_tokens(self, text: str) -> np.ndarray:
        """BERT-tokenize + offset into the bark text id region (ref
        inference_funcs.py:206). Falls back to byte ids when the HF
        tokenizer isn't available."""
        if self.tokenizer is not None and hasattr(self.tokenizer, "encode"):
            ids = np.asarray(self.tokenizer.encode(text), dtype=np.int64)
        else:
            try:
                from transformers import BertTokenizer

                # local_files_only: never stall on network lookups (the cache
                # either has the vocab or the byte fallback kicks in)
                tok = BertTokenizer.from_pretrained(
                    "bert-base-multilingual-cased", local_files_only=True
                )
                ids = np.asarray(tok.encode(text, add_special_tokens=False), dtype=np.int64)
            except Exception:
                ids = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
        return (ids + self.TEXT_ENCODING_OFFSET).astype(np.int32)

    def synthesize(self, text: str, config, speaker_id: str = "random", voice_dirs=None, **kwargs):
        """Reference `Bark.synthesize` surface (ref bark.py:197): resolve the
        voice (cloning + caching on first use), run the cascade."""
        from tpu_tts.layers.bark_voice_clone import load_voice

        kwargs.pop("speaker_wav", None)
        kwargs.pop("language", None)

        speaker_id = "random" if speaker_id is None else speaker_id
        if voice_dirs is None:
            voice_dirs = []
        elif isinstance(voice_dirs, str):
            voice_dirs = [voice_dirs]
        history_prompt = load_voice(self, speaker_id, voice_dirs)
        if all(v is None for v in history_prompt):
            history_prompt = None
        tokens = self._text_to_tokens(text)
        wav, _, _ = self.generate_audio(tokens, history_prompt=history_prompt, **kwargs)
        return {"wav": wav, "text_inputs": text}

    # ------------------------------------------------------------ checkpoint
    def load_checkpoint(
        self,
        config,
        checkpoint_dir,
        text_model_path=None,
        coarse_model_path=None,
        fine_model_path=None,
        encodec_path=None,
        eval=True,
        strict=True,
        **kwargs,
    ):
        """Ingest the suno release (ref bark.py:242-283: a directory holding
        text_2.pt / coarse_2.pt / fine_2.pt; per-file `model_args` define
        the architecture, load_model.py:123). EnCodec weights load from
        `encodec.pth` (a raw `EncodecModel.state_dict()`) when present."""
        from tpu_tts.models.bark_convert import (
            convert_bark_fine_state_dict,
            convert_bark_gpt_state_dict,
            convert_encodec_state_dict,
            normalize_gpt_args,
        )
        from tpu_tts.train.torch_convert import load_torch_checkpoint

        d = str(checkpoint_dir)
        text_model_path = text_model_path or os.path.join(d, "text_2.pt")
        coarse_model_path = coarse_model_path or os.path.join(d, "coarse_2.pt")
        fine_model_path = fine_model_path or os.path.join(d, "fine_2.pt")
        encodec_path = encodec_path or os.path.join(d, "encodec.pth")

        params = {}
        for stage, path, conv, args_field in (
            ("semantic", text_model_path, convert_bark_gpt_state_dict, "semantic_config"),
            ("coarse", coarse_model_path, convert_bark_gpt_state_dict, "coarse_config"),
            ("fine", fine_model_path, convert_bark_fine_state_dict, "fine_config"),
        ):
            ckpt = load_torch_checkpoint(path)
            sd = ckpt.get("torch_state_dict") or {
                k: v for k, v in ckpt.items() if hasattr(v, "shape")
            }
            params[stage] = conv(sd)
            if "model_args" in ckpt:
                cur = getattr(self.args, args_field)
                cur.update(normalize_gpt_args(ckpt["model_args"]))
        self._build_modules()

        if os.path.exists(encodec_path):
            ckpt = load_torch_checkpoint(encodec_path)
            sd = ckpt.get("torch_state_dict") or {
                k: v for k, v in ckpt.items() if hasattr(v, "shape")
            }
            e = self.args.encodec_config
            params["encodec"] = convert_encodec_state_dict(
                sd, tuple(e.upsampling_ratios), e.num_residual_layers
            )
        else:
            params["encodec"] = self.encodec.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 1)), method=EncodecModel.__call__
            )["params"]
        self.params = params
        self._jit_cache = {}
        return params

    @staticmethod
    def init_from_config(config, samples=None):
        return Bark(config)


# ------------------------------------------------------------------ sampling
def _filter_top_p(logits, top_p):
    """Nucleus filter on raw logits (ref inference_funcs.py:252-266: applied
    before temperature). `top_p < 0` disables."""

    def apply(l):
        sort_idx = jnp.argsort(-l, axis=-1)
        sorted_l = jnp.take_along_axis(l, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_l, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate([jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        inv = jnp.argsort(sort_idx, axis=-1)
        keep = jnp.take_along_axis(~remove, inv, axis=-1)
        return jnp.where(keep, l, -jnp.inf)

    return jax.lax.cond(top_p > 0, apply, lambda l: l, logits)


def _filter_top_k(logits, top_k):
    """Keep the k largest logits (ref :267-269). `top_k < 0` disables."""
    V = logits.shape[-1]
    k = jnp.clip(top_k, 1, V)
    sorted_l = jnp.sort(logits, axis=-1)[..., ::-1]
    kth = jnp.take_along_axis(sorted_l, (k - 1)[None, None].astype(jnp.int32), axis=-1)
    return jnp.where(top_k > 0, jnp.where(logits < kth, -jnp.inf, logits), logits)
