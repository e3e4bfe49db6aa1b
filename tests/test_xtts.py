import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.configs.xtts_config import XttsConfig
from tpu_tts.models.xtts import Xtts, XttsArgs


@pytest.fixture(scope="module")
def xtts_model():
    cfg = XttsConfig()
    cfg.model_args = XttsArgs(
        gpt_layers=2,
        gpt_n_heads=2,
        gpt_n_model_channels=32,
        gpt_number_text_tokens=50,
        gpt_num_audio_tokens=34,
        gpt_start_audio_token=32,
        gpt_stop_audio_token=33,
        gpt_start_text_token=48,
        gpt_stop_text_token=0,
        num_cond_latents=4,
        d_vector_dim=16,
        decoder_input_dim=32,
        decoder_upsample_rates=(4, 4),
        kv_cache_len=128,
    )
    m = Xtts(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


def test_xtts_finetune_loss(xtts_model):
    rng = np.random.default_rng(0)
    batch = {
        "cond_mel": jnp.asarray(rng.standard_normal((2, 16, 80)), dtype=jnp.float32),
        "text_tokens": jnp.asarray(rng.integers(0, 50, (2, 10)), dtype=jnp.int32),
        "text_lengths": jnp.array([10, 7], dtype=jnp.int32),
        "audio_codes": jnp.asarray(rng.integers(0, 32, (2, 14)), dtype=jnp.int32),
    }
    loss, logs = xtts_model.loss_fn(xtts_model.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert {"loss_text_ce", "loss_mel_ce"} <= set(logs)


def test_xtts_conditioning_and_inference(xtts_model):
    wav = np.random.default_rng(0).standard_normal(22050).astype(np.float32) * 0.3
    cond, spk = xtts_model.get_conditioning_latents(wav)
    assert np.asarray(cond).shape == (1, 4, 32)
    assert np.asarray(spk).shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(spk)), 1.0, atol=1e-4)

    ids = np.arange(1, 9, dtype=np.int32)[None]
    out = xtts_model.inference(
        text_tokens=jnp.asarray(ids), gpt_cond_latent=cond, speaker_embedding=spk, max_new_tokens=24
    )
    assert out["wav"].ndim == 1
    assert np.isfinite(out["wav"]).all()
    assert out["gpt_codes"].shape == (1, 24)


def test_xtts_streaming(xtts_model):
    wav = np.random.default_rng(1).standard_normal(11025).astype(np.float32) * 0.3
    cond, spk = xtts_model.get_conditioning_latents(wav)

    # streaming path needs a BPE; inject token ids directly via monkeypatching encode
    xtts_model.bpe.encode = lambda text, lang: list(range(1, 7))
    chunks = list(
        xtts_model.inference_stream(
            "dummy", "en", gpt_cond_latent=cond, speaker_embedding=spk,
            stream_chunk_size=8, overlap_latents=2, max_new_tokens=24,
        )
    )
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    # emission follows the interpolated sample-per-token rate (decode_latents
    # mirrors HifiDecoder.forward): each chunk emits _n_samples(nv) samples
    spf = xtts_model._n_samples(1)
    assert spf <= len(total) <= xtts_model._n_samples(24) + len(chunks)


def test_xtts_streaming_matches_full_scan(xtts_model):
    """The chunked stream_prefill/stream_chunk path must reproduce the
    one-scan `generate_latents` codes/latents bit for bit (same key
    threading), so streaming changes nothing but latency."""
    from tpu_tts.models.xtts import XttsNet

    wav = np.random.default_rng(2).standard_normal(11025).astype(np.float32) * 0.3
    cond, _ = xtts_model.get_conditioning_latents(wav)
    text = jnp.asarray(np.arange(1, 7, dtype=np.int32))[None]
    p, net = xtts_model.params, xtts_model.net
    seed, T, CK = jax.random.PRNGKey(7), 24, 8

    codes_f, lats_f, valid_f = net.apply(
        {"params": p}, cond, text, seed, T, 0.75, 5, method=XttsNet.generate_latents
    )

    cache, plen, code = net.apply({"params": p}, cond, text, method=XttsNet.stream_prefill)
    stopped = jnp.zeros((1,), dtype=bool)
    rng = seed
    codes_c, lats_c = [], []
    for i0 in range(0, T, CK):
        (cache, code, stopped, rng), (cds, lts, _) = net.apply(
            {"params": p}, cache, plen, code, stopped, rng, jnp.int32(i0), CK, 0.75, 5,
            method=XttsNet.stream_chunk,
        )
        codes_c.append(np.asarray(cds))
        lats_c.append(np.asarray(lts))
    np.testing.assert_array_equal(np.concatenate(codes_c, axis=1), np.asarray(codes_f))
    np.testing.assert_allclose(
        np.concatenate(lats_c, axis=1), np.asarray(lats_f), atol=1e-5
    )


def test_xtts_decode_step_matches_teacher_forced(xtts_model):
    """Incremental decode must reproduce the teacher-forced forward: logits
    at decode step t (code_t fed at audio position t) == teacher-forced
    mel_logits[:, t]. This is the invariant that pins the KV-cache/positional
    plumbing — a scalar `pos_in_audio` once broadcast the hidden state to
    [B, n_embd, n_embd] (a full phantom forward per step, wrong pos-emb, and
    a clobbered cache) while the stream-vs-scan test compared two paths that
    shared the bug."""
    from tpu_tts.models.xtts import XttsNet

    wav = np.random.default_rng(5).standard_normal(11025).astype(np.float32) * 0.3
    cond, _ = xtts_model.get_conditioning_latents(wav)
    text = jnp.asarray(np.arange(1, 7, dtype=np.int32))[None]
    rng = np.random.default_rng(6)
    codes = jnp.asarray(rng.integers(0, 32, (1, 6)), dtype=jnp.int32)
    p, net = xtts_model.params, xtts_model.net

    def teacher(m, cond, text, codes):
        return m.gpt(cond, text, codes)

    ref = net.apply({"params": p}, cond, text, codes, method=teacher)
    ref_logits = np.asarray(ref["mel_logits"], dtype=np.float32)  # [1, 6, V]

    cache, plen, _start = net.apply({"params": p}, cond, text, method=XttsNet.stream_prefill)

    def step(m, code, i, cache, idx):
        return m.gpt.decode_step(code, i, cache, idx)

    for t in range(codes.shape[1]):
        logits, latent, cache = net.apply(
            {"params": p}, codes[:, t], jnp.int32(t), cache, plen + t, method=step
        )
        assert logits.shape == (1, net.a["gpt_num_audio_tokens"])
        assert latent.shape == (1, net.a["gpt_n_model_channels"])
        np.testing.assert_allclose(
            np.asarray(logits, dtype=np.float32), ref_logits[:, t], atol=2e-2, rtol=1e-2,
            err_msg=f"step {t}",
        )


def test_xtts_masked_prefill_matches_teacher_forced(xtts_model):
    """Right-padded prompt + key-side mask must reproduce the exact-length
    teacher-forced logits at every decode step — the masked extension of the
    invariant above (VERDICT r3 #8): any bucketed-serving bug that leaks
    padded rows into attention shows up here, where stream-vs-scan
    comparisons (both running the same masked path) cannot catch it."""
    from tpu_tts.models.xtts import XttsNet

    wav = np.random.default_rng(5).standard_normal(11025).astype(np.float32) * 0.3
    cond, _ = xtts_model.get_conditioning_latents(wav)
    text = jnp.asarray(np.arange(1, 7, dtype=np.int32))[None]
    rng = np.random.default_rng(6)
    codes = jnp.asarray(rng.integers(0, 32, (1, 6)), dtype=jnp.int32)
    p, net = xtts_model.params, xtts_model.net

    def teacher(m, cond, text, codes):
        return m.gpt(cond, text, codes)

    ref = net.apply({"params": p}, cond, text, codes, method=teacher)
    ref_logits = np.asarray(ref["mel_logits"], dtype=np.float32)  # [1, 6, V]

    # pad the prompt well past the real length; mask must hide the pad rows
    pad = jnp.pad(text, ((0, 0), (0, 10)), constant_values=17)  # non-zero pad id
    lengths = jnp.array([6], dtype=jnp.int32)
    cache, plen, _start = net.apply(
        {"params": p}, cond, pad, lengths, method=XttsNet.stream_prefill
    )
    assert int(plen) == cond.shape[1] + pad.shape[1]

    def step(m, code, i, cache, idx, kv):
        return m.gpt.decode_step(code, i, cache, idx, key_valid=kv)

    def mask(m, plen, lengths):
        return m.gpt.key_valid_mask(cond.shape[1], plen, lengths, m.a["kv_cache_len"])

    kv = net.apply({"params": p}, plen, lengths, method=mask)
    for t in range(codes.shape[1]):
        logits, latent, cache = net.apply(
            {"params": p}, codes[:, t], jnp.int32(t), cache, plen + t, kv, method=step
        )
        np.testing.assert_allclose(
            np.asarray(logits, dtype=np.float32), ref_logits[:, t], atol=2e-2, rtol=1e-2,
            err_msg=f"masked step {t}",
        )


def test_xtts_inference_bucket_shares_compile_and_matches_exact(xtts_model):
    """Serving-path bucketing (VERDICT r3 #1): two different text lengths in
    the same TEXT_BUCKET must reuse ONE compiled generate program, and the
    padded run must produce the same codes as an exact-length unmasked run
    (greedy decoding — the mask makes padding numerically invisible)."""
    from tpu_tts.models.xtts import XttsNet

    wav = np.random.default_rng(11).standard_normal(11025).astype(np.float32) * 0.3
    cond, spk = xtts_model.get_conditioning_latents(wav)
    p, net = xtts_model.params, xtts_model.net

    xtts_model._jit.clear()
    outs = {}
    for n in (5, 9):  # both bucket to TEXT_BUCKET=32
        ids = jnp.asarray(np.arange(1, n + 1, dtype=np.int32))[None]
        outs[n] = xtts_model.inference(
            text_tokens=ids, gpt_cond_latent=cond, speaker_embedding=spk,
            max_new_tokens=16, top_k=1,
        )
    gen_keys = [k for k in xtts_model._jit if k[0] == "gen"]
    assert len(gen_keys) == 1, f"expected one bucketed generate compile, got {gen_keys}"

    for n in (5, 9):
        ids = jnp.asarray(np.arange(1, n + 1, dtype=np.int32))[None]
        codes, lats, valid = net.apply(
            {"params": p}, cond, ids, jax.random.PRNGKey(0), 16, 0.75, 1,
            method=XttsNet.generate_latents,
        )  # exact-length, unmasked
        np.testing.assert_array_equal(outs[n]["gpt_codes"], np.asarray(codes))
