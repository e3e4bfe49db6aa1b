"""Numerical parity: reference torch Bark GPT/FineGPT (TTS/tts/layers/bark/
model.py:146, model_fine.py:74) and the HF `transformers` EnCodec codec →
converted flax params (`tpu_tts.models.bark_convert`). Covers the
teacher-forced pass, `merge_context`, the incremental KV-cache decode path,
the fine model's tied heads, and EnCodec encode/decode."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

GPT_ARGS = dict(
    block_size=600, input_vocab_size=60, output_vocab_size=60,
    n_layer=2, n_head=2, n_embd=32, dropout=0.0,
)


@pytest.fixture(scope="module", params=[True, False], ids=["bias", "nobias"])
def gpt_pair(request):
    bm = ref_import("TTS.tts.layers.bark.model")
    if bm is None:
        pytest.skip("reference bark model not importable")
    import torch

    torch.manual_seed(0)
    ref = bm.GPT(bm.GPTConfig(bias=request.param, **GPT_ARGS)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from tpu_tts.layers.bark_gpt import BarkGPT
    from tpu_tts.models.bark_convert import convert_bark_gpt_state_dict

    mine = BarkGPT(bias=request.param, **{k: v for k, v in GPT_ARGS.items() if k != "dropout"})
    return ref, mine, {"params": convert_bark_gpt_state_dict(sd)}


def test_gpt_forward_parity(gpt_pair):
    import torch

    ref, mine, params = gpt_pair
    idx = np.random.RandomState(0).randint(0, 60, (2, 11)).astype(np.int64)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(idx))  # last position only
    logits = mine.apply(params, jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(logits[:, -1]), ref_logits[:, -1].numpy(), atol=2e-5)


def test_gpt_merge_context_parity(gpt_pair):
    import torch

    ref, mine, params = gpt_pair
    # ref model.py:186 hard-codes 256 text + 256 history ids before the prompt
    idx = np.random.RandomState(1).randint(0, 60, (1, 256 + 256 + 7)).astype(np.int64)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(idx), merge_context=True)
    logits = mine.apply(params, jnp.asarray(idx), merge_context=True)
    np.testing.assert_allclose(np.asarray(logits[:, -1]), ref_logits[:, -1].numpy(), atol=2e-5)


def test_gpt_incremental_decode_parity(gpt_pair):
    """Our static-cache prefill/decode_step vs the reference's growing
    past_kv (model.py:52-69), three greedy steps."""
    import torch

    ref, mine, params = gpt_pair
    P, steps = 7, 3
    idx = np.random.RandomState(2).randint(0, 60, (1, P)).astype(np.int64)

    with torch.no_grad():
        ref_logits, kv = ref(torch.from_numpy(idx), use_cache=True)
        ref_seq = [ref_logits[:, -1].numpy()]
        for _ in range(steps):
            tok = ref_seq[-1].argmax(-1)[None]
            ref_logits, kv = ref(torch.from_numpy(tok.astype(np.int64)), past_kv=kv, use_cache=True)
            ref_seq.append(ref_logits[:, -1].numpy())

    T_max = P + steps
    cache = mine.init_cache(1, T_max)
    key_valid = (jnp.arange(T_max) < P)[None]
    cache, hidden = mine.apply(params, jnp.asarray(idx), cache, key_valid=key_valid,
                               method=mine.prefill)
    logits = mine.apply(params, hidden[:, P - 1], method=mine.logits_at)
    np.testing.assert_allclose(np.asarray(logits), ref_seq[0], atol=2e-5)
    for i in range(steps):
        tok = jnp.asarray(np.asarray(logits).argmax(-1))
        key_valid = key_valid.at[:, P + i].set(True)
        logits, cache = mine.apply(params, tok, jnp.full((1,), P + i), cache, P + i,
                                   key_valid=key_valid, method=mine.decode_step)
        np.testing.assert_allclose(np.asarray(logits), ref_seq[i + 1], atol=2e-5)


def test_fine_gpt_parity():
    bmf = ref_import("TTS.tts.layers.bark.model_fine")
    if bmf is None:
        pytest.skip("reference bark model_fine not importable")
    import torch

    torch.manual_seed(0)
    args = dict(block_size=64, input_vocab_size=40, output_vocab_size=40,
                n_layer=2, n_head=2, n_embd=32, dropout=0.0)
    ref = bmf.FineGPT(bmf.FineGPTConfig(n_codes_total=4, n_codes_given=1, **args)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from tpu_tts.layers.bark_gpt import BarkFineGPT
    from tpu_tts.models.bark_convert import convert_bark_fine_state_dict

    mine = BarkFineGPT(n_codes_total=4, n_codes_given=1,
                       **{k: v for k, v in args.items() if k != "dropout"})
    params = {"params": convert_bark_fine_state_dict(sd)}

    codes = np.random.RandomState(3).randint(0, 40, (2, 12, 4)).astype(np.int64)
    for pred_idx in (1, 3):
        with torch.no_grad():
            ref_logits = ref(pred_idx, torch.from_numpy(codes)).numpy()
        logits = mine.apply(params, pred_idx, jnp.asarray(codes))
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-5)


@pytest.fixture(scope="module")
def encodec_pair():
    """HF `transformers` EnCodec (same SEANet/RVQ architecture and state-dict
    naming family the converter targets) vs our flax EncodecModel."""
    transformers = pytest.importorskip("transformers")
    import torch

    torch.manual_seed(0)
    cfg = transformers.EncodecConfig(
        target_bandwidths=[24.0], sampling_rate=24000, audio_channels=1,
        hidden_size=8, num_filters=2, num_residual_layers=1,
        upsampling_ratios=[8, 5, 4, 2], codebook_size=16, codebook_dim=8,
    )
    ref = transformers.EncodecModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from tpu_tts.layers.encodec import EncodecModel
    from tpu_tts.models.bark_convert import convert_encodec_state_dict

    converted = convert_encodec_state_dict(sd)
    mine = EncodecModel(hidden_size=8, num_filters=2, upsampling_ratios=(8, 5, 4, 2),
                        num_quantizers=converted["quantizer"]["embed"].shape[0],
                        codebook_size=16)
    params = {"params": converted}
    return ref, mine, params


def test_encodec_decode_parity(encodec_pair):
    import torch

    ref, mine, params = encodec_pair
    n_q, T_fr = 6, 9
    codes = np.random.RandomState(4).randint(0, 16, (n_q, 1, T_fr)).astype(np.int64)
    with torch.no_grad():
        emb = ref.quantizer.decode(torch.from_numpy(codes))
        ref_wav = ref.decoder(emb).numpy()  # [B, 1, T]
    wav = mine.apply(params, jnp.asarray(codes.transpose(1, 2, 0)), method=mine.decode)
    np.testing.assert_allclose(np.asarray(wav[..., 0]), ref_wav[:, 0], atol=2e-5)


def test_encodec_encode_parity(encodec_pair):
    import torch

    ref, mine, params = encodec_pair
    wav = np.random.RandomState(5).uniform(-0.5, 0.5, (1, 1, 800)).astype(np.float32)
    with torch.no_grad():
        emb = ref.encoder(torch.from_numpy(wav))
        ref_codes = ref.quantizer.encode(emb, bandwidth=24.0).numpy()  # [nq, B, T]
    codes = mine.apply(params, jnp.asarray(wav.transpose(0, 2, 1)),
                       n_q=ref_codes.shape[0], method=mine.encode)
    assert np.array_equal(np.asarray(codes), ref_codes.transpose(1, 2, 0))
