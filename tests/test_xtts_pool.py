"""XttsStreamPool: lockstep multi-stream XTTS serving (tpu_tts/infer/xtts_pool.py).

With greedy decoding (top_k=1) the sampled codes are batch-size invariant, so
a pooled stream must reproduce the single-stream `inference_stream` output;
a pool round also has to serve concurrent same-length requests and handle
mixed text-length buckets without deadlock."""

import numpy as np
import pytest

from tests.test_xtts import xtts_model  # noqa: F401  (module-scoped fixture)


def _cond(xtts_model, seed):
    wav = np.random.default_rng(seed).standard_normal(11025).astype(np.float32) * 0.3
    return xtts_model.get_conditioning_latents(wav)


def _pool(xtts_model, **kw):
    from tpu_tts.infer.xtts_pool import XttsStreamPool

    kw.setdefault("max_streams", 3)
    kw.setdefault("stream_chunk_size", 8)
    kw.setdefault("first_chunk_size", 4)
    kw.setdefault("max_new_tokens", 20)
    kw.setdefault("top_k", 1)  # greedy → batch-size invariant
    kw.setdefault("gather_window_s", 0.5)
    return XttsStreamPool(xtts_model, **kw)


def test_pool_matches_single_stream(xtts_model):
    cond, spk = _cond(xtts_model, 1)
    tokens = np.arange(1, 7, dtype=np.int32)
    xtts_model.bpe.encode = lambda text, lang: list(tokens)
    single = np.concatenate(list(xtts_model.inference_stream(
        "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
        stream_chunk_size=8, first_chunk_size=4, max_new_tokens=20, top_k=1,
    )))

    pool = _pool(xtts_model)
    try:
        # submit THREE concurrent streams with different conditioning; the
        # middle one matches the single-stream run exactly
        conds = [_cond(xtts_model, 7), (cond, spk), _cond(xtts_model, 9)]
        its = [
            pool.submit(text_tokens=tokens, gpt_cond_latent=c, speaker_embedding=s)
            for c, s in conds
        ]
        outs = [np.concatenate(list(it)) for it in its]
    finally:
        pool.close()
    for o in outs:
        assert np.isfinite(o).all() and o.size > 0
    assert outs[1].shape == single.shape
    np.testing.assert_allclose(outs[1], single, atol=2e-3)
    # different conditioning must actually produce different audio
    assert not np.allclose(outs[0][: outs[1].size], outs[1][: outs[0].size])


def test_pool_mixed_lengths_no_deadlock(xtts_model):
    cond, spk = _cond(xtts_model, 3)
    pool = _pool(xtts_model, gather_window_s=0.05)
    try:
        a = pool.submit(text_tokens=np.arange(1, 7, dtype=np.int32),
                        gpt_cond_latent=cond, speaker_embedding=spk)
        b = pool.submit(text_tokens=np.arange(1, 10, dtype=np.int32),
                        gpt_cond_latent=cond, speaker_embedding=spk)
        wav_a = np.concatenate(list(a))
        wav_b = np.concatenate(list(b))
    finally:
        pool.close()
    assert wav_a.size > 0 and np.isfinite(wav_a).all()
    assert wav_b.size > 0 and np.isfinite(wav_b).all()
