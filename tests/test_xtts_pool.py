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


def test_pool_mixed_lengths_batch_and_match_single(xtts_model):
    """Different true text lengths in the same TEXT_BUCKET batch into ONE
    round (VERDICT r3 #1c) and each greedy pooled stream reproduces its own
    single-stream run — the key-side prompt mask makes row padding
    numerically invisible."""
    cond, spk = _cond(xtts_model, 3)
    toks = [np.arange(1, 7, dtype=np.int32), np.arange(1, 10, dtype=np.int32)]
    singles = []
    # max_new_tokens=14 ends MID-chunk (4+8+2): the tail chunk carries
    # invalid latents that must be zeroed before decode exactly like the
    # single-stream path, or the conv receptive field leaks them into the
    # last valid samples (caught live in r4 verification)
    for t in toks:
        xtts_model.bpe.encode = lambda text, lang, t=t: list(t)
        singles.append(np.concatenate(list(xtts_model.inference_stream(
            "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
            stream_chunk_size=8, first_chunk_size=4, max_new_tokens=14, top_k=1,
        ))))

    pool = _pool(xtts_model, gather_window_s=0.5, max_new_tokens=14)
    try:
        its = [pool.submit(text_tokens=t, gpt_cond_latent=cond, speaker_embedding=spk)
               for t in toks]
        outs = [np.concatenate(list(it)) for it in its]
    finally:
        pool.close()
    for o, s in zip(outs, singles):
        assert o.shape == s.shape
        np.testing.assert_allclose(o, s, atol=2e-3)


def test_pool_compaction_evicts_finished_rows(xtts_model):
    """Per-request `max_tokens` caps a row's decode budget; once enough rows
    finish, the round compacts to a smaller batch (VERDICT r3 #6). Greedy
    outputs must survive the compaction bit-for-bit vs single streams."""
    cond, spk = _cond(xtts_model, 4)
    tok = np.arange(1, 7, dtype=np.int32)
    xtts_model.bpe.encode = lambda text, lang: list(tok)
    single = np.concatenate(list(xtts_model.inference_stream(
        "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
        stream_chunk_size=8, first_chunk_size=4, max_new_tokens=20, top_k=1,
    )))

    pool = _pool(xtts_model, max_streams=4, gather_window_s=0.5)
    try:
        # two rows exhaust their budget after the 4-step first chunk → the
        # round compacts 4 → 2 live rows before the next chunk
        short = [pool.submit(text_tokens=tok, gpt_cond_latent=c, speaker_embedding=s,
                             max_tokens=4)
                 for c, s in (_cond(xtts_model, 5), _cond(xtts_model, 6))]
        long = [pool.submit(text_tokens=tok, gpt_cond_latent=cond, speaker_embedding=spk)
                for _ in range(2)]
        outs_short = [np.concatenate(list(it)) for it in short]
        outs_long = [np.concatenate(list(it)) for it in long]
    finally:
        pool.close()
    # a 4-token budget emits exactly one first chunk's worth of audio (the
    # decode interpolation floors frames, so compare to a real 4-token run)
    ref_short = np.concatenate(list(xtts_model.inference_stream(
        "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
        stream_chunk_size=8, first_chunk_size=4, max_new_tokens=4, top_k=1,
    )))
    for o in outs_short:
        assert o.size == ref_short.size and np.isfinite(o).all()
    for o in outs_long:
        assert o.shape == single.shape
        np.testing.assert_allclose(o, single, atol=2e-3)


def test_pool_mid_round_admission_matches_single(xtts_model):
    """Open-loop serving (VERDICT r4 #1): a request arriving AFTER a round
    has started is spliced into the live batch at the next chunk boundary
    (audio_start > 0 — its KV rows join the shared absolute timeline, its
    positions stay relative), and its greedy output must match its solo run
    exactly. The first request's output must survive the splice unchanged."""
    cond, spk = _cond(xtts_model, 11)
    cond2, spk2 = _cond(xtts_model, 12)
    tok_a = np.arange(1, 7, dtype=np.int32)
    tok_b = np.arange(3, 11, dtype=np.int32)
    solos = []
    # A runs 60 tokens (many chunks) so the round is reliably still live
    # when B arrives after A's first chunk; B's own budget is 20
    for t, n, (c, s) in ((tok_a, 60, (cond, spk)), (tok_b, 20, (cond2, spk2))):
        xtts_model.bpe.encode = lambda text, lang, t=t: list(t)
        solos.append(np.concatenate(list(xtts_model.inference_stream(
            "x", "en", gpt_cond_latent=c, speaker_embedding=s,
            stream_chunk_size=8, first_chunk_size=4, max_new_tokens=n, top_k=1,
        ))))

    pool = _pool(xtts_model, gather_window_s=0.05, max_new_tokens=60)
    try:
        it_a = pool.submit(text_tokens=tok_a, gpt_cond_latent=cond, speaker_embedding=spk)
        first_a = next(it_a)  # round is now live (first chunk emitted)
        it_b = pool.submit(text_tokens=tok_b, gpt_cond_latent=cond2,
                           speaker_embedding=spk2, max_tokens=20)
        out_b = np.concatenate(list(it_b))
        out_a = np.concatenate([first_a] + list(it_a))
    finally:
        pool.close()
    assert pool.rounds_served == 1, "the second request must join the live round"
    assert pool.admissions == 1
    assert out_a.shape == solos[0].shape
    np.testing.assert_allclose(out_a, solos[0], atol=2e-3)
    assert out_b.shape == solos[1].shape
    np.testing.assert_allclose(out_b, solos[1], atol=2e-3)


def test_pool_cond_width_bucket_mixes_refs(xtts_model):
    """A multi-reference request (stacked cond latents, ref xtts.py:326) and
    a single-reference request batch into ONE round (VERDICT r4 #8): the
    narrow row is right-padded on the latent axis and masked via
    `cond_lengths`, so its output matches its own (unpadded) solo run."""
    cond1, spk1 = _cond(xtts_model, 13)  # [1, 4, C]
    c_a, s_a = _cond(xtts_model, 14)
    c_b, _ = _cond(xtts_model, 15)
    cond2 = np.concatenate([np.asarray(c_a), np.asarray(c_b)], axis=1)  # [1, 8, C]
    spk2 = s_a
    tok = np.arange(1, 7, dtype=np.int32)
    xtts_model.bpe.encode = lambda text, lang: list(tok)
    solos = []
    for c, s in ((cond1, spk1), (cond2, spk2)):
        solos.append(np.concatenate(list(xtts_model.inference_stream(
            "x", "en", gpt_cond_latent=jnp_np(c), speaker_embedding=jnp_np(s),
            stream_chunk_size=8, first_chunk_size=4, max_new_tokens=20, top_k=1,
        ))))

    pool = _pool(xtts_model, gather_window_s=0.5, max_new_tokens=20)
    try:
        its = [
            pool.submit(text_tokens=tok, gpt_cond_latent=jnp_np(c), speaker_embedding=jnp_np(s))
            for c, s in ((cond1, spk1), (cond2, spk2))
        ]
        outs = [np.concatenate(list(it)) for it in its]
    finally:
        pool.close()
    assert pool.rounds_served == 1, "1-ref and 2-ref requests must share a round"
    for o, s in zip(outs, solos):
        assert o.shape == s.shape
        np.testing.assert_allclose(o, s, atol=2e-3)


def jnp_np(x):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(x, dtype=np.float32))


def test_pool_starved_request_seeds_next_round(xtts_model):
    """A request deferred `max_deferrals` times becomes the next round's
    seed (ADVICE r4: no aging meant a minority-bucket request could be
    deferred forever behind sustained same-bucket traffic)."""
    from tpu_tts.infer.xtts_pool import XttsStreamPool, _Request

    pool = _pool(xtts_model)
    try:
        short = _Request(np.arange(1, 7, dtype=np.int32), None, None)  # bucket 32
        long_ = _Request(np.arange(1, 41, dtype=np.int32), None, None)  # bucket 64
        long_.deferrals = pool.max_deferrals
        pending, batch, bucket = pool._select_round([short, long_])
        assert batch == [long_] and bucket == 64, "starved request must seed the round"
        assert pending == [short]
        # below the threshold the oldest request wins as usual
        long2 = _Request(np.arange(1, 41, dtype=np.int32), None, None)
        pending, batch, bucket = pool._select_round([short, long2])
        assert batch == [short] and bucket == 32
        assert long2.deferrals == 1
    finally:
        pool.close()


def test_pool_openloop_poisson_drive(xtts_model):
    """Drive the pool with POISSON arrivals through the open-loop bench
    harness (VERDICT r4 #1): arrivals are not aligned to round boundaries,
    every request must complete with finite audio, and chunk-boundary
    admission must actually fire under sustained traffic."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from xtts_stream_latency import measure_openloop

    out = measure_openloop(
        rate=200.0, duration=2.5, model=xtts_model,
        pool_kwargs=dict(max_streams=4, stream_chunk_size=8, first_chunk_size=4,
                         top_k=1, gather_window_s=0.005),
        n_text=6, utter_tokens=16, warmup_frac=0.0,
    )
    assert out["n_requests"] >= 10
    assert out["n_measured"] == out["n_requests"], "every request must complete"
    assert out["p95_first_chunk_ms"] is not None
    assert out["admissions"] >= 1, "open-loop arrivals must join live rounds"
    assert out["rounds_served"] < out["n_requests"], "requests must batch, not serialize"


def test_pool_timeline_rebase_keeps_outputs_exact(xtts_model):
    """A continuously-fed round eventually nears kv_cache_len on the shared
    absolute timeline; the pool REBASES (block-moves the last
    max_new_tokens+chunk audio rows down and shifts audio_start) instead of
    draining. Requests decoded across a rebase must still match their solo
    runs exactly, and the round must stay open (no admission blackout)."""
    cond, spk = _cond(xtts_model, 21)
    tok = np.arange(1, 7, dtype=np.int32)
    xtts_model.bpe.encode = lambda text, lang: list(tok)
    solo = np.concatenate(list(xtts_model.inference_stream(
        "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
        stream_chunk_size=8, first_chunk_size=4, max_new_tokens=20, top_k=1,
    )))

    # cache_cap = 128 - (4+32) = 92 absolute steps; each request advances the
    # timeline by >= 20, so ~6 chained admissions force at least one rebase
    pool = _pool(xtts_model, max_streams=2, gather_window_s=0.05, max_new_tokens=20)
    try:
        outs = []
        prev = pool.submit(text_tokens=tok, gpt_cond_latent=cond, speaker_embedding=spk)
        chunks = [next(prev)]  # round live
        for _ in range(7):
            nxt = pool.submit(text_tokens=tok, gpt_cond_latent=cond, speaker_embedding=spk)
            chunks += list(prev)  # drain previous fully (keeps ordering simple)
            outs.append(np.concatenate(chunks))
            prev, chunks = nxt, [next(nxt)]
        outs.append(np.concatenate(chunks + list(prev)))
    finally:
        pool.close()
    assert pool.rounds_served <= 2, "rebase must keep the round open, not drain it"
    for o in outs:
        assert o.shape == solo.shape
        np.testing.assert_allclose(o, solo, atol=2e-3)


def test_pool_mid_chunk_budget_matches_single(xtts_model):
    """A max_tokens that ends MID-chunk must zero the beyond-budget latents
    BEFORE decoding (like the single-stream max_new_tokens path) — otherwise
    the conv receptive field leaks decoded-but-discarded tokens into the
    final emitted samples (code-review r4 finding)."""
    cond, spk = _cond(xtts_model, 8)
    tok = np.arange(1, 7, dtype=np.int32)
    xtts_model.bpe.encode = lambda text, lang: list(tok)
    ref = np.concatenate(list(xtts_model.inference_stream(
        "x", "en", gpt_cond_latent=cond, speaker_embedding=spk,
        stream_chunk_size=8, first_chunk_size=4, max_new_tokens=6, top_k=1,
    )))

    pool = _pool(xtts_model)  # pool max_new_tokens=20 > the request budget
    try:
        it = pool.submit(text_tokens=tok, gpt_cond_latent=cond,
                         speaker_embedding=spk, max_tokens=6)
        out = np.concatenate(list(it))
    finally:
        pool.close()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)
