"""Closed-loop pool probe with TPU_TTS_POOL_TRACE=1: submit B simultaneous
full-size streams, print per-chunk phase timings — diagnoses where the
serving loop spends wall time on real hardware (chunk dispatch vs store vs
fetch vs emit vs admission)."""
import os
import sys
import time

os.environ.setdefault("TPU_TTS_POOL_TRACE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()
import numpy as np

from tpu_tts.parallel.platform import maybe_enable_compile_cache

maybe_enable_compile_cache()
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from xtts_stream_latency import _build_model

from tpu_tts.infer.xtts_pool import XttsStreamPool

B = int(os.environ.get("PROBE_STREAMS", "16"))
tokens_n = int(os.environ.get("PROBE_TOKENS", "100"))
t0 = time.perf_counter()
model = _build_model()
print(f"[probe] init {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
a = model.args
pool = XttsStreamPool(model, max_streams=B, max_new_tokens=tokens_n,
                      admit_mid_round=os.environ.get("PROBE_ADMIT", "1") == "1")
t0 = time.perf_counter()
pool.warmup(verbose=True)
print(f"[probe] warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
for it in range(2):
    its = []
    t0 = time.perf_counter()
    for i in range(B):
        toks = rng.integers(1, 200, (30,)).astype(np.int32)
        cond = rng.standard_normal((1, a.num_cond_latents, a.gpt_n_model_channels)).astype(np.float32) * 0.02
        spk = rng.standard_normal((1, a.d_vector_dim)).astype(np.float32) * 0.1
        its.append(pool.submit(text_tokens=toks, gpt_cond_latent=cond, speaker_embedding=spk))
    total = 0
    for s in its:
        for w in s:
            total += len(w)
    dt = time.perf_counter() - t0
    audio = total / a.output_sample_rate
    print(f"[probe] round {it}: {B} streams x {tokens_n} tokens in {dt:.2f}s "
          f"-> {audio:.1f}s audio, {audio/dt:.1f} audio-s/s", file=sys.stderr, flush=True)
pool.close()
