"""Threaded loader prefetch (`num_loader_workers`).

The reference hands `config.num_loader_workers` to torch
`DataLoader(num_workers=...)` (ref base_tts.py:358); our loaders build
batches in a thread pool (`tpu_tts.data.prefetch_batches`). These tests pin
the contract: worker-threaded iteration yields byte-identical batches in
identical order to serial iteration, and None entries (sharding skips) are
dropped.
"""

import numpy as np
import pytest

from tpu_tts.data import prefetch_batches


def test_prefetch_order_and_skip():
    def make(i):
        if i % 3 == 0:
            return None
        return i * i

    schedule = list(range(20))
    serial = [b for b in prefetch_batches(make, schedule, num_workers=0)]
    threaded = [b for b in prefetch_batches(make, schedule, num_workers=4)]
    assert serial == threaded == [i * i for i in schedule if i % 3 != 0]


def test_prefetch_early_abandon():
    # breaking out of iteration must not hang the pool
    gen = prefetch_batches(lambda i: i, range(100), num_workers=2)
    got = [next(gen) for _ in range(3)]
    gen.close()
    assert got == [0, 1, 2]


@pytest.fixture(scope="module")
def tts_loader_parts():
    from tests.conftest import get_tests_data_path
    from tests.fixtures import ensure_ljspeech_fixture
    from tpu_tts.audio import AudioProcessor
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs import GlowTTSConfig
    from tpu_tts.data import load_tts_samples
    from tpu_tts.text.tokenizer import TTSTokenizer

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    cfg = GlowTTSConfig()
    cfg.datasets = [BaseDatasetConfig(formatter="ljspeech", meta_file_train="metadata.csv", path=fixture)]
    samples, _ = load_tts_samples(cfg.datasets, eval_split=False)
    ap = AudioProcessor.init_from_config(cfg)
    tok, cfg = TTSTokenizer.init_from_config(cfg)
    return ap, tok, samples


def _collect(loader):
    return [batch for batch in loader]


def test_tts_loader_workers_identical(tts_loader_parts):
    from tpu_tts.data.dataset import TTSDataLoader, TTSDataset

    ap, tok, samples = tts_loader_parts
    batches = {}
    for workers in (0, 3):
        ds = TTSDataset(ap=ap, samples=samples, tokenizer=tok)
        ds.preprocess_samples()
        loader = TTSDataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=7,
                               num_workers=workers)
        batches[workers] = _collect(loader)
    assert len(batches[0]) == len(batches[3]) > 0
    for b0, b1 in zip(batches[0], batches[3]):
        assert sorted(b0.keys()) == sorted(b1.keys())
        for k in b0:
            v0, v1 = b0[k], b1[k]
            if isinstance(v0, np.ndarray) and v0.dtype != object:
                np.testing.assert_array_equal(v0, v1, err_msg=k)
            else:
                assert list(map(str, v0)) == list(map(str, v1)), k


def test_tts_loader_workers_sharded(tts_loader_parts):
    """Worker threads compose with per-process batch sharding."""
    from tpu_tts.data.dataset import TTSDataLoader, TTSDataset

    ap, tok, samples = tts_loader_parts
    ds = TTSDataset(ap=ap, samples=samples, tokenizer=tok)
    ds.preprocess_samples()
    serial = _collect(TTSDataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=3,
                                    num_shards=2, shard_id=1))
    threaded = _collect(TTSDataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=3,
                                      num_shards=2, shard_id=1, num_workers=2))
    assert len(serial) == len(threaded) > 0
    for b0, b1 in zip(serial, threaded):
        np.testing.assert_array_equal(b0["text_input"], b1["text_input"])
        np.testing.assert_array_equal(b0["mel_input"], b1["mel_input"])


def test_gan_loader_workers_identical(tts_loader_parts):
    from tpu_tts.vocoder.datasets.gan_dataset import GANDataLoader, GANDataset

    ap, _, samples = tts_loader_parts
    items = [s["audio_file"] for s in samples]
    batches = {}
    for workers in (0, 2):
        # eval mode: segment starts are deterministic, so outputs must match
        ds = GANDataset(ap=ap, items=items, seq_len=4096, hop_len=ap.hop_length,
                        pad_short=2000, is_training=False, seed=5)
        loader = GANDataLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                               num_workers=workers)
        batches[workers] = _collect(loader)
    assert len(batches[0]) == len(batches[2]) > 0
    for b0, b1 in zip(batches[0], batches[2]):
        np.testing.assert_array_equal(b0["mel_input"], b1["mel_input"])
        np.testing.assert_array_equal(b0["waveform"], b1["waveform"])


def test_feature_cache_atomic_publish(tmp_path):
    from tpu_tts.data.dataset import FeatureCache

    cache = FeatureCache(str(tmp_path), ".npy")
    val = np.arange(12, dtype=np.float32)
    out1 = cache.get("clip1", lambda: val)
    out2 = cache.get("clip1", lambda: (_ for _ in ()).throw(AssertionError("must hit cache")))
    np.testing.assert_array_equal(out1, val)
    np.testing.assert_array_equal(out2, val)
    # no temp droppings left behind
    leftovers = [p.name for p in tmp_path.iterdir() if ".tmp" in p.name]
    assert leftovers == []
