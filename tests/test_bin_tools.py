"""Smoke tests for the auxiliary CLI tools in tpu_tts/bin (mirror of the
reference's aux tests: tests/aux_tests/test_find_unique_phonemes.py,
tests/bash_tests/test_compute_statistics.sh, bin/resample.py,
bin/remove_silence_using_vad.py, bin/collect_env_info.py)."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import get_tests_data_path
from tests.fixtures import ensure_ljspeech_fixture


@pytest.fixture(scope="module")
def fixture_cfg_path(tmp_path_factory):
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs.glow_tts_config import GlowTTSConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    cfg = GlowTTSConfig(
        text_cleaner="english_cleaners",
        use_phonemes=False,
        phoneme_language="en-us",
        eval_split_size=0.25,
        datasets=[
            BaseDatasetConfig(
                formatter="ljspeech", meta_file_train="metadata.csv", path=fixture, dataset_name="fix"
            )
        ],
    )
    cfg.audio.mel_fmax = 8000.0
    path = str(tmp_path_factory.mktemp("cfg") / "config.json")
    cfg.save_json(path)
    return path


def test_compute_statistics(fixture_cfg_path, tmp_path):
    from tpu_tts.bin.compute_statistics import main

    out = str(tmp_path / "scale_stats.npy")
    main(["--config_path", fixture_cfg_path, "--out_path", out])
    stats = np.load(out, allow_pickle=True).item()
    for key in ("mel_mean", "mel_std", "linear_mean", "linear_std"):
        assert key in stats
        assert np.isfinite(stats[key]).all()


def test_find_unique_chars(fixture_cfg_path, capsys):
    from tpu_tts.bin.find_unique_chars import main

    main(["--config_path", fixture_cfg_path])
    out = capsys.readouterr().out
    assert "unique characters" in out.lower()


def test_find_unique_phonemes(fixture_cfg_path, capsys):
    from tpu_tts.bin.find_unique_phonemes import main

    main(["--config_path", fixture_cfg_path])
    out = capsys.readouterr().out
    assert "phoneme" in out.lower()


def test_resample(tmp_path):
    from tpu_tts.audio.numpy_transforms import save_wav
    from tpu_tts.bin.resample import main

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    sr = 22050
    t = np.linspace(0, 0.25, int(sr * 0.25), endpoint=False)
    save_wav(wav=(0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), path=str(in_dir / "a.wav"), sample_rate=sr)
    out_dir = str(tmp_path / "out")
    main(["--input_dir", str(in_dir), "--output_dir", out_dir, "--output_sr", "16000", "--n_jobs", "1"])
    files = glob.glob(os.path.join(out_dir, "*.wav"))
    assert len(files) == 1
    import wave

    with wave.open(files[0]) as w:
        assert w.getframerate() == 16000
        assert abs(w.getnframes() - 4000) <= 2


def test_remove_silence_using_vad(tmp_path):
    from tpu_tts.audio.numpy_transforms import save_wav
    from tpu_tts.bin.remove_silence_using_vad import main

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    sr = 16000
    tone = 0.4 * np.sin(2 * np.pi * 440 * np.linspace(0, 0.5, sr // 2, endpoint=False))
    wav = np.concatenate([np.zeros(sr // 2), tone, np.zeros(sr // 2)]).astype(np.float32)
    save_wav(wav=wav, path=str(in_dir / "a.wav"), sample_rate=sr)
    out_dir = str(tmp_path / "out")
    main(["-i", str(in_dir), "-o", out_dir, "--num_processes", "1"])
    files = glob.glob(os.path.join(out_dir, "**/*.wav"), recursive=True)
    assert len(files) == 1
    import wave

    with wave.open(files[0]) as w:
        # leading/trailing silence trimmed: strictly shorter than the input
        assert w.getnframes() < len(wav)
        assert w.getnframes() >= len(tone) // 2


def test_collect_env_info(capsys):
    from tpu_tts.bin.collect_env_info import main

    main([])
    out = capsys.readouterr().out
    assert "jax" in out.lower()


def test_vad_adaptive_noise_floor():
    """The VAD must find speech embedded in stationary noise (the case the
    old peak-relative energy gate failed; ref Silero handles it natively)."""
    import numpy as np

    from tpu_tts.utils.vad import get_speech_timestamps

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    speech = sum(
        (0.4 / h) * np.sin(2 * np.pi * 180 * h * t + rng.uniform(0, 6)) for h in range(1, 6)
    ) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    noise = 0.02 * rng.standard_normal(2 * sr)
    noisy = noise.copy()
    noisy[sr // 2 : sr // 2 + sr] += speech
    segs = get_speech_timestamps(noisy, sample_rate=sr)
    assert segs, "no speech found in noise"
    assert abs(segs[0]["start"] - sr // 2) < sr // 6
    assert abs(segs[-1]["end"] - (sr // 2 + sr)) < sr // 6
    assert not get_speech_timestamps(noise, sample_rate=sr), "pure noise flagged as speech"


def test_prepare_voxceleb(tmp_path, capsys):
    """bin/prepare_voxceleb.py writes the reference's 4-column TSV
    (ref TTS/encoder/utils/prepare_voxceleb.py:183) from an extracted
    subset tree, with speaker ids shared across subsets."""
    import wave as wave_mod

    from tpu_tts.bin.prepare_voxceleb import main

    def _make_wav(path, n=160):
        path.parent.mkdir(parents=True, exist_ok=True)
        with wave_mod.open(str(path), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(b"\x00\x01" * n)

    for spk, vid, clip in [("id001", "vidA", "00001"), ("id001", "vidA", "00002"),
                           ("id002", "vidB", "00001")]:
        _make_wav(tmp_path / "vox1_dev_wav" / spk / vid / f"{clip}.wav")
    _make_wav(tmp_path / "vox1_test_wav" / "id003" / "vidC" / "00001.wav", n=80)

    main([str(tmp_path), "--subsets", "vox1_dev_wav", "vox1_test_wav"])

    import csv as csv_mod

    with open(tmp_path / "vox1_dev_wav.csv") as f:
        rows = list(csv_mod.reader(f, delimiter="\t"))
    assert rows[0] == ["wav_filename", "wav_length_ms", "speaker_id", "speaker_name"]
    assert len(rows) == 4
    assert [r[3] for r in rows[1:]] == ["id001", "id001", "id002"]
    assert [r[2] for r in rows[1:]] == ["0", "0", "1"]
    assert all(r[1] == "160" for r in rows[1:])  # reference stores SAMPLES here
    with open(tmp_path / "vox1_test_wav.csv") as f:
        rows2 = list(csv_mod.reader(f, delimiter="\t"))
    assert rows2[1][2] == "2"  # id dict shared across subsets
    assert rows2[1][1] == "80"

    # idempotent: existing CSV short-circuits unless --force
    main([str(tmp_path), "--subsets", "vox1_dev_wav"])
    # skip-existing still reserves the skipped subset's ids: delete only the
    # test CSV and re-run both — test ids must continue after dev's, not
    # restart from 0 (code-review r4 finding)
    (tmp_path / "vox1_test_wav.csv").unlink()
    main([str(tmp_path), "--subsets", "vox1_dev_wav", "vox1_test_wav"])
    with open(tmp_path / "vox1_test_wav.csv") as f:
        rows3 = list(csv_mod.reader(f, delimiter="\t"))
    assert rows3[1][2] == "2", f"ids collided after skip: {rows3}"
    # order-independent: rebuild only DEV while TEST's csv exists — the
    # pre-scan of ALL existing CSVs must keep dev's fresh ids DISJOINT from
    # test's (dev's old ids went away with its deleted CSV; what matters is
    # that a joint load of both CSVs never merges distinct speakers)
    (tmp_path / "vox1_dev_wav.csv").unlink()
    main([str(tmp_path), "--subsets", "vox1_dev_wav"])
    with open(tmp_path / "vox1_dev_wav.csv") as f:
        rows4 = list(csv_mod.reader(f, delimiter="\t"))
    dev_ids = {r[2] for r in rows4[1:]}
    assert len(dev_ids) == 2 and "2" not in dev_ids, rows4
    # --download is gated in this offline build
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main([str(tmp_path), "--download"])
