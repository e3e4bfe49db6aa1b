"""CMUDict + XTTS fine-tune demo utils (ref tts/utils/text/cmudict.py,
demos/xtts_ft_demo/)."""

import io
import os

import pytest


def test_cmudict_parse_and_lookup():
    from tpu_tts.text.cmudict import CMUDict, VALID_SYMBOLS

    data = io.StringIO("HELLO  HH AH0 L OW1\nHELLO(1)  HH EH0 L OW1\nWORLD  W ER1 L D\n;;; comment\n")
    d = CMUDict(data)
    assert len(d) == 2
    assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
    assert d.lookup("missing") is None
    assert CMUDict.get_arpabet("world!", d, "!?.") == "{W ER1 L D}!"
    assert CMUDict.get_arpabet("unknown", d, "!?.") == "unknown"
    assert "AH0" in VALID_SYMBOLS and "ZH" in VALID_SYMBOLS


def test_cmudict_drop_ambiguous():
    from tpu_tts.text.cmudict import CMUDict

    data = io.StringIO("HELLO  HH AH0 L OW1\nHELLO(1)  HH EH0 L OW1\nWORLD  W ER1 L D\n")
    d = CMUDict(data, keep_ambiguous=False)
    assert d.lookup("hello") is None and d.lookup("world")


def test_demo_formatter_metadata(tmp_path):
    from tpu_tts.demos.xtts_ft_demo.utils.formatter import list_audios, write_metadata

    (tmp_path / "a.wav").write_bytes(b"")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.mp3").write_bytes(b"")
    (tmp_path / "c.txt").write_bytes(b"")
    audios = list_audios(str(tmp_path))
    assert len(audios) == 2

    rows = [(f"clip{i}.wav", f"text {i}", "spk") for i in range(10)]
    train_csv, eval_csv = write_metadata(rows, str(tmp_path / "meta"))
    assert os.path.exists(train_csv) and os.path.exists(eval_csv)
    n_train = len(open(train_csv).readlines()) - 1
    n_eval = len(open(eval_csv).readlines()) - 1
    assert n_train + n_eval == 10 and n_eval >= 1


def test_demo_gated_without_packages():
    from tpu_tts.demos.xtts_ft_demo.utils.formatter import format_audio_list
    from tpu_tts.demos.xtts_ft_demo.xtts_demo import main

    try:
        import faster_whisper  # noqa: F401

        has_fw = True
    except ImportError:
        has_fw = False
    if not has_fw:
        with pytest.raises(RuntimeError):
            format_audio_list(["x.wav"])
    try:
        import gradio  # noqa: F401

        has_gradio = True
    except ImportError:
        has_gradio = False
    if not has_gradio:
        with pytest.raises(RuntimeError):
            main(["--out_path", "/tmp/x"])
