"""Offline model-zoo manager tests (ref TTS/utils/manage.py; no network).

Covers the catalogue (88 release entries shared with the reference), fairseq
name addressing, and `_update_paths` config rewriting."""

import json
import os

from tpu_tts.zoo.manage import ModelManager


def test_list_models_catalogue():
    m = ModelManager(verbose=False)
    models = m.list_models()
    assert len(models) == 88  # same release set as the reference .models.json
    assert "tts_models/en/ljspeech/vits" in models
    assert "tts_models/multilingual/multi-dataset/xtts_v2" in models
    assert "voice_conversion_models/multilingual/vctk/freevc24" in models
    assert any(s.startswith("vocoder_models/") for s in models)


def test_fairseq_item_addressing():
    m = ModelManager(verbose=False)
    item, full_name, model = m._set_model_item("tts_models/deu/fairseq/vits")
    assert item["model_type"] == "tts_models"
    assert item["github_rls_url"].endswith("deu.tar.gz")
    assert full_name == "tts_models--deu--fairseq--vits"


def test_model_info_by_full_name(capsys):
    m = ModelManager(verbose=False)
    m.model_info_by_full_name("tts_models/en/ljspeech/vits")
    out = capsys.readouterr().out
    assert "license" in out


def test_update_paths_rewrites_aux_files(tmp_path):
    out = tmp_path / "model_dir"
    out.mkdir()
    (out / "speakers.json").write_text("{}")
    (out / "scale_stats.npy").write_text("")
    cfg_path = out / "config.json"
    cfg_path.write_text(json.dumps({
        "audio": {"stats_path": "/old/scale_stats.npy"},
        "d_vector_file": "/old/speakers.json",
        "model_args": {"d_vector_file": "/old/speakers.json"},
    }))
    m = ModelManager(verbose=False, output_prefix=str(tmp_path))
    m._update_paths(str(out), str(cfg_path))
    cfg = json.loads(cfg_path.read_text())
    assert cfg["audio"]["stats_path"] == str(out / "scale_stats.npy")
    assert cfg["d_vector_file"] == str(out / "speakers.json")
    assert cfg["model_args"]["d_vector_file"] == str(out / "speakers.json")


def test_zoo_registry_matches_reference():
    import tpu_tts.zoo

    ours = json.load(open(os.path.join(os.path.dirname(tpu_tts.zoo.__file__), "models.json")))
    ref_path = "/root/reference/TTS/.models.json"
    if not os.path.exists(ref_path):
        return
    ref = json.load(open(ref_path))
    def keys(d):
        return {(t, l, ds, m) for t in d for l in d[t] for ds in d[t][l] for m in d[t][l][ds]}
    assert keys(ours) == keys(ref)
