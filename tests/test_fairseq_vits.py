"""fairseq-MMS VITS ingest: key rehash + full directory load.

Round-trips the actual reference torch VITS state dict through the inverse
fairseq renaming and asserts `rehash_fairseq_vits_state_dict` recovers the
reference names exactly (semantics of ref TTS/tts/utils/fairseq.py:4), then
loads a synthesized fairseq release directory end-to-end through
`Vits.load_fairseq_checkpoint` (ref vits.py:1727)."""

import json
import os
import re

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402
from tpu_tts.models.vits_convert import (  # noqa: E402
    convert_vits_torch_state_dict,
    rehash_fairseq_vits_state_dict,
)

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

TINY = dict(
    num_chars=30, spec_segment_size=8, hidden_channels=32,
    hidden_channels_ffn_text_encoder=64, num_heads_text_encoder=2,
    num_layers_text_encoder=2, kernel_size_text_encoder=3,
    num_layers_posterior_encoder=2, num_layers_flow=2,
    resblock_type_decoder="2", resblock_kernel_sizes_decoder=[3, 5],
    resblock_dilation_sizes_decoder=[[1, 2], [2, 6]],
    upsample_rates_decoder=[8, 8, 4], upsample_initial_channel_decoder=64,
    upsample_kernel_sizes_decoder=[16, 16, 8], out_channels=513,
)

_DP_INV = {"1": "1", "2": "3", "3": "5", "4": "7"}
_FLOW_INV = {"1": "2", "2": "4", "3": "6"}


def _coqui_to_fairseq_key(k: str) -> str:
    """Inverse of the rehash: reference/coqui names → fairseq-MMS names."""
    if k.startswith("text_encoder."):
        return "enc_p." + k[len("text_encoder."):]
    if k.startswith("waveform_decoder."):
        return "dec." + k[len("waveform_decoder."):]
    if k.startswith("posterior_encoder."):
        return "enc_q." + k[len("posterior_encoder."):]
    m = re.match(r"flow\.flows\.(\d+)\.(.*)$", k)
    if m:
        return f"flow.flows.{_FLOW_INV.get(m.group(1), m.group(1))}.{m.group(2)}"
    m = re.match(r"duration_predictor\.(flows|post_flows)\.(\d+)\.(.*)$", k)
    if m:
        group, idx, rest = m.groups()
        if idx == "0":
            rest = {"translation": "m", "log_scale": "logs"}.get(rest, rest)
            return f"dp.{group}.0.{rest}"
        return f"dp.{group}.{_DP_INV[idx]}.{rest}"
    if k.startswith("duration_predictor."):
        return "dp." + k[len("duration_predictor."):]
    return k


@pytest.fixture(scope="module")
def ref_generator_sd():
    vm = ref_import("TTS.tts.models.vits")
    if vm is None:
        pytest.skip("reference torch VITS not importable")
    import torch

    torch.manual_seed(0)
    ref_model = vm.Vits(vm.VitsArgs(**TINY))
    ref_model.eval()
    return {
        k: v.detach().numpy()
        for k, v in ref_model.state_dict().items()
        if not k.startswith("disc.")
    }


def test_rehash_round_trip(ref_generator_sd):
    fairseq_sd = {_coqui_to_fairseq_key(k): v for k, v in ref_generator_sd.items()}
    assert len(fairseq_sd) == len(ref_generator_sd)
    back = rehash_fairseq_vits_state_dict(fairseq_sd)
    assert set(back) == set(ref_generator_sd)


def test_rehash_weight_norm_oldstyle():
    sd = {
        "dec.conv_pre.weight_g": np.ones((4, 1, 1), np.float32),
        "dec.conv_pre.weight_v": np.ones((4, 2, 3), np.float32),
    }
    out = rehash_fairseq_vits_state_dict(sd)
    assert "waveform_decoder.conv_pre.parametrizations.weight.original0" in out
    assert "waveform_decoder.conv_pre.parametrizations.weight.original1" in out


def test_load_fairseq_dir(tmp_path, ref_generator_sd):
    import torch

    from tpu_tts.configs.vits_config import VitsArgs, VitsConfig
    from tpu_tts.models.vits import Vits

    # synthesize a fairseq-MMS release directory
    fairseq_sd = {
        _coqui_to_fairseq_key(k): torch.from_numpy(np.asarray(v))
        for k, v in ref_generator_sd.items()
    }
    torch.save({"model": fairseq_sd}, tmp_path / "G_100000.pth")
    # MMS-style config.json: data + model sections carry the architecture
    fairseq_cfg = {
        "data": {
            "sampling_rate": 16000,
            "add_blank": True,
            "filter_length": 1024,
            "hop_length": 256,
            "win_length": 1024,
        },
        "model": {
            "inter_channels": TINY["hidden_channels"],
            "filter_channels": TINY["hidden_channels_ffn_text_encoder"],
            "n_heads": TINY["num_heads_text_encoder"],
            "n_layers": TINY["num_layers_text_encoder"],
            "kernel_size": TINY["kernel_size_text_encoder"],
            "resblock": TINY["resblock_type_decoder"],
            "resblock_kernel_sizes": TINY["resblock_kernel_sizes_decoder"],
            "resblock_dilation_sizes": TINY["resblock_dilation_sizes_decoder"],
            "upsample_rates": TINY["upsample_rates_decoder"],
            "upsample_initial_channel": TINY["upsample_initial_channel_decoder"],
            "upsample_kernel_sizes": TINY["upsample_kernel_sizes_decoder"],
            "n_layers_q": TINY["num_layers_posterior_encoder"],
        },
    }
    with open(tmp_path / "config.json", "w", encoding="utf-8") as f:
        json.dump(fairseq_cfg, f)
    symbols = ["_", " "] + [chr(ord("a") + i) for i in range(26)] + ["'", "-"]
    assert len(symbols) == TINY["num_chars"]
    with open(tmp_path / "vocab.txt", "w", encoding="utf-8") as f:
        f.write("\n".join(symbols) + "\n")

    # default config: the architecture must be adopted from the fairseq json
    config = VitsConfig(model_args=VitsArgs(num_layers_flow=TINY["num_layers_flow"]))
    model = Vits.init_from_config(config)
    model.load_fairseq_checkpoint(config, checkpoint_dir=str(tmp_path), eval=True)

    assert model.config.audio["sample_rate"] == 16000
    assert model.tokenizer.characters.num_chars == TINY["num_chars"]
    assert model.tokenizer.characters.blank == "_"
    # converted tree must match the straight coqui-name conversion exactly
    want = convert_vits_torch_state_dict(ref_generator_sd)["generator"]
    got = model.params["generator"]
    flat_want = jax.tree_util.tree_leaves_with_path(want)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(flat_want) == len(flat_got)
    for path, leaf in flat_want:
        np.testing.assert_array_equal(np.asarray(flat_got[path]), np.asarray(leaf))

    # tokenizer end-to-end (blank interspersal per fairseq add_blank)
    ids = model.tokenizer.text_to_ids("ab c")
    assert ids[::2] == [0] * (len(ids) // 2 + 1)

    # inference runs with the rebuilt net
    wav = model.inference(np.asarray(ids, np.int32)[None])
    assert np.asarray(wav["model_outputs"]).ndim == 3
