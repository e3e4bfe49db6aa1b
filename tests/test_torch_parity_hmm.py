"""Numerical parity: reference torch NeuralhmmTTS / Overflow → converted
flax params.

The reference encoder uses BatchNorm (→ our frozen_batch variant). Inference
is fully deterministic with sampling_temp=0 + deterministic transitions, so
mel outputs compare exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")

DIMS = dict(
    num_chars=24,
    state_per_phone=2,
    encoder_in_out_features=16,
    out_channels=6,
    prenet_dim=12,
    prenet_n_layers=1,
    prenet_dropout_at_inference=False,
    memory_rnn_dim=10,
    outputnet_size=[14],
    sampling_temp=0.0,
    duration_threshold=0.43,
    max_sampling_time=40,
    # flat start that actually transitions (defaults never advance states on
    # random weights)
    flat_start_params={"mean": 0.0, "std": 1.0, "transition_p": 0.5},
)


def _mk_ref(model_name):
    mm = ref_import(f"TTS.tts.models.{model_name}")
    cm = ref_import(f"TTS.tts.configs.{model_name}_config")
    if mm is None or cm is None:
        pytest.skip(f"reference {model_name} not importable")
    import torch

    torch.manual_seed(3)
    cls = {"neuralhmm_tts": "NeuralhmmTTSConfig", "overflow": "OverflowConfig"}[model_name]
    kwargs = dict(DIMS)
    if model_name == "overflow":
        kwargs.update(
            hidden_channels_dec=12, num_flow_blocks_dec=2, num_block_layers=2,
            dropout_p_dec=0.0, num_splits=4, num_squeeze=2, std_floor=0.01,
        )
    config = getattr(cm, cls)(**kwargs)
    ref_cls = {"neuralhmm_tts": "NeuralhmmTTS", "overflow": "Overflow"}[model_name]
    ref_model = getattr(mm, ref_cls)(config)
    # non-default stats, else preprocess_batch tries to torch.load a stats file
    ref_model.update_mean_std({"mean": 0.3, "std": 1.7})
    ref_model.eval()
    return ref_model, config


def _mk_mine(model_name, config):
    from tpu_tts.config import register_config

    my_config = register_config(model_name)()
    my_config.update({k: v for k, v in DIMS.items()})
    if model_name == "overflow":
        my_config.update(
            dict(hidden_channels_dec=12, num_flow_blocks_dec=2, num_block_layers=2,
                 dropout_p_dec=0.0, num_splits=4, num_squeeze=2, std_floor=0.01)
        )
    from tpu_tts.models.neuralhmm_tts import NeuralhmmTTS
    from tpu_tts.models.overflow import Overflow

    cls = {"neuralhmm_tts": NeuralhmmTTS, "overflow": Overflow}[model_name]
    return cls(my_config)


@pytest.mark.parametrize("model_name", ["neuralhmm_tts", "overflow"])
def test_forward_nll_parity(model_name):
    import torch

    ref_model, config = _mk_ref(model_name)
    mine = _mk_mine(model_name, config)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = mine.convert_torch_state_dict(sd)

    rng = np.random.default_rng(0)
    B, T_en, T_de = 2, 5, 12
    text = rng.integers(1, DIMS["num_chars"], (B, T_en))
    text[:, 0] = 2  # no zeros: ref counts x_lengths as nonzeros
    mels = rng.standard_normal((B, T_de, DIMS["out_channels"])).astype(np.float32)
    text_len = np.array([T_en, T_en - 1], dtype=np.int64)
    mel_len = np.array([T_de, T_de - 2], dtype=np.int64)
    text[1, -1] = 0
    mels[1, -2:] = 0.0

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(text), torch.from_numpy(text_len),
            torch.from_numpy(mels), torch.from_numpy(mel_len),
        )
    ref_ll = ref_out["log_probs"].numpy()

    assert mine.mel_mean == pytest.approx(0.3) and mine.mel_std == pytest.approx(1.7)
    mels_norm = (mels - mine.mel_mean) / mine.mel_std
    out = mine.net.apply(
        {"params": params},
        jnp.asarray(text), jnp.asarray(text_len), jnp.asarray(mels_norm), jnp.asarray(mel_len),
        train=False,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(out["log_likelihood"]), ref_ll, atol=2e-2, rtol=1e-4)


@pytest.mark.parametrize("model_name", ["neuralhmm_tts", "overflow"])
def test_inference_parity(model_name):
    import torch

    ref_model, config = _mk_ref(model_name)
    mine = _mk_mine(model_name, config)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = mine.convert_torch_state_dict(sd)
    mine.params = params

    rng = np.random.default_rng(1)
    T_en = 4
    text = rng.integers(1, DIMS["num_chars"], (1, T_en))
    with torch.no_grad():
        ref_out = ref_model.inference(
            torch.from_numpy(text),
            aux_input={"sampling_temp": 0.0, "max_sampling_time": 40, "duration_threshold": 0.43},
        )
    ref_mel = ref_out["model_outputs"].numpy()
    T_ref = ref_mel.shape[1]

    mine.args.sampling_temp = 0.0
    mine.args.duration_threshold = 0.43
    out = mine.inference(np.asarray(text), max_steps=40)
    my_len = int(out["y_lengths"][0])
    my_mel = np.asarray(out["model_outputs"])[0, :my_len]

    if model_name == "overflow":
        # both sides floor the length to a multiple of num_squeeze
        n = min(my_mel.shape[0], T_ref)
        np.testing.assert_allclose(my_mel[:n], ref_mel[0, :n], atol=5e-3, rtol=1e-3)
    else:
        assert my_len == T_ref, (my_len, T_ref)
        np.testing.assert_allclose(my_mel, ref_mel[0], atol=5e-3, rtol=1e-3)
