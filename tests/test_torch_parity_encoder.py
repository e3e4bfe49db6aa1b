"""Numerical parity: reference torch speaker encoders → converted flax."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


def test_lstm_encoder_parity():
    lm = ref_import("TTS.encoder.models.lstm")
    if lm is None:
        pytest.skip("reference lstm encoder not importable")
    import torch

    torch.manual_seed(0)
    ref = lm.LSTMSpeakerEncoder(input_dim=40, proj_dim=64, lstm_dim=128, num_lstm_layers=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from tpu_tts.encoder.encoder_convert import convert_lstm_encoder_state_dict
    from tpu_tts.encoder.models import LSTMSpeakerEncoder

    params = convert_lstm_encoder_state_dict(sd)
    x = np.random.default_rng(0).standard_normal((2, 20, 40)).astype(np.float32)
    with torch.no_grad():  # reference takes [B, D, T]
        ref_d = ref(torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 2, 1)))), l2_norm=True).numpy()
    mine = LSTMSpeakerEncoder(input_dim=40, proj_dim=64, lstm_dim=128, num_lstm_layers=2)
    my_d = np.asarray(mine.apply({"params": params}, jnp.asarray(x), l2_norm=True))
    np.testing.assert_allclose(my_d, ref_d, atol=1e-4, rtol=1e-3)


def test_resnet_encoder_parity():
    rm = ref_import("TTS.encoder.models.resnet")
    if rm is None:
        pytest.skip("reference resnet encoder not importable")
    import torch

    torch.manual_seed(0)
    ref = rm.ResNetSpeakerEncoder(input_dim=40, proj_dim=64, layers=[1, 1, 1, 1])
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from tpu_tts.encoder.encoder_convert import convert_resnet_encoder_state_dict
    from tpu_tts.encoder.models import ResNetSpeakerEncoder

    params = convert_resnet_encoder_state_dict(sd, input_dim=40)
    x = np.random.default_rng(1).standard_normal((2, 40, 48)).astype(np.float32)  # [B, D, T]
    with torch.no_grad():
        ref_d = ref(torch.from_numpy(x), l2_norm=True).numpy()
    mine = ResNetSpeakerEncoder(
        input_dim=40, proj_dim=64, layers=(1, 1, 1, 1), norm_type="frozen_batch"
    )
    my_d = np.asarray(
        mine.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 1))), l2_norm=True)
    )
    np.testing.assert_allclose(my_d, ref_d, atol=2e-4, rtol=1e-3)
