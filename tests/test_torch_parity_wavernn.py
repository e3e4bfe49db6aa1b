"""Numerical parity: reference torch `Wavernn` → our flax WaveRNN via
`convert_wavernn_state_dict` (ref vocoder/models/wavernn.py:223)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


def _build_pair(mode="mold"):
    wr = ref_import("TTS.vocoder.models.wavernn")
    if wr is None:
        pytest.skip("reference wavernn not importable")
    import torch

    from tpu_tts.config.base import Coqpit
    from tpu_tts.vocoder.models.wavernn import Wavernn, WavernnArgs
    from tpu_tts.vocoder.configs.wavegrad_config import WavernnConfig

    args = dict(
        rnn_dims=24,
        fc_dims=24,
        compute_dims=16,
        res_out_dims=16,
        num_res_blocks=2,
        use_aux_net=True,
        use_upsample_net=True,
        upsample_factors=[4, 8, 8],
        mode=mode,
        mulaw=False,
        pad=2,
        feat_dims=20,
    )
    cfg = WavernnConfig(model_args=WavernnArgs(**args))
    cfg.audio.hop_length = int(np.prod(args["upsample_factors"]))
    cfg.audio.num_mels = args["feat_dims"]

    # the reference uses the numpy<2 alias np.cumproduct (wavernn.py:241)
    if not hasattr(wr.np, "cumproduct"):
        wr.np.cumproduct = wr.np.cumprod
    torch.manual_seed(0)
    # reference signature: Wavernn(config) with attribute-style config.model_args
    ref_model = wr.Wavernn(cfg)
    ref_model.eval()
    # randomize BN running stats so frozen-stat folding is actually exercised
    for m in ref_model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.3
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    ours = Wavernn(cfg)
    params = ours.convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    )
    ours.params = params
    return ref_model, ours, args


def test_wavernn_forward_parity():
    import torch

    ref_model, ours, a = _build_pair()
    rng = np.random.RandomState(0)
    B, T_mel = 2, 10
    hop = int(np.prod(a["upsample_factors"]))
    T = (T_mel - 2 * a["pad"]) * hop
    mels = rng.randn(B, a["feat_dims"], T_mel).astype(np.float32)
    x = rng.randn(B, T).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x), torch.from_numpy(mels)).numpy()

    mels_ours = np.transpose(mels, (0, 2, 1))
    ours_out = np.asarray(
        ours.net.apply({"params": ours.params}, jnp.asarray(x), jnp.asarray(mels_ours))
    )
    assert ours_out.shape == ref_out.shape
    np.testing.assert_allclose(ours_out, ref_out, atol=2e-4, rtol=1e-3)


def test_wavernn_upsample_parity():
    import torch

    ref_model, ours, a = _build_pair()
    rng = np.random.RandomState(1)
    B, T_mel = 1, 12
    mels = rng.randn(B, a["feat_dims"], T_mel).astype(np.float32)
    with torch.no_grad():
        ref_up, ref_aux = ref_model.upsample(torch.from_numpy(mels))
    ref_up = ref_up.numpy()  # [B, T, C] (ref transposes before return)
    ref_aux = ref_aux.numpy()
    up, aux = ours.net.apply(
        {"params": ours.params}, jnp.asarray(np.transpose(mels, (0, 2, 1))),
        method=lambda net, m: net.upsample(m),
    )
    np.testing.assert_allclose(np.asarray(up), ref_up, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(aux), ref_aux, atol=1e-5, rtol=1e-4)
