"""Numerical parity: reference torch FreeVC → converted flax params.

WavLM is stubbed (zero egress; our content encoder replaces it) — parity is
checked on the paths that consume ssl features / mels directly: the mel
speaker encoder, the posterior bottleneck (enc_p), the flow, and the
decoder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.ref_torch_loader import load_reference, ref_import  # noqa: E402

pytestmark = pytest.mark.skipif(load_reference() is None, reason="reference import failed")


@pytest.fixture(scope="module")
def pair():
    fm = ref_import("TTS.vc.models.freevc")
    cfgmod = ref_import("TTS.vc.configs.freevc_config")
    if fm is None or cfgmod is None:
        pytest.skip("reference freevc not importable")
    import torch

    fm.get_wavlm = lambda *a, **k: torch.nn.Identity()
    torch.manual_seed(0)
    cfg = cfgmod.FreeVCConfig()
    a = cfg.model_args
    a.inter_channels = 32; a.hidden_channels = 32
    a.upsample_rates = [4, 4]; a.upsample_initial_channel = 32
    a.upsample_kernel_sizes = [8, 8]; a.resblock_kernel_sizes = [3]
    a.resblock_dilation_sizes = [[1, 3, 5]]
    a.gin_channels = 16; a.ssl_dim = 24; a.spec_channels = 41
    ref_model = fm.FreeVC(cfg)
    ref_model.eval()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    from tpu_tts.vc.configs import FreeVCConfig
    from tpu_tts.vc.models.freevc import FreeVCArgs, Freevc

    mine = Freevc(FreeVCConfig())
    mine.config.model_args = FreeVCArgs(
        inter_channels=32, hidden_channels=32, upsample_rates=[4, 4],
        upsample_initial_channel=32, upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
        gin_channels=16, ssl_dim=24, spec_channels=41,
    )
    mine.args = mine.config.model_args
    from tpu_tts.vc.models.freevc import FreeVCNet

    mine.net = FreeVCNet(args=tuple(sorted(mine.args.to_dict().items(), key=lambda kv: str(kv[0]))))
    params = mine.convert_torch_state_dict(sd)
    return ref_model, mine, params


def test_speaker_encoder_parity(pair):
    import torch

    ref_model, mine, params = pair
    mel = np.random.default_rng(0).standard_normal((2, 30, 80)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_d = ref_model.enc_spk(torch.from_numpy(mel)).numpy()
    my_d = mine.net.apply(
        {"params": params}, jnp.asarray(mel),
        method=lambda net, m: net.speaker_encoder(m),
    )
    np.testing.assert_allclose(np.asarray(my_d), ref_d, atol=2e-4, rtol=1e-3)


def test_bottleneck_flow_decoder_parity(pair):
    """ssl feats → enc_p stats; z through flow fwd; z → decoder waveform."""
    import torch

    ref_model, mine, params = pair
    rng = np.random.default_rng(1)
    ssl = rng.standard_normal((1, 24, 9)).astype(np.float32)  # [B, C, T]
    lens = torch.tensor([9])
    g = rng.standard_normal((1, 16, 1)).astype(np.float32)
    with torch.no_grad():
        _, ref_m, ref_logs, ref_mask = ref_model.enc_p(torch.from_numpy(ssl), lens)
        ref_zp = ref_model.flow(ref_m, ref_mask, g=torch.from_numpy(g)).numpy()
        ref_wav = ref_model.dec(ref_m, g=torch.from_numpy(g)).numpy()

    def run(net, s, sl, gg):
        _, m, logs, mask = net.enc_p(s, sl)
        zp = net.flow(m, mask, g=gg)
        wav = net.dec(m, g=gg)
        return m, logs, zp, wav

    my_m, my_logs, my_zp, my_wav = mine.net.apply(
        {"params": params},
        jnp.asarray(np.transpose(ssl, (0, 2, 1))), jnp.asarray([9]),
        jnp.asarray(np.transpose(g, (0, 2, 1))),
        method=run, rngs={"posterior": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.transpose(np.asarray(my_m), (0, 2, 1)), ref_m.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.transpose(np.asarray(my_zp), (0, 2, 1)), ref_zp, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.transpose(np.asarray(my_wav), (0, 2, 1)), ref_wav, atol=3e-4, rtol=1e-3)


def test_freevc_wavlm_ingest_and_feature_parity():
    """A checkpoint embedding `wavlm.*` keys must switch the net to the exact
    WavLM content encoder, and the converted content features must match the
    vendored torch WavLM's `extract_features` output."""
    import torch

    wm = ref_import("TTS.vc.models.freevc") and ref_import("TTS.vc.modules.freevc.wavlm.wavlm")
    if wm is None:
        pytest.skip("reference wavlm not importable")
    torch.manual_seed(3)
    wavlm_cfg = dict(
        extractor_mode="layer_norm", encoder_layers=2, encoder_embed_dim=24,
        encoder_ffn_embed_dim=48, encoder_attention_heads=4, layer_norm_first=True,
        conv_feature_layers="[(16,10,5)] + [(16,3,2)] * 2", conv_bias=True,
        conv_pos=16, conv_pos_groups=4, relative_position_embedding=True,
        num_buckets=32, max_distance=64, gru_rel_pos=True,
        encoder_layerdrop=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, dropout_input=0.0, dropout_features=0.0,
    )
    twavlm = wm.WavLM(wm.WavLMConfig(wavlm_cfg))
    twavlm.eval()

    from tpu_tts.vc.configs import FreeVCConfig
    from tpu_tts.vc.models.freevc import FreeVCArgs, Freevc, FreeVCNet

    mine = Freevc(FreeVCConfig())
    mine.config.model_args = FreeVCArgs(
        inter_channels=32, hidden_channels=32, upsample_rates=[4, 4],
        upsample_initial_channel=32, upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
        gin_channels=16, ssl_dim=24, spec_channels=41,
        wavlm_config={
            k: (tuple(tuple(t) for t in eval(v)) if k == "conv_feature_layers" else v)
            for k, v in wavlm_cfg.items()
            if k in __import__("tpu_tts.vc.modules.wavlm", fromlist=["WavLMConfig"]).WavLMConfig.__dataclass_fields__
        },
    )
    mine.args = mine.config.model_args
    mine.net = FreeVCNet(args=tuple(sorted(mine.args.to_dict().items(), key=lambda kv: str(kv[0]))))

    sd = {f"wavlm.{k}": v.detach().numpy() for k, v in twavlm.state_dict().items()}
    params = mine.convert_torch_state_dict(sd)
    assert mine.args.content_encoder_type == "wavlm"

    wav = np.random.default_rng(0).standard_normal((1, 1600)).astype(np.float32) * 0.2
    with torch.no_grad():
        ref_feats, _ = twavlm.extract_features(torch.from_numpy(wav))
    got = np.asarray(
        mine.net.apply(
            {"params": params}, jnp.asarray(wav)[:, :, None],
            method=lambda net, w: net.content_encoder(w),
        )
    )
    np.testing.assert_allclose(got, ref_feats.numpy(), atol=2e-4, rtol=1e-3)
