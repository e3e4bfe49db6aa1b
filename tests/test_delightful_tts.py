"""DelightfulTTS tests (ref tts/models/delightful_tts.py, tests/tts_tests2/
test_delightful_tts*.py)."""

import jax
import numpy as np
import pytest


def _tiny_config():
    from tpu_tts.configs import DelightfulTTSConfig

    cfg = DelightfulTTSConfig()
    ma = cfg.model_args
    ma.n_hidden_conformer_encoder = 32
    ma.n_layers_conformer_encoder = 1
    ma.n_heads_conformer_encoder = 2
    ma.n_hidden_conformer_decoder = 32
    ma.n_layers_conformer_decoder = 1
    ma.n_heads_conformer_decoder = 2
    ma.n_hidden_variance_adaptor = 32
    ma.bottleneck_size_u_reference_encoder = 32
    ma.ref_enc_filters_reference_encoder = [4, 4, 8, 8, 16, 16]
    ma.ref_enc_gru_size_reference_encoder = 8
    ma.token_num_reference_encoder = 4
    ma.spec_segment_size = 8
    cfg.vocoder.upsample_initial_channel_decoder = 32
    cfg.vocoder.resblock_kernel_sizes_decoder = [3]
    cfg.vocoder.resblock_dilation_sizes_decoder = [[1, 3]]
    cfg.audio.num_mels = 20
    cfg.audio.do_trim_silence = False
    # one small STFT scale instead of (1024, 2048, 512): the multi-scale loss
    # bases dominated XLA:CPU compile time of every delightful train-path test
    cfg.multi_scale_stft_loss_params = {
        "n_ffts": [256], "hop_lengths": [64], "win_lengths": [256]
    }
    return cfg


def _model(cfg):
    from tpu_tts.audio import AudioProcessor
    from tpu_tts.models.delightful_tts import DelightfulTTS
    from tpu_tts.text.tokenizer import TTSTokenizer

    ap = AudioProcessor.init_from_config(cfg)
    tok, cfg = TTSTokenizer.init_from_config(cfg)
    return DelightfulTTS(cfg, ap=ap, tokenizer=tok)


def _batch(cfg, B=2, T_src=8, T_mel=16, with_priors=False):
    hop = cfg.audio.hop_length
    rng = np.random.default_rng(0)
    batch = {
        "text_input": rng.integers(1, 20, (B, T_src)).astype(np.int32),
        "text_lengths": np.array([T_src, T_src - 2], dtype=np.int32),
        "mel_lengths": np.array([T_mel, T_mel - 4], dtype=np.int32),
        "waveform": (rng.standard_normal((B, T_mel * hop, 1)) * 0.1).astype(np.float32),
        "pitch": np.abs(rng.standard_normal((B, T_mel))).astype(np.float32),
    }
    if with_priors:
        from tpu_tts.ops.helpers import compute_attn_prior

        priors = np.zeros((B, T_mel, T_src), dtype=np.float32)
        for i in range(B):
            p = compute_attn_prior(int(batch["text_lengths"][i]), int(batch["mel_lengths"][i]))
            priors[i, : p.shape[0], : p.shape[1]] = p
        batch["attn_priors"] = priors
    return batch


def test_delightful_gan_losses_and_inference():
    cfg = _tiny_config()
    model = _model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params.keys()) == {"generator", "discriminator"}
    batch = _batch(cfg, with_priors=True)
    loss_d, logs_d = model.loss_fn(params, batch, jax.random.PRNGKey(1), optimizer_idx=0)
    assert np.isfinite(float(loss_d))
    loss_g, logs_g = model.loss_fn(params, batch, jax.random.PRNGKey(2), optimizer_idx=1)
    assert np.isfinite(float(loss_g))
    for k in (
        "loss_mel", "loss_duration", "loss_pitch", "loss_energy", "loss_aligner",
        "loss_u_prosody", "loss_p_prosody", "vocoder_loss_gen", "vocoder_loss_feat",
        "vocoder_loss_mel", "vocoder_loss_stft_mg", "vocoder_loss_stft_sc",
    ):
        assert np.isfinite(float(logs_g[k])), k

    ids = model.tokenizer.text_to_ids("hello world")
    out = model.inference(np.asarray(ids, dtype=np.int32))
    wav = out["model_outputs"]
    assert wav.ndim == 3 and wav.shape[0] == 1
    assert np.isfinite(wav).all()
    # duration-driven length: wav trimmed to predicted frames * hop
    assert wav.shape[1] % cfg.audio.hop_length == 0


def test_delightful_grads_flow_both_partitions():
    cfg = _tiny_config()
    model = _model(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(cfg)

    # jit: the eager conformer+GAN backward dispatches thousands of ops on
    # XLA:CPU (this test was the r4 suite's slowest at 255 s)
    gd = jax.jit(jax.grad(lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1), 0)[0]))(params)
    d_norm = sum(float(np.abs(x).sum()) for x in jax.tree.leaves(gd["discriminator"]))
    assert d_norm > 0.0
    gg = jax.jit(jax.grad(lambda p: model.loss_fn(p, batch, jax.random.PRNGKey(1), 1)[0]))(params)
    g_norm = sum(float(np.abs(x).sum()) for x in jax.tree.leaves(gg["generator"]))
    assert g_norm > 0.0
    # discriminator grads are zero in the generator pass (stop_gradient)
    dg_norm = sum(float(np.abs(x).sum()) for x in jax.tree.leaves(gg["discriminator"]))
    assert dg_norm == 0.0


def test_delightful_setup_model_registry():
    from tpu_tts.models import setup_model

    cfg = _tiny_config()
    model = setup_model(cfg)
    assert type(model).__name__ == "DelightfulTTS"


def test_dataset_attn_priors():
    from tests.conftest import get_tests_data_path
    from tests.fixtures import ensure_ljspeech_fixture
    from tpu_tts.data.dataset import TTSDataset, TTSDataLoader
    from tpu_tts.data import load_tts_samples
    from tpu_tts.audio import AudioProcessor
    from tpu_tts.text.tokenizer import TTSTokenizer
    from tpu_tts.config.shared_configs import BaseDatasetConfig
    from tpu_tts.configs import DelightfulTTSConfig

    fixture = ensure_ljspeech_fixture(get_tests_data_path())
    cfg = _tiny_config()
    cfg.datasets = [BaseDatasetConfig(formatter="ljspeech", meta_file_train="metadata.csv", path=fixture)]
    samples, _ = load_tts_samples(cfg.datasets, eval_split=False)
    ap = AudioProcessor.init_from_config(cfg)
    tok, cfg = TTSTokenizer.init_from_config(cfg)
    ds = TTSDataset(ap=ap, samples=samples, tokenizer=tok, use_attn_prior=True, compute_f0=False, return_wav=True)
    loader = TTSDataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    batch = next(iter(loader))
    priors = batch["attn_priors"]
    assert priors.shape[0] == 2
    assert priors.shape[1] == batch["mel_input"].shape[1]
    assert priors.shape[2] == batch["text_input"].shape[1]
    # each valid mel frame's prior row sums to ~1
    assert abs(priors[0, 0].sum() - 1.0) < 1e-3
