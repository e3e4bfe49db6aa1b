import jax
import numpy as np
import pytest

from tpu_tts.config import register_config
from tpu_tts.vc.models import setup_model
from tpu_tts.vc.models.freevc import FreeVCArgs


def test_freevc_voice_conversion():
    cfg = register_config("freevc")()
    cfg.model_args = FreeVCArgs(
        spec_channels=129, inter_channels=16, hidden_channels=16, n_layers=2, n_flows=1,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8], upsample_initial_channel=16,
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]], resblock="2",
        gin_channels=16, ssl_dim=32, content_encoder_layers=1, content_encoder_heads=2,
    )
    m = setup_model(cfg)
    m.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    src = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    tgt = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    out = m.voice_conversion(src, tgt)
    assert out.ndim == 1 and len(out) > 100
    assert np.isfinite(out).all()
    # different target speaker -> different output
    tgt2 = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    out2 = m.voice_conversion(src, tgt2)
    n = min(len(out), len(out2))
    assert not np.allclose(out[:n], out2[:n])
