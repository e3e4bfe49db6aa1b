import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.config import register_config
from tpu_tts.models import setup_model


def _batch():
    rng = np.random.default_rng(0)
    return {
        "text_input": jnp.asarray(rng.integers(1, 30, (2, 5)), dtype=jnp.int32),
        "text_lengths": jnp.array([5, 4], dtype=jnp.int32),
        "mel_input": jnp.asarray(rng.standard_normal((2, 12, 80)), dtype=jnp.float32),
        "mel_lengths": jnp.array([12, 10], dtype=jnp.int32),
    }


def _small(name):
    cfg = register_config(name)(text_cleaner="basic_cleaners")
    cfg.model_args.encoder_dim = 32
    cfg.model_args.memory_rnn_dim = 32
    cfg.model_args.outputnet_size = (32,)
    cfg.model_args.prenet_dims = (16, 16)
    if name == "overflow":
        cfg.model_args.hidden_channels_dec = 16
        cfg.model_args.num_flow_blocks_dec = 2
        cfg.model_args.num_block_layers = 1
    cfg.audio.mel_fmax = 8000.0
    m = setup_model(cfg)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.mark.parametrize("name", ["neuralhmm_tts", "overflow"])
def test_hmm_models_train_and_infer(name):
    import optax

    m = _small(name)
    batch = _batch()
    loss, _ = m.loss_fn(m.params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: m.loss_fn(p, batch, jax.random.PRNGKey(1))[0])(m.params)
    assert float(optax.global_norm(grads)) > 0
    out = m.inference(np.arange(1, 6, dtype=np.int32), max_steps=24)
    mel = np.asarray(out["model_outputs"])
    assert mel.shape[2] == 80 and np.isfinite(mel).all()


def test_hmm_likelihood_sane():
    """NLL of data drawn from the flat-start prior should beat far-off data."""
    m = _small("neuralhmm_tts")
    batch = _batch()
    loss_near, _ = m.loss_fn(m.params, batch, jax.random.PRNGKey(1))
    far = dict(batch, mel_input=batch["mel_input"] + 100.0)
    loss_far, _ = m.loss_fn(m.params, far, jax.random.PRNGKey(1))
    assert float(loss_far) > float(loss_near)


def test_hmm_mel_statistics_compute_load_and_normalize(tmp_path):
    """on_init_start computes dataset statistics, rebuilds the flat start at
    N(0,1) with the data transition prob, and loss/inference use them
    (ref tts/models/neuralhmm_tts.py:263)."""
    from tpu_tts.models.neuralhmm_tts import _load_statistics, _save_statistics

    m = _small("neuralhmm_tts")
    batch = _batch()

    class _T:  # minimal trainer stand-in for the hook
        config = m.config
        assets = {}
        train_samples = [1, 2]

    m.config.mel_statistics_parameter_path = str(tmp_path / "stats.json")
    loader = [
        {k: np.asarray(v) for k, v in dict(batch, mel_input=batch["mel_input"] + 3.0).items()}
    ]
    m.get_data_loader = lambda *a, **k: loader
    m.on_init_start(_T())
    assert abs(m.mel_mean - 3.0) < 0.2
    assert m.params is None  # forces re-init with the new flat start
    assert m.args.flat_start_params["mean"] == 0.0
    # transition prob = state_per_phone / avg frames-per-state
    assert 0 < m.args.flat_start_params["transition_p"] < 1

    m.init_params(jax.random.PRNGKey(0))
    shifted = dict(batch, mel_input=batch["mel_input"] + 3.0)
    loss_norm, _ = m.loss_fn(m.params, shifted, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss_norm))
    out = m.inference(np.arange(1, 6, dtype=np.int32), max_steps=8)
    assert np.isfinite(np.asarray(out["model_outputs"])).all()

    # round-trips through both file formats
    stats = _load_statistics(m.config.mel_statistics_parameter_path)
    pt = str(tmp_path / "stats.pt")
    _save_statistics(pt, stats)
    assert _load_statistics(pt)["mean"] == pytest.approx(stats["mean"])

    # a second model loads the saved statistics instead of recomputing
    m2 = _small("neuralhmm_tts")
    m2.config.mel_statistics_parameter_path = m.config.mel_statistics_parameter_path
    m2.get_data_loader = lambda *a, **k: (_ for _ in ()).throw(AssertionError("should load, not compute"))
    m2.on_init_start(_T())
    assert m2.mel_mean == pytest.approx(m.mel_mean)


def test_hmm_statistics_hook_tolerates_no_managers():
    """super().on_init_start (speakers/language persistence) must no-op for
    single-speaker HMM models."""
    m = _small("neuralhmm_tts")

    class _T:
        config = m.config
        assets = {}
        train_samples = [1]
        output_path = "/tmp/nhmm_hook_out"

    m.config.mel_statistics_parameter_path = None
    m.on_init_start(_T())  # no statistics path → returns after super()
