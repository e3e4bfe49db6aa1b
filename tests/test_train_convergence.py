"""Every-parameter-updates microtest (ref test_vits.py:401-431 pattern):
beyond loss decrease (covered in test_glow_tts.py), assert a few optimizer
steps on one batch move EVERY trainable leaf — catches dead branches."""

import jax
import numpy as np
import optax

from tests.test_glow_tts import _batch, _small_config
from tpu_tts.models.glow_tts import GlowTTS


def test_glow_tts_all_params_update():
    model = GlowTTS(_small_config())
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch()
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        (loss, _), grads = jax.value_and_grad(lambda q: model.loss_fn(q, batch, key), has_aux=True)(p)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    p = params
    for i in range(4):
        p, state, loss = step(p, state, jax.random.PRNGKey(i))
        assert np.isfinite(float(loss))

    moved = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a - b)).max()) > 0, params, p)
    frozen = [jax.tree_util.keystr(k) for k, v in jax.tree_util.tree_leaves_with_path(moved) if not v]
    assert not frozen, f"parameters never updated: {frozen[:10]}"
