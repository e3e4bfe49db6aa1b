import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_tts.ops import helpers as H
from tpu_tts.ops import mas


def test_sequence_mask():
    m = np.asarray(H.sequence_mask(jnp.array([2, 4, 1]), 5))
    assert m.shape == (3, 5)
    assert m.sum(1).tolist() == [2, 4, 1]
    assert m[0, :2].all() and not m[0, 2:].any()


def test_segment_and_rand_segments():
    x = jnp.arange(2 * 3 * 10, dtype=jnp.float32).reshape(2, 3, 10)
    seg = np.asarray(H.segment(x, jnp.array([0, 4]), 4))
    assert seg.shape == (2, 3, 4)
    np.testing.assert_allclose(seg[0], np.asarray(x)[0, :, 0:4])
    np.testing.assert_allclose(seg[1], np.asarray(x)[1, :, 4:8])

    rng = jax.random.PRNGKey(0)
    segs, idx = H.rand_segments(rng, x, jnp.array([10, 6]), segment_size=4)
    assert segs.shape == (2, 3, 4)
    assert (np.asarray(idx) <= np.array([6, 2])).all()


def test_generate_path():
    durs = jnp.array([[2, 3, 1]])
    x_mask = H.sequence_mask(jnp.array([3]), 3).astype(jnp.float32)
    y_mask = H.sequence_mask(jnp.array([6]), 6).astype(jnp.float32)
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = np.asarray(H.generate_path(durs, attn_mask))
    assert path.shape == (1, 3, 6)
    # each mel frame aligned to exactly one phoneme; durations respected
    assert path.sum(1).tolist() == [[1, 1, 1, 1, 1, 1]]
    assert path[0, 0].tolist() == [1, 1, 0, 0, 0, 0]
    assert path[0, 1].tolist() == [0, 0, 1, 1, 1, 0]
    assert path[0, 2].tolist() == [0, 0, 0, 0, 0, 1]


def test_average_over_durations():
    vals = jnp.array([[[1.0, 1.0, 2.0, 2.0, 2.0, 6.0]]])  # [1,1,6]
    durs = jnp.array([[2, 3, 1]])
    avg = np.asarray(H.average_over_durations(vals, durs))
    np.testing.assert_allclose(avg[0, 0], [1.0, 2.0, 6.0])


def _rand_logp(rng, b, tx, ty, tx_lens, ty_lens):
    value = rng.standard_normal((b, tx, ty)).astype(np.float32)
    mask = np.zeros((b, tx, ty), dtype=np.float32)
    for i in range(b):
        mask[i, : tx_lens[i], : ty_lens[i]] = 1.0
    return value, mask


@pytest.mark.parametrize("backend", ["cpp", "jax"])
def test_mas_matches_numpy(backend, rng):
    b, tx, ty = 3, 7, 15
    tx_lens = [7, 5, 3]
    ty_lens = [15, 11, 7]
    value, mask = _rand_logp(rng, b, tx, ty, tx_lens, ty_lens)
    ref = mas.maximum_path_numpy(value.copy(), mask.copy())
    if backend == "cpp":
        out = mas.maximum_path_cpp(value.copy(), mask.copy())
    else:
        out = np.asarray(mas.maximum_path_jax(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(out, ref)


def test_mas_path_is_valid_monotonic(rng):
    b, tx, ty = 2, 6, 12
    value, mask = _rand_logp(rng, b, tx, ty, [6, 4], [12, 9])
    path = mas.maximum_path_numpy(value, mask)
    for i, (txl, tyl) in enumerate(zip([6, 4], [12, 9])):
        p = path[i, :txl, :tyl]
        # one phoneme per frame
        assert (p.sum(0) == 1).all()
        # monotonic non-decreasing alignment
        idx = p.argmax(0)
        assert (np.diff(idx) >= 0).all()
        assert (np.diff(idx) <= 1).all()
        # endpoints
        assert idx[0] == 0 and idx[-1] == txl - 1


def test_mas_jax_jittable(rng):
    value, mask = _rand_logp(rng, 2, 5, 9, [5, 4], [9, 6])
    f = jax.jit(mas.maximum_path_jax)
    out = np.asarray(f(jnp.asarray(value), jnp.asarray(mask)))
    ref = mas.maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(out, ref)


def test_mas_large_stress(rng):
    # realistic VITS shapes
    b, tx, ty = 4, 120, 400
    tx_lens = [120, 90, 60, 30]
    ty_lens = [400, 350, 220, 100]
    value, mask = _rand_logp(rng, b, tx, ty, tx_lens, ty_lens)
    ref = mas.maximum_path_numpy(value.copy(), mask.copy())
    out_cpp = mas.maximum_path_cpp(value.copy(), mask.copy())
    out_jax = np.asarray(mas.maximum_path_jax(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(out_cpp, ref)
    np.testing.assert_array_equal(out_jax, ref)


def test_beta_binomial_prior():
    prior = H.beta_binomial_prior_distribution(10, 20)
    assert prior.shape == (20, 10)
    # support is 0..P but reference evaluates 0..P-1 — rows sum to <= 1
    assert (prior.sum(1) <= 1.0 + 1e-6).all() and (prior.sum(1) > 0.3).all()
    # ridge moves forward in time (diagonal prior)
    peaks = prior.argmax(1)
    assert (np.diff(peaks) >= 0).all()
