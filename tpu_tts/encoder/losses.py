"""Speaker-encoder losses: GE2E, AngleProto, SoftmaxAngleProto.

Mirror of /root/reference/TTS/encoder/losses.py (GE2ELoss:7, AngleProtoLoss
:122, SoftmaxAngleProtoLoss). Inputs are `[num_speakers, num_utter, emb_dim]`.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _cosine(a, b, eps=1e-8):
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)


def ge2e_loss(dvecs: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """GE2E softmax-contrast loss. dvecs `[S, U, D]`; (w, b) learned scalars."""
    S, U, D = dvecs.shape
    centroids = jnp.mean(dvecs, axis=1)  # [S, D]
    # exclusive centroids for the own-speaker column
    sums = jnp.sum(dvecs, axis=1, keepdims=True)  # [S,1,D]
    excl = (sums - dvecs) / (U - 1)  # [S,U,D]
    # cos sim matrix [S, U, S]
    cs = _cosine(dvecs[:, :, None, :], centroids[None, None, :, :])
    own = _cosine(dvecs, excl)  # [S, U]
    eye = jnp.eye(S, dtype=bool)[:, None, :]
    cs = jnp.where(eye, own[:, :, None], cs)
    sim = jnp.abs(w) * cs + b
    # softmax loss: -sim[own] + logsumexp over speakers
    target = jnp.arange(S)[:, None]
    logp = jax.nn.log_softmax(sim, axis=-1)
    own_logp = jnp.take_along_axis(logp, jnp.broadcast_to(target[:, :, None], (S, U, 1)), axis=-1)
    return -jnp.mean(own_logp)


def angle_proto_loss(dvecs: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angular prototypical loss: query = last utterance, anchor = mean of the
    rest (ref losses.py:122)."""
    S, U, D = dvecs.shape
    anchor = jnp.mean(dvecs[:, :-1], axis=1)  # [S, D]
    query = dvecs[:, -1]  # [S, D]
    cs = _cosine(query[:, None, :], anchor[None, :, :])  # [S, S]
    sim = jnp.clip(jnp.abs(w), 1e-6) * cs + b
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(jnp.diag(logp))


def softmax_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(
        jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=-1)
    )


def softmax_angle_proto_loss(dvecs, w, b, logits, labels) -> jnp.ndarray:
    return angle_proto_loss(dvecs, w, b) + softmax_loss(logits, labels)
