"""Trainer-level bf16 autocast — the model-agnostic `mixed_precision` switch.

The reference gets mixed precision from a *trainer-wide* torch.autocast that
wraps every model's train step (models only add fp32 guards around their
criteria, e.g. ref delightful_tts.py:956,967 and vits.py:1273; recipes flip
`mixed_precision` per model, ref recipes/ljspeech/vits_tts/train_vits.py:38).

The JAX counterpart implemented here: **fp32 master params with a bf16 cast
at the jit boundary**. Inside the jitted step the parameter pytree and the
batch's floating arrays are cast to bf16 before the model forward, so the
matmuls/convs that dominate the step run on the MXU at bf16 rate. The cast is
differentiable — `astype`'s VJP casts the cotangent back — so gradients,
optimizer state, and updates all stay fp32 (master-weight semantics; bf16
needs no loss scaling since it keeps fp32's exponent range).

Loss criteria still compute in fp32: every helper in
`tpu_tts/layers/losses.py` (and the per-model criteria) upcasts its inputs at
the loss boundary (CLAUDE.md invariant), and `autocast_loss_fn`-style callers
additionally upcast the returned scalar defensively.

Models that thread bf16 through *selected* submodules natively (VITS keeps
its text encoder / duration predictor fp32 by design; the hifigan GAN wrapper
passes flax `dtype`) declare `handles_mixed_precision = True` and are left
alone. Models may also pin specific batch keys to fp32 via
`mp_keep_fp32_batch_keys` (e.g. log-domain alignment priors).
"""

from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of `tree` to `dtype`; ints/bools pass
    through untouched (token ids, lengths, step counters)."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def autocast_args(params, batch: Dict, keep_keys: Iterable[str] = ()) -> Tuple:
    """bf16-cast (params, batch) for the model forward. `keep_keys` names
    batch entries that must stay fp32 (loss targets a model wants at full
    precision, log-domain priors, ...)."""
    keep = set(keep_keys or ())
    p16 = cast_floating(params, jnp.bfloat16)
    b16 = {k: (v if k in keep else cast_floating(v, jnp.bfloat16)) for k, v in batch.items()}
    return p16, b16


def autocast_enabled(config, model) -> bool:
    """True when the trainer must apply the generic bf16 autocast: the config
    asks for mixed precision and the model does not handle it natively."""
    if not bool(getattr(config, "mixed_precision", False)):
        return False
    handles = getattr(model, "handles_mixed_precision", False)
    if callable(handles):
        handles = handles()
    return not bool(handles)
