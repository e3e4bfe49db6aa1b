"""Optimizers & LR schedules (optax).

Replaces the reference's torch optimizers (`RAdam` TTS/utils/radam.py:9,
`NoamLR` from the trainer package) with optax equivalents. `get_optimizer`
returns an `optax.GradientTransformation` with grad clipping and NaN-step
protection already composed in.
"""

from typing import Any, Callable, Dict, NamedTuple, Optional, Union

import optax


def noam_schedule(base_lr: float, warmup_steps: int = 4000) -> Callable[[int], float]:
    """NoamLR: lr · warmup^0.5 · min(step·warmup^-1.5, step^-0.5)."""

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        return base_lr * (warmup_steps**0.5) * jnp.minimum(s * warmup_steps**-1.5, s**-0.5)

    return schedule


def exponential_decay_schedule(base_lr: float, gamma: float, last_epoch_steps: int = 1) -> Callable[[int], float]:
    return optax.exponential_decay(base_lr, transition_steps=last_epoch_steps, decay_rate=gamma)


def get_scheduler(name: Optional[str], params: Dict, base_lr: float) -> Union[float, Callable]:
    if name is None:
        return base_lr
    name = name.lower().replace("lr", "")
    if name in ("noam", "noamlr"):
        return noam_schedule(base_lr, params.get("warmup_steps", 4000))
    if name in ("exponential", "exponentialdecay", "exponential_decay"):
        return exponential_decay_schedule(base_lr, params.get("gamma", 0.5), params.get("decay_steps", 10000))
    if name in ("steplr", "step"):
        return optax.exponential_decay(
            base_lr,
            transition_steps=params.get("step_size", 10000),
            decay_rate=params.get("gamma", 0.5),
            staircase=True,
        )
    if name in ("cosine", "cosinedecay"):
        return optax.cosine_decay_schedule(base_lr, params.get("decay_steps", 100000))
    if name in ("stepwisegradual",):  # "StepwiseGradualLR" with the LR suffix stripped
        # piecewise-constant lr from [[step, lr], ...] (trainer StepwiseGradualLR,
        # used by the Capacitron recipes)
        rates = sorted((int(s), float(r)) for s, r in (params.get("gradual_learning_rates") or [[0, base_lr]]))
        init = rates[0][1] if rates[0][0] <= 0 else base_lr
        later = [(s, r) for s, r in rates if s > 0]
        return optax.join_schedules(
            [optax.constant_schedule(init)] + [optax.constant_schedule(r) for _, r in later],
            [s for s, _ in later],
        )
    raise ValueError(f" [!] Unknown lr scheduler {name}")


def get_optimizer(
    name: str,
    params: Dict[str, Any],
    lr: Union[float, Callable],
    config=None,
    schedule: Optional[Union[float, Callable]] = None,
    optimizer_idx: Optional[int] = None,
) -> optax.GradientTransformation:
    """Build an optax optimizer by (reference) name with clip + NaN guard.

    `optimizer_idx` selects the per-optimizer entry when `config.grad_clip`
    is a list (ref vits_config.py:115 `grad_clip: List = [1000, 1000]` —
    index 0 clips D, index 1 clips G)."""
    name = (name or "adam").lower()
    params = dict(params or {})
    betas = params.pop("betas", (0.9, 0.999))
    weight_decay = params.pop("weight_decay", 0.0)
    eps = params.pop("eps", 1e-8)
    lr_arg = schedule if schedule is not None else lr
    if name in ("radam",):
        tx = optax.radam(lr_arg, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name in ("adam",):
        tx = optax.adam(lr_arg, b1=betas[0], b2=betas[1], eps=eps)
    elif name in ("adamw",):
        tx = optax.adamw(lr_arg, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    elif name in ("sgd",):
        tx = optax.sgd(lr_arg, momentum=params.pop("momentum", 0.0))
    elif name in ("rmsprop",):
        tx = optax.rmsprop(lr_arg, decay=params.pop("alpha", 0.9), eps=eps)
    else:
        raise ValueError(f" [!] Unknown optimizer {name}")

    grad_clip = getattr(config, "grad_clip", 0.0) if config is not None else 0.0
    if isinstance(grad_clip, (list, tuple)):
        if optimizer_idx is not None and optimizer_idx < len(grad_clip):
            grad_clip = grad_clip[optimizer_idx]
        else:
            grad_clip = max(grad_clip) if grad_clip else 0.0
    chain = []
    if grad_clip and grad_clip > 0:
        chain.append(optax.clip_by_global_norm(float(grad_clip)))
    chain.append(tx)
    tx = optax.chain(*chain)
    # skip non-finite updates (reference `check_update` NaN-grad skip,
    # TTS/utils/training.py:5) — branchless variant, see apply_if_finite_select
    return apply_if_finite_select(tx)


class ApplyIfFiniteSelectState(NamedTuple):
    notfinite_count: Any  # i32 scalar: consecutive non-finite steps seen
    inner_state: Any


def apply_if_finite_select(
    tx: optax.GradientTransformation, mode: Optional[str] = None
) -> optax.GradientTransformation:
    """NaN-step guard (reference `check_update` semantics, TTS/utils/
    training.py:5): a non-finite gradient leaves params and optimizer state
    untouched. Two numerically identical implementations, chosen per backend:

    - "select" (TPU default): ALWAYS compute the inner update and select it
      (or a zero update / the old state) with per-leaf `jnp.where`. On TPU
      the `lax.cond` regions around the whole optimizer update were the two
      largest kernels of the fused VITS GAN step (~7% of step time,
      scripts/profile_vits_train.py) because XLA cannot fuse across a
      conditional or overlap it with the backward; the select variant lets
      the adam/clip elementwise chains fuse into neighboring work (+3%).
      `jnp.where` is elementwise, so NaNs in the discarded update do not
      propagate.
    - "cond" (CPU default): one `lax.cond` around the inner update. The
      ~1400 per-leaf selects of the other variant blow XLA:CPU's compile
      time up 17 s → 143 s on the full VITS generator step (measured on the
      r3 suite's top offender, test_fused_gan_step_matches_sequential);
      XLA:CPU handles the conditional fine and the runtime argument for the
      select is TPU-specific.

    Both share `ApplyIfFiniteSelectState`, so checkpoints restore across
    backends."""
    import jax
    import jax.numpy as jnp

    if mode is None:
        mode = "cond" if jax.default_backend() == "cpu" else "select"

    def init(params):
        return ApplyIfFiniteSelectState(jnp.zeros([], jnp.int32), tx.init(params))

    def _isfin(grads):
        flags = [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        return jnp.all(jnp.stack(flags)) if flags else jnp.array(True)

    def update_select(grads, state, params=None):
        isfin = _isfin(grads)
        updates, new_inner = tx.update(grads, state.inner_state, params)
        updates = jax.tree_util.tree_map(lambda u: jnp.where(isfin, u, jnp.zeros_like(u)), updates)
        new_inner = jax.tree_util.tree_map(
            lambda n, o: jnp.where(isfin, n, o) if hasattr(n, "dtype") else n,
            new_inner, state.inner_state,
        )
        count = jnp.where(isfin, 0, state.notfinite_count + 1).astype(jnp.int32)
        return updates, ApplyIfFiniteSelectState(count, new_inner)

    def update_cond(grads, state, params=None):
        # NOTE: the skip branch returns zeros_like(grads) — like upstream
        # optax.apply_if_finite, this assumes the inner update's pytree
        # structure/dtypes match the gradients' (true for every optimizer
        # built by get_optimizer; a transform that casts its updates would
        # need the select variant, whose zeros follow the actual updates)
        isfin = _isfin(grads)

        def do_apply(operand):
            grads, inner, params = operand
            updates, new_inner = tx.update(grads, inner, params)
            return updates, ApplyIfFiniteSelectState(jnp.zeros([], jnp.int32), new_inner)

        def do_skip(operand):
            grads, inner, _ = operand
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grads)
            return zeros, ApplyIfFiniteSelectState(
                (state.notfinite_count + 1).astype(jnp.int32), inner
            )

        return jax.lax.cond(isfin, do_apply, do_skip, (grads, state.inner_state, params))

    return optax.GradientTransformation(
        init, update_select if mode == "select" else update_cond
    )
