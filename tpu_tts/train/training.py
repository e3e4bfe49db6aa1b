"""Training schedule helpers (mirror of /root/reference/TTS/utils/training.py).

`check_update`'s NaN/inf-gradient skip lives in the trainer as
`optax.apply_if_finite`; the gradual-training schedule for the Tacotron
family is here (`gradual_training_scheduler`, ref training.py:33).
"""

from typing import Optional, Tuple


def gradual_training_scheduler(global_step: int, config, num_devices: Optional[int] = None) -> Tuple[int, int]:
    """Pick the active `(r, batch_size)` from
    `config.gradual_training = [[step, r, batch_size], ...]`.

    The step thresholds are scaled by the device count (the reference scales
    by GPU count so multi-GPU runs advance the schedule at the same
    wall-progress, ref training.py:33-46)."""
    if num_devices is None:
        try:
            import jax

            num_devices = max(jax.device_count(), 1)
        except Exception:
            num_devices = 1
    new_values = None
    for values in config.gradual_training:
        if global_step * num_devices >= values[0]:
            new_values = values
    if new_values is None:
        new_values = config.gradual_training[0]
    return int(new_values[1]), int(new_values[2])
