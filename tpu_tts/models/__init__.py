"""Model registry (mirror of /root/reference/TTS/tts/models/__init__.py:6)."""

from typing import TYPE_CHECKING

from tpu_tts.utils.generic_utils import find_module


def setup_model(config, samples=None):
    """Build a model instance from its config (name-based registry).
    `base_model` redirects variants (fast_pitch → forward_tts)."""
    print(" > Using model: {}".format(config.model))
    if "base_model" in config and config["base_model"] is not None:
        MyModel = find_module("tpu_tts.models", config.base_model.lower())
    else:
        MyModel = find_module("tpu_tts.models", config.model.lower())
    model = MyModel.init_from_config(config=config, samples=samples)
    return model
