"""Model registry (mirror of /root/reference/TTS/tts/models/__init__.py:6)."""

from typing import TYPE_CHECKING

from tpu_tts.utils.generic_utils import find_module


def setup_model(config, samples=None):
    """Build a model instance from its config (name-based registry)."""
    print(" > Using model: {}".format(config.model))
    MyModel = find_module("tpu_tts.models", config.model.lower())
    model = MyModel.init_from_config(config=config, samples=samples)
    return model
