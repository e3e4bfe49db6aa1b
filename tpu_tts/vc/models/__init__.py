"""VC model registry (mirror of /root/reference/TTS/vc/models/__init__.py)."""

import importlib
import re


def to_camel(text):
    text = text.capitalize()
    return re.sub(r"(?!^)_([a-zA-Z])", lambda m: m.group(1).upper(), text)


def setup_model(config):
    print(" > Using model: {}".format(config.model))
    mod = importlib.import_module("tpu_tts.vc.models." + config.model.lower())
    cls = getattr(mod, to_camel(config.model))
    return cls.init_from_config(config)
