"""Print environment info for bug reports (mirror of /root/reference/TTS/bin/
collect_env_info.py)."""

import json
import platform
import sys


def system_info():
    import numpy

    import tpu_tts

    info = {
        "tpu_tts": tpu_tts.__version__,
        "python": sys.version,
        "platform": platform.platform(),
        "numpy": numpy.__version__,
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # pragma: no cover
        info["jax"] = f"error: {e}"
    for mod in ("flax", "optax", "orbax.checkpoint"):
        try:
            import importlib

            info[mod] = getattr(importlib.import_module(mod), "__version__", "?")
        except ImportError:
            info[mod] = "not installed"
    return info


def main(argv=None):
    print(json.dumps(system_info(), indent=2))


if __name__ == "__main__":
    main()
