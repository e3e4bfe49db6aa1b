"""Every shipped recipe must construct its config at import time.

The reference ships runnable recipe scripts (reference recipes/); ours mirror
them with the tpu_tts API. Importing a recipe builds its full config —
catching renamed fields, bad kwargs, or missing config classes.
"""

import importlib.util
import pathlib

import pytest

RECIPES_DIR = pathlib.Path(__file__).parent.parent / "recipes"
RECIPE_FILES = sorted(p for p in RECIPES_DIR.rglob("*.py"))


@pytest.mark.parametrize("path", RECIPE_FILES, ids=lambda p: str(p.relative_to(RECIPES_DIR)))
def test_recipe_imports_and_builds_config(path):
    spec = importlib.util.spec_from_file_location(f"recipe_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    config = getattr(mod, "config", None)
    assert config is not None, "recipe must define a module-level `config`"
    assert config.output_path
    # round-trips through serialization (what the trainer writes next to ckpts)
    config.to_dict()
