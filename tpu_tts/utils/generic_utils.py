"""Generic utilities (mirror of /root/reference/TTS/utils/generic_utils.py:
`find_module`:93, `import_class`:100, `get_user_data_dir`:127, `KeepAverage`)."""

import datetime
import importlib
import os
import re
from pathlib import Path
from typing import Dict


def to_camel(text: str) -> str:
    text = text.capitalize()
    text = re.sub(r"(?!^)_([a-zA-Z])", lambda m: m.group(1).upper(), text)
    text = text.replace("Tts", "TTS")
    return text


def find_module(module_path: str, module_name: str) -> object:
    """Import `module_path.module_name` and return its camel-cased class."""
    module_name = module_name.lower()
    module = importlib.import_module(module_path + "." + module_name)
    class_name = to_camel(module_name)
    return getattr(module, class_name)


def import_class(module_path: str) -> object:
    """Import a class from its full dotted path."""
    class_name = module_path.split(".")[-1]
    module_path = ".".join(module_path.split(".")[:-1])
    module = importlib.import_module(module_path)
    return getattr(module, class_name)


def get_import_path(obj: object) -> str:
    return ".".join([type(obj).__module__, type(obj).__name__])


def get_user_data_dir(appname: str) -> Path:
    TTS_HOME = os.environ.get("TTS_HOME")
    XDG_DATA_HOME = os.environ.get("XDG_DATA_HOME")
    if TTS_HOME is not None:
        ans = Path(TTS_HOME).expanduser().resolve(strict=False)
    elif XDG_DATA_HOME is not None:
        ans = Path(XDG_DATA_HOME).expanduser().resolve(strict=False)
    else:
        ans = Path.home().joinpath(".local/share")
    return ans.joinpath(appname)


def get_experiment_folder_path(root_path: str, model_name: str) -> str:
    date_str = datetime.datetime.now().strftime("%B-%d-%Y_%I+%M%p")
    return os.path.join(root_path, model_name + "-" + date_str)


def bucket_len(n: int, grid: int, cap: int = None) -> int:
    """Serving text-length bucket: the smallest multiple of `grid` >=
    max(n, grid), optionally capped at max(cap, n) (e.g. a position-embedding
    table size). ONE definition shared by Vits.inference, Xtts._bucket_text
    and XttsStreamPool._bucket — the pool's grouping must stay bit-identical
    to the single-stream padding or pooled requests compile different shapes
    than the single-stream path."""
    b = max(grid, -(-n // grid) * grid)
    if cap is not None:
        b = min(b, max(cap, n))
    return b


def count_parameters(params) -> int:
    """Count leaves' sizes of a JAX pytree of parameters."""
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def format_aux_input(def_args: Dict, kwargs: Dict) -> Dict:
    kwargs = kwargs.copy()
    for name, arg in def_args.items():
        if name not in kwargs or kwargs[name] is None:
            kwargs[name] = arg
    return kwargs


class KeepAverage:
    """Running averages of named scalars (ref generic_utils.py)."""

    def __init__(self):
        self.avg_values = {}
        self.iters = {}

    def __getitem__(self, key):
        return self.avg_values[key]

    def items(self):
        return self.avg_values.items()

    def add_value(self, name, init_val=0, init_iter=0):
        self.avg_values[name] = init_val
        self.iters[name] = init_iter

    def update_value(self, name, value, weighted_avg=False):
        if name not in self.avg_values:
            self.add_value(name, init_val=value)
            return
        if weighted_avg:
            self.avg_values[name] = 0.99 * self.avg_values[name] + 0.01 * value
            self.iters[name] += 1
        else:
            self.avg_values[name] = self.avg_values[name] * self.iters[name] + value
            self.iters[name] += 1
            self.avg_values[name] /= self.iters[name]

    def add_values(self, name_dict):
        for key, value in name_dict.items():
            self.add_value(key, init_val=value)

    def update_values(self, value_dict):
        for key, value in value_dict.items():
            self.update_value(key, value)
