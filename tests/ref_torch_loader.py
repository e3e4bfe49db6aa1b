"""Import the reference (read-only, torch) implementation for parity tests.

The reference at /root/reference depends on packages not present in this
environment (coqpit, librosa, gruut, trainer, ...). For *numerical parity
testing only* we import its torch modules with lightweight stand-ins for
those deps: our own Coqpit clone, our numpy mel filterbank, and MagicMock
auto-stubs for everything touched only at import time. No reference code is
copied — the reference modules run as-is from their own tree.

Usage:
    ref = load_reference()           # returns the `TTS` package (or None)
    vits_mod = ref_import("TTS.tts.models.vits")
"""

import importlib
import sys
import types
from unittest.mock import MagicMock

REFERENCE_PATH = "/root/reference"
_loaded = False


class _AutoStub(types.ModuleType):
    """Module whose every attribute is a MagicMock (call/iter/subscript-safe)."""

    __path__: list = []

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return MagicMock(name=f"{self.__name__}.{item}")


_STUB_ROOTS = set()


class _StubFinder:
    """Meta-path finder: any submodule of a stubbed root resolves to a stub."""

    def find_module(self, fullname, path=None):
        return self if fullname.split(".")[0] in _STUB_ROOTS else None

    def load_module(self, fullname):
        return sys.modules.setdefault(fullname, _AutoStub(fullname))

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] not in _STUB_ROOTS:
            return None
        import importlib.machinery

        return importlib.machinery.ModuleSpec(fullname, _StubLoader(), is_package=True)


class _StubLoader:
    def create_module(self, spec):
        return _AutoStub(spec.name)

    def exec_module(self, module):
        pass


def _stub(name, **attrs):
    _STUB_ROOTS.add(name.split(".")[0])
    parts = name.split(".")
    for i in range(1, len(parts) + 1):
        p = ".".join(parts[:i])
        if p not in sys.modules:
            sys.modules[p] = _AutoStub(p)
    mod = sys.modules[name]
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def load_reference():
    """Set up stubs and import the reference `TTS` package. Returns the
    package, or None if the import fails (callers should skip)."""
    global _loaded
    if _loaded:
        return sys.modules.get("TTS")
    import tpu_tts.config.base as cb
    from tpu_tts.audio.numpy_transforms import mel_filterbank

    # append (not prepend): the reference tree has its own `tests` package
    # that must not shadow ours
    if REFERENCE_PATH not in sys.path:
        sys.path.append(REFERENCE_PATH)
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.append(_StubFinder())

    # real classes where the reference subclasses them
    import dataclasses

    @dataclasses.dataclass
    class TrainerConfig(cb.Coqpit):
        pass

    coqpit = types.ModuleType("coqpit")
    coqpit.Coqpit = cb.Coqpit
    coqpit.MISSING = getattr(cb, "MISSING", "???")
    coqpit.check_argument = lambda *a, **k: None
    sys.modules.setdefault("coqpit", coqpit)

    import torch

    trainer = _stub("trainer")
    trainer.TrainerConfig = TrainerConfig
    trainer.TrainerArgs = TrainerConfig
    # must be a real nn.Module: reference models subclass it and need the
    # full torch Module machinery (state_dict, parameters, ...)
    trainer.TrainerModel = type("TrainerModel", (torch.nn.Module,), {})
    _stub("trainer.torch")
    _stub("trainer.trainer_utils")
    _stub("trainer.logging")
    _stub("trainer.io")

    def _mel(*, sr, n_fft, n_mels=128, fmin=0.0, fmax=None, **kw):
        return mel_filterbank(
            sample_rate=sr, fft_size=n_fft, num_mels=n_mels, mel_fmin=fmin, mel_fmax=fmax
        )

    _stub("librosa", filters=_stub("librosa.filters", mel=_mel))
    # gruut is queried for its language list at import time
    _stub("gruut", get_supported_languages=lambda: ["en-us"])
    for name in [
        "torchaudio", "torchaudio.functional", "torchaudio.transforms",
        "soundfile", "mutagen", "anyascii", "inflect", "bangla", "bnnumerizer",
        "bnunicodenormalizer", "gruut_ipa", "jamo", "pypinyin", "hangul_romanize",
        "hangul_romanize.core", "hangul_romanize.rule", "num2words", "pysbd",
        "matplotlib", "matplotlib.pyplot", "umap", "pandas", "aiohttp", "flask",
        "unidecode", "spacy", "encodec", "encodec.utils",
    ]:
        _stub(name)

    try:
        import TTS  # noqa: F401
        _loaded = True
        return sys.modules["TTS"]
    except Exception:
        return None


def ref_import(module_name):
    """Import a reference submodule after `load_reference()`; None on failure."""
    if load_reference() is None:
        return None
    try:
        return importlib.import_module(module_name)
    except Exception:
        return None
