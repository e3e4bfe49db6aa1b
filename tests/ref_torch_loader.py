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

    def __init__(self, name):
        super().__init__(name)
        import importlib.machinery

        # a real spec so importlib.util.find_spec(name) doesn't blow up
        self.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)

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
        if i > 1:
            # link child into parent's __dict__ so `parent.child` resolves to
            # the module (AutoStub.__getattr__ would hand out a fresh Mock)
            parent = sys.modules[".".join(parts[: i - 1])]
            parent.__dict__.setdefault(parts[i - 1], sys.modules[p])
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

    # transformers>=4.46 removed LogitsWarper; the reference tortoise
    # arch_utils imports it (arch_utils.py:10) only to subclass. Materialize
    # every lazy attribute the reference pulls FIRST: under pytest, pulling a
    # heavy attribute (GPT2PreTrainedModel) swaps sys.modules["transformers"]
    # for a fresh module object, dropping anything patched onto the lazy
    # placeholder.
    from transformers import (  # noqa: F401  (forces materialization)
        GPT2Config,
        GPT2PreTrainedModel,
        LogitsProcessorList,
    )
    from transformers.modeling_outputs import CausalLMOutputWithCrossAttentions  # noqa: F401

    transformers = sys.modules["transformers"]
    if not hasattr(transformers, "LogitsWarper"):
        transformers.LogitsWarper = transformers.LogitsProcessor

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
    # torchaudio transform classes must be real nn.Modules — the XTTS
    # speaker encoder instantiates them inside nn.Sequential
    class _IdentityAudioTransform(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    ta_t = _stub("torchaudio.transforms")
    for cls in ("MelSpectrogram", "Spectrogram", "Resample", "AmplitudeToDB"):
        setattr(ta_t, cls, _IdentityAudioTransform)

    for name in [
        "torchaudio", "torchaudio.functional", "torchaudio.transforms",
        "soundfile", "mutagen", "anyascii", "inflect", "bangla", "bnnumerizer",
        "bnunicodenormalizer", "gruut_ipa", "jamo", "pypinyin", "hangul_romanize",
        "hangul_romanize.core", "hangul_romanize.rule", "num2words", "pysbd",
        "matplotlib", "matplotlib.pyplot", "umap", "pandas", "aiohttp", "flask",
        "unidecode", "spacy", "encodec", "encodec.utils",
    ]:
        # only stub what isn't actually installed — overriding a real module
        # (e.g. matplotlib) breaks unrelated tests that later import it
        root = name.split(".")[0]
        if root in ("matplotlib", "pandas"):
            try:
                if importlib.util.find_spec(root) is not None:
                    continue
            except (ImportError, ValueError):
                pass
        _stub(name)

    # installed transformers is newer than the reference expects — backfill
    # removed symbols with mocks (runtime only, nothing written to disk)
    try:
        import transformers

        for name in ("BeamSearchScorer", "LogitsWarper", "StoppingCriteria"):
            if not hasattr(transformers, name):
                setattr(transformers, name, MagicMock(name=f"transformers.{name}"))
        gen_utils = getattr(transformers, "generation", None)
        if gen_utils is not None:
            for name in ("BeamSearchScorer",):
                if not hasattr(gen_utils, name):
                    setattr(gen_utils, name, MagicMock(name=f"transformers.generation.{name}"))
    except Exception:
        pass

    try:
        import TTS  # noqa: F401
        _loaded = True
    except Exception:
        return None
    # import order matters for the XTTS stack: pulling stream_generator in
    # directly (after the transformers backfill) avoids a flaky ImportError
    # when TTS.tts.models.xtts is imported first
    try:
        importlib.import_module("TTS.tts.layers.xtts.stream_generator")
    except Exception:
        pass
    return sys.modules["TTS"]


def ref_import(module_name):
    """Import a reference submodule after `load_reference()`; None on failure."""
    if load_reference() is None:
        return None
    try:
        return importlib.import_module(module_name)
    except Exception:
        return None
