import json

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from tpu_tts.config.base import Coqpit
from tpu_tts.config.shared_configs import BaseAudioConfig, BaseDatasetConfig, BaseTrainingConfig


@dataclass
class _Inner(Coqpit):
    hidden: int = 16
    name: str = "inner"


@dataclass
class _Outer(Coqpit):
    lr: float = 0.1
    steps: int = 10
    use_x: bool = False
    inner: _Inner = field(default_factory=_Inner)
    tags: List[str] = field(default_factory=list)
    table: Dict[str, int] = field(default_factory=dict)
    maybe: Optional[int] = None


def test_round_trip(tmp_path):
    cfg = _Outer(lr=0.5, tags=["a", "b"], table={"x": 1})
    cfg.inner.hidden = 99
    p = tmp_path / "cfg.json"
    cfg.save_json(str(p))
    cfg2 = _Outer.load_json(str(p))
    assert cfg2.lr == 0.5
    assert cfg2.inner.hidden == 99
    assert isinstance(cfg2.inner, _Inner)
    assert cfg2.tags == ["a", "b"]
    assert cfg2.table == {"x": 1}


def test_dict_access():
    cfg = _Outer()
    assert cfg["lr"] == 0.1
    assert "inner" in cfg
    assert "nope" not in cfg
    cfg["steps"] = 20
    assert cfg.steps == 20
    assert "lr" in cfg.keys()


def test_unknown_keys_ignored():
    cfg = _Outer.from_dict({"lr": 0.2, "bogus": 1, "inner": {"hidden": 5, "junk": 2}})
    assert cfg.lr == 0.2
    assert cfg.inner.hidden == 5


def test_dotted_overrides():
    cfg = _Outer()
    rest = cfg.parse_args(
        ["--coqpit.lr", "0.9", "--coqpit.inner.hidden=3", "--coqpit.use_x", "true", "--other", "1"]
    )
    assert cfg.lr == 0.9
    assert cfg.inner.hidden == 3
    assert cfg.use_x is True
    assert rest == ["--other", "1"]


def test_shared_configs():
    audio = BaseAudioConfig()
    audio.check_values()
    ds = BaseDatasetConfig(formatter="ljspeech", path="/tmp", meta_file_train="m.csv")
    ds.check_values()
    tr = BaseTrainingConfig(model="glow_tts", batch_size=8)
    d = tr.to_dict()
    assert d["model"] == "glow_tts"
    tr2 = BaseTrainingConfig.from_dict(json.loads(json.dumps(d)))
    assert tr2.batch_size == 8
