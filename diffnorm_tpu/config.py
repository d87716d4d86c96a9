"""Configuration system.

The reference uses a 1768-line dataclass tree bridged to argparse/hydra
(reference: fairseq/dataclass/configs.py, fairseq/options.py). Here the whole
flag system is a single mutable namespace (`Config`) with:

* attribute access with defaults (`cfg.get("encoder_layers", 12)`)
* `setdefault` used by architecture stamps
* YAML round-trip for recipes
* nested sub-namespaces for grouped settings (`cfg.optimization.lr`)

Typed dataclasses are used only for the trainer-facing groups where the set of
fields is closed (see TrainerConfig below).
"""

from __future__ import annotations

import copy
import dataclasses
import json
from typing import Any, Dict, Optional


class Config:
    """A mutable attribute namespace with dict semantics."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- dict-ish API -------------------------------------------------------
    def get(self, name: str, default: Any = None) -> Any:
        return self.__dict__.get(name, default)

    def setdefault(self, name: str, value: Any) -> Any:
        if name not in self.__dict__:
            self.__dict__[name] = value
        return self.__dict__[name]

    def update(self, other: Optional[Dict[str, Any]] = None, **kwargs):
        if other:
            for k, v in other.items():
                setattr(self, k, v)
        for k, v in kwargs.items():
            setattr(self, k, v)
        return self

    def keys(self):
        return self.__dict__.keys()

    def items(self):
        return self.__dict__.items()

    def __contains__(self, name: str) -> bool:
        return name in self.__dict__

    def __getitem__(self, name: str) -> Any:
        return self.__dict__[name]

    def __setitem__(self, name: str, value: Any):
        self.__dict__[name] = value

    def __repr__(self):
        return f"Config({self.__dict__!r})"

    def copy(self) -> "Config":
        return copy.deepcopy(self)

    # -- serialization ------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.__dict__.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif dataclasses.is_dataclass(v):
                out[k] = dataclasses.asdict(v)
            else:
                out[k] = v
        return out

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        cfg = cls()
        for k, v in d.items():
            if isinstance(v, dict):
                setattr(cfg, k, cls.from_dict(v))
            else:
                setattr(cfg, k, v)
        return cfg

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def save_yaml(self, path: str):
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


@dataclasses.dataclass
class TrainerConfig:
    """Closed-set trainer knobs (reference: fairseq/dataclass/configs.py
    OptimizationConfig/CheckpointConfig/CommonConfig subsets actually used by
    the DiffNorm recipes in scripts/{vae,diffusion,s2ut}/train.sh)."""

    max_updates: int = 0
    max_epochs: int = 0
    update_freq: int = 1          # gradient accumulation steps
    clip_norm: float = 2.0
    seed: int = 1
    log_interval: int = 100
    validate_interval: int = 1            # epochs
    validate_interval_updates: int = 0    # steps (0 = off)
    save_interval: int = 1                # epochs
    save_interval_updates: int = 0        # steps (0 = off)
    keep_best_checkpoints: int = 5
    keep_last_epochs: int = 5
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    patience: int = -1            # early stop after N non-improving validations
    save_dir: str = "checkpoints"
    # numerics
    dtype: str = "bfloat16"       # compute dtype; params always fp32
    # parallelism
    data_parallel: int = -1       # -1 = all devices
    model_parallel: int = 1
    # profiling
    profile: bool = False


def make_trainer_config(cfg: Config) -> TrainerConfig:
    """Extract TrainerConfig fields from a flat Config namespace."""
    fields = {f.name for f in dataclasses.fields(TrainerConfig)}
    kwargs = {k: v for k, v in cfg.items() if k in fields}
    return TrainerConfig(**kwargs)
