"""Name-based registries for tasks, models, criterions, and LR schedules.

Mirrors the capability of fairseq's registry system
(reference: fairseq/registry.py, fairseq/models/__init__.py,
fairseq/tasks/__init__.py, fairseq/criterions/__init__.py) with a much smaller
surface: a registry is a dict from name -> (cls, default_config_fn).

Model "architectures" are registered as named default-config stamps on top of a
model family, mirroring @register_model_architecture
(reference: research/TranSpeech/nar_transformer.py:977-1008).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Any] = {}

    def register(self, name: str, obj: Any = None):
        if obj is not None:
            self._add(name, obj)
            return obj

        def wrapper(cls):
            self._add(name, cls)
            return cls

        return wrapper

    def _add(self, name: str, obj: Any):
        if name in self._entries:
            raise ValueError(f"{self.kind} '{name}' already registered")
        self._entries[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._entries:
            known = ", ".join(sorted(self._entries))
            raise KeyError(f"unknown {self.kind} '{name}' (known: {known})")
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def names(self):
        return sorted(self._entries)


TASKS = Registry("task")
MODELS = Registry("model")
ARCHITECTURES = Registry("architecture")  # name -> (model_name, config_stamp_fn)
CRITERIONS = Registry("criterion")
LR_SCHEDULES = Registry("lr_schedule")
OPTIMIZERS = Registry("optimizer")


def register_task(name: str):
    return TASKS.register(name)


def register_model(name: str):
    return MODELS.register(name)


def register_criterion(name: str):
    return CRITERIONS.register(name)


def register_lr_schedule(name: str):
    return LR_SCHEDULES.register(name)


def register_optimizer(name: str):
    return OPTIMIZERS.register(name)


def register_architecture(model_name: str, arch_name: str):
    """Register a named architecture: a function stamping config defaults."""

    def wrapper(fn: Callable):
        ARCHITECTURES.register(arch_name, (model_name, fn))
        return fn

    return wrapper


def build_model(arch_name: str, cfg, task=None):
    """Resolve an architecture name to (model_cls, stamped_cfg) and build."""
    if arch_name in ARCHITECTURES:
        model_name, stamp = ARCHITECTURES.get(arch_name)
        stamp(cfg)
    else:
        model_name = arch_name
    model_cls = MODELS.get(model_name)
    return model_cls.build_model(cfg, task)


def _import_all():
    """Populate registries by importing the subpackages that register things."""
    import importlib

    for mod in (
        "diffnorm_tpu.models",
        "diffnorm_tpu.tasks",
        "diffnorm_tpu.criterions",
        "diffnorm_tpu.train.lr_schedules",
    ):
        importlib.import_module(mod)


_user_modules: set = set()


def import_user_module(module_path) -> None:
    """Import a user extension package/module so its register_* decorators
    run — the `--user-dir` plugin mechanism (reference fairseq/utils.py:
    464-507; the reference's own research/TranSpeech code plugs into
    fairseq exactly this way). No-op on None; idempotent per path."""
    if not module_path:
        return
    import importlib
    import os
    import sys

    module_path = os.path.abspath(str(module_path))
    if not os.path.exists(module_path):
        raise FileNotFoundError(f"--user-dir not found: {module_path}")
    if module_path in _user_modules:
        return
    _user_modules.add(module_path)
    parent, name = os.path.split(module_path)
    if name.endswith(".py"):  # single-file module
        name = name[:-3]
    if name in sys.modules:
        # silently skipping would mean the plugin's register_* decorators
        # never run (reference fairseq/utils.py:490-507 raises here too)
        raise FileExistsError(
            f"--user-dir module name '{name}' collides with an "
            f"already-imported module ({sys.modules[name]}); rename the "
            "user directory"
        )
    sys.path.insert(0, parent)
    try:
        importlib.import_module(name)
    finally:
        if sys.path and sys.path[0] == parent:
            sys.path.pop(0)
