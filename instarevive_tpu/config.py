"""Typed config system: one registry + instantiate-by-name for the whole framework.

Replaces the reference's three config mechanisms (OmegaConf YAML +
``instantiate_from_config`` in ``utils/common.py:15-18``, mmcv
``Config.fromfile`` in ``diffusion/utils/misc.py:21-30``, and raw argparse)
with a single dict/YAML tree where a node ``{"target": name, "params": {...}}``
resolves through an explicit registry or a dotted import path.
"""

from __future__ import annotations

import copy
import dataclasses
import importlib
from typing import Any, Callable, Dict, Mapping, Optional

_REGISTRY: Dict[str, Any] = {}


def register(name: Optional[str] = None) -> Callable:
    """Decorator registering a class/function under ``name`` (default: its __name__)."""

    def deco(obj):
        key = name or obj.__name__
        if key in _REGISTRY and _REGISTRY[key] is not obj:
            raise ValueError(f"duplicate registry entry: {key}")
        _REGISTRY[key] = obj
        return obj

    return deco


def resolve(target: str) -> Any:
    """Resolve a registry name or dotted import path to an object."""
    if target in _REGISTRY:
        return _REGISTRY[target]
    if "." in target:
        module, _, attr = target.rpartition(".")
        return getattr(importlib.import_module(module), attr)
    raise KeyError(f"unknown target {target!r}; registered: {sorted(_REGISTRY)}")


def instantiate(cfg: Mapping[str, Any], **overrides) -> Any:
    """Instantiate ``{"target": ..., "params": {...}}`` (cf. reference utils/common.py:15).

    ``overrides`` take precedence over ``params``. Nested dicts that themselves
    contain a ``target`` key are instantiated recursively.
    """
    if "target" not in cfg:
        raise KeyError(f"config node has no 'target': {dict(cfg)}")
    cls = resolve(cfg["target"])
    params = dict(cfg.get("params", {}) or {})
    params.update(overrides)
    resolved = {}
    for k, v in params.items():
        if isinstance(v, Mapping) and "target" in v:
            resolved[k] = instantiate(v)
        else:
            resolved[k] = v
    return cls(**resolved)


def load_config(path: str) -> Dict[str, Any]:
    """Load a YAML (or JSON) config file into a plain dict."""
    import json

    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


def asdict_shallow(dc) -> Dict[str, Any]:
    """Dataclass -> dict without recursing into field values."""
    return {f.name: getattr(dc, f.name) for f in dataclasses.fields(dc)}


def merge(base: Mapping[str, Any], override: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge; override wins, dicts merge, everything else replaces."""
    out = copy.deepcopy(dict(base))
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out
