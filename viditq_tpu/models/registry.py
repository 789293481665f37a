"""Model registry (reference: t2v/opensora/registry.py mmengine Registry).

A plain dict + `build_module` keeps config-driven construction without the
mmengine dependency.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

MODELS: Dict[str, Callable] = {}
SCHEDULERS: Dict[str, Callable] = {}


def register(registry: Dict[str, Callable], name: str):
    def deco(fn):
        registry[name] = fn
        return fn
    return deco


def build_module(cfg: Dict[str, Any], registry: Dict[str, Callable]):
    """reference registry.py:7 — cfg is a dict with 'type' plus kwargs."""
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind not in registry:
        raise KeyError(f"unknown module type {kind!r}; have {sorted(registry)}")
    return registry[kind](**cfg)
