"""YAML config tree with attribute access + argparse merge.

Keeps the reference's external contract (SURVEY.md §2.3): the three-section
`model / data / training` OmegaConf YAML schema and the `config.update(vars
(args))` merge pattern (scripts/aptp/prune.py:22-24) — without the omegaconf
dependency (not in this image). Supports dotted-path get/set, None from
YAML `null`, and round-trip dump for the run-directory `config.yaml` copy
(trainer.py:485-488).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml


class Config(dict):
    """dict with recursive attribute access: cfg.model.unet.resolution."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if not isinstance(v, Config):
                super().__setitem__(k, _wrap(v))

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = Config()
            node = node[p]
        node[parts[-1]] = _wrap(value)

    def update_flat(self, flat: Dict[str, Any]) -> None:
        """Merge a flat dict (e.g. vars(args)); keys may be dotted paths.
        None values do not clobber existing entries (argparse defaults)."""
        for k, v in flat.items():
            if v is None and self.get_path(k) is not None:
                continue
            self.set_path(k, v)

    def to_dict(self) -> dict:
        return _unwrap(self)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

    def clone(self) -> "Config":
        return _wrap(copy.deepcopy(self.to_dict()))


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, dict):
        return Config({k: _wrap(x) for k, x in v.items()})
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    with open(path) as f:
        cfg = _wrap(yaml.safe_load(f) or {})
    if overrides:
        cfg.update_flat(overrides)
    return cfg


def load_config_dict(d: Optional[Dict[str, Any]],
                     overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Build a Config from an in-memory dict — the programmatic twin of
    load_config (tests, notebook use, and the hub-contract tests)."""
    cfg = _wrap(d or {})
    if overrides:
        cfg.update_flat(overrides)
    return cfg
