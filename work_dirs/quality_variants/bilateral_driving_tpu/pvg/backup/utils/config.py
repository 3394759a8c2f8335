"""Minimal OmegaConf-style config system (YAML + merge + CLI dotlist).

The reference drives everything through OmegaConf three-way merges
(project/tools/train.py:34-107): method YAML -> dataset YAML -> CLI dotlist
overrides, with attribute-style access. omegaconf isn't available in this
environment, so this is a small faithful re-implementation on top of pyyaml.
"""
from __future__ import annotations

import copy
from typing import Any, Dict, List

import yaml


class ConfigDict(dict):
    """dict with attribute access and recursive wrapping."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, path: str, default=None):
        node = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _wrap(x):
    if isinstance(x, dict):
        return ConfigDict({k: _wrap(v) for k, v in x.items()})
    if isinstance(x, list):
        return [_wrap(v) for v in x]
    return x


def load_yaml(path: str) -> ConfigDict:
    with open(path) as f:
        return _wrap(yaml.safe_load(f) or {})


def merge(base: Dict, override: Dict) -> ConfigDict:
    """Recursive merge; override wins; dicts merge, everything else replaces."""
    out = ConfigDict(copy.deepcopy(dict(base)))
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge(out[k], v)
        else:
            out[k] = _wrap(copy.deepcopy(v))
    return out


def parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_dotlist(cfg: ConfigDict, dotlist: List[str]) -> ConfigDict:
    """['a.b.c=1', 'x=foo'] overrides (reference CLI opts,
    train.py:47-55)."""
    cfg = merge(cfg, {})
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override must be key=value: {item}")
        key, val = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = ConfigDict()
            node = node[p]
        node[parts[-1]] = _wrap(parse_value(val))
    return cfg


def load_config(config_file: str, dataset_file: str | None = None,
                overrides: List[str] = ()) -> ConfigDict:
    cfg = load_yaml(config_file)
    if dataset_file:
        cfg = merge(cfg, load_yaml(dataset_file))
    return apply_dotlist(cfg, list(overrides))


def validate_keys(cfg: Dict, schema: Dict, path: str = "") -> List[str]:
    """Return dotted paths of keys not covered by `schema`.

    `schema` is a nested dict: value True (or a set member) = scalar leaf
    allowed; nested dict = recurse; the special key "*" allows arbitrary
    keys at that level (free-form sections like optim group names). The
    reference's OmegaConf merge silently accepts unknown keys — a misspelled
    override (`num_near_samples` vs `num_near_pts`) trains with defaults and
    nobody notices; this beats that instead of matching it."""
    unknown = []
    for k, v in cfg.items():
        if k in schema:
            sub = schema[k]
        elif "*" in schema:
            sub = schema["*"]
        else:
            unknown.append(f"{path}{k}")
            continue
        if isinstance(sub, dict) and isinstance(v, dict):
            unknown += validate_keys(v, sub, f"{path}{k}.")
    return unknown


def save_config(cfg: ConfigDict, path: str):
    def plain(x):
        if isinstance(x, dict):
            return {k: plain(v) for k, v in x.items()}
        if isinstance(x, list):
            return [plain(v) for v in x]
        return x

    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)
