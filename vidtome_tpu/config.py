"""YAML config system with base-config inheritance and ``${...}`` interpolation.

Feature-parity with the reference config layer (``utils/config_utils.py:5-40``
in lixirui142/VidToMe): recursive ``base_config`` chains (child overrides
base), prompt normalization (``str`` -> ``{"edit": str}``), ``${key.path}``
interpolation, and output-dir config snapshots that drop the irrelevant stage
section.  Implemented on PyYAML with a small attribute-access dict, no
OmegaConf dependency.
"""

from __future__ import annotations

import argparse
import copy
import os
import re
from typing import Any, Mapping

import yaml

_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class Config(dict):
    """A dict with attribute access and recursive wrapping.

    ``cfg.generation.prompt`` and ``cfg["generation"]["prompt"]`` are
    equivalent. Missing attribute access raises ``AttributeError`` (so
    ``"key" in cfg`` / ``cfg.get`` stay the explicit optional paths).
    """

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = _wrap(v)

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        return _unwrap(self)


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, Mapping):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_unwrap(v) for v in value]
    return value


def merge_configs(base: Mapping, override: Mapping) -> Config:
    """Deep-merge ``override`` on top of ``base`` (override wins, recursively)."""
    out = Config(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = v
    return out


def _lookup(root: Mapping, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        node = node[part]
    return node


def resolve_interpolations(cfg: Config, max_passes: int = 10) -> Config:
    """Resolve ``${a.b.c}`` references against the config root, repeatedly
    until fixpoint (references may themselves resolve to strings containing
    references)."""

    def resolve_value(v: Any) -> Any:
        if isinstance(v, str):
            full = _INTERP_RE.fullmatch(v)
            if full:
                return _lookup(cfg, full.group(1))
            return _INTERP_RE.sub(lambda m: str(_lookup(cfg, m.group(1))), v)
        return v

    def walk(node: Any) -> tuple[Any, bool]:
        changed = False
        if isinstance(node, Mapping):
            for k in list(node.keys()):
                new, ch = walk(node[k])
                if ch:
                    node[k] = new
                    changed = True
            return node, changed
        if isinstance(node, list):
            out = []
            for item in node:
                new, ch = walk(item)
                out.append(new)
                changed = changed or ch
            return out, changed
        new = resolve_value(node)
        return new, new is not node and new != node

    for _ in range(max_passes):
        _, changed = walk(cfg)
        if not changed:
            break
    return cfg


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f) or {})


def load_config_file(path: str, resolve: bool = True) -> Config:
    """Load a YAML config, following the ``base_config`` inheritance chain
    (child values override base values), normalizing the generation prompt,
    and resolving ``${...}`` interpolations."""
    config = load_yaml(path)
    cur_path, cur = path, config
    seen = {os.path.abspath(path)}
    while "base_config" in cur and cur.base_config != cur_path:
        base_path = cur.base_config
        if os.path.abspath(base_path) in seen:
            break
        seen.add(os.path.abspath(base_path))
        base = load_yaml(base_path)
        config = merge_configs(base, config)
        cur_path, cur = base_path, base

    if "generation" in config and "prompt" in config.generation:
        prompt = config.generation.prompt
        if isinstance(prompt, str):
            config.generation.prompt = Config({"edit": prompt})
    if resolve:
        resolve_interpolations(config)
    return config


def load_config(argv: list[str] | None = None, print_config: bool = True) -> Config:
    """CLI entry: parse ``--config`` and load it (reference: config_utils.py:5-31)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/tea-pour.yaml",
                        help="Config file path")
    args, _ = parser.parse_known_args(argv)
    config = load_config_file(args.config)
    if print_config:
        print("[INFO] loaded config:")
        print(yaml.safe_dump(config.to_dict(), sort_keys=False))
    return config


def save_config(config: Config, path: str, gene: bool = False, inv: bool = False) -> None:
    """Snapshot the config next to stage outputs, dropping the section that
    does not belong to the stage (reference: config_utils.py:33-40)."""
    os.makedirs(path, exist_ok=True)
    snap = copy.deepcopy(Config(config))
    if gene:
        snap.pop("inversion", None)
    if inv:
        snap.pop("generation", None)
    with open(os.path.join(path, "config.yaml"), "w") as f:
        yaml.safe_dump(snap.to_dict(), f, sort_keys=False)
