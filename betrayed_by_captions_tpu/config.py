"""Python-file config system with ``_base_`` inheritance and dotted overrides.

TPU-native replacement for the reference's mmcv ``Config``
(used at /root/reference/tools/train.py:119-128; config files under
/root/reference/configs/). Feature parity:

- config files are plain Python files; every module-level variable that does
  not start with ``_`` becomes a config key,
- ``_base_ = ['relative/path.py', ...]`` merges parent configs (depth-first,
  later files and the child override earlier values),
- dict values merge recursively; a dict containing ``_delete_: True``
  replaces the base dict instead of merging into it,
- CLI-style dotted overrides: ``cfg.merge_from_options({'model.backbone.depth': 101})``.
"""

from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional


_DELETE_KEY = "_delete_"
_BASE_KEY = "_base_"


class ConfigDict(dict):
    """dict with attribute access, used for all nested config mappings."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict(
            {copy.deepcopy(k, memo): copy.deepcopy(v, memo) for k, v in self.items()}
        )


def _to_config_dict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_config_dict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_config_dict(v) for v in obj)
    return obj


def _exec_config_file(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        source = f.read()
    # Validate syntax early with a helpful filename.
    ast.parse(source, filename=path)
    module = types.ModuleType("_cfg_")
    module.__file__ = path
    exec(compile(source, path, "exec"), module.__dict__)
    return {
        k: v
        for k, v in module.__dict__.items()
        if not k.startswith("__") and not isinstance(v, types.ModuleType)
    }


def _merge_dicts(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Merge ``override`` into ``base`` recursively (mmcv-style)."""
    out = copy.deepcopy(base)
    for key, value in override.items():
        if key == _DELETE_KEY:
            continue
        if (
            isinstance(value, dict)
            and isinstance(out.get(key), dict)
            and not value.get(_DELETE_KEY, False)
        ):
            out[key] = _merge_dicts(out[key], value)
        else:
            out[key] = copy.deepcopy(value)
    return out


def _load_with_bases(path: str) -> Dict[str, Any]:
    cfg = _exec_config_file(path)
    bases = cfg.pop(_BASE_KEY, [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base_rel in bases:
        base_path = os.path.join(os.path.dirname(path), base_rel)
        merged = _merge_dicts(merged, _load_with_bases(base_path))
    return _merge_dicts(merged, cfg)


def _parse_scalar(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


class Config(ConfigDict):
    """Top-level config object."""

    @classmethod
    def fromfile(cls, path: str) -> "Config":
        return cls(_to_config_dict(_load_with_bases(path)))

    @classmethod
    def fromdict(cls, d: Dict[str, Any]) -> "Config":
        return cls(_to_config_dict(copy.deepcopy(d)))

    def merge_from_options(self, options: Optional[Dict[str, Any]]) -> "Config":
        """Apply ``{'a.b.c': value}`` overrides (reference tools/train.py:82-90)."""
        for dotted, value in (options or {}).items():
            keys = dotted.split(".")
            node: Dict[str, Any] = self
            for k in keys[:-1]:
                if k not in node or not isinstance(node[k], dict):
                    node[k] = ConfigDict()
                node = node[k]
            if isinstance(value, str):
                value = _parse_scalar(value)
            node[keys[-1]] = _to_config_dict(value)
        return self

    def dump(self) -> str:
        import pprint

        return pprint.pformat(dict(self), width=100, sort_dicts=False)


def parse_cli_options(pairs: List[str]) -> Dict[str, Any]:
    """Parse ``['a.b=1', 'c=[2,3]']`` CLI override strings."""
    out: Dict[str, Any] = {}
    for pair in pairs:
        if "=" not in pair:
            raise ValueError(f"override must look like key=value, got {pair!r}")
        key, _, value = pair.partition("=")
        out[key.strip()] = _parse_scalar(value.strip())
    return out
