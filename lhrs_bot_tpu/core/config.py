"""Config system: YAML files merged with CLI flags, exposed as an attribute dict.

Mirrors the reference's two-level config surface (YAML schema in Config/*.yaml
merged with argparse flags; reference: lhrs/CustomTrainer/utils/config_parser.py:13-54
wrapped into ml_collections.ConfigDict at main_pretrain_stage1.py:172-175), but
implemented without the ml_collections dependency: a small recursive attrdict.
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from typing import Any, Dict, Iterator, List, Optional

import yaml


class ConfigDict(dict):
    """Recursive attribute-access dict. YAML-friendly, JSON-serializable."""

    def __init__(self, data: Optional[Dict[str, Any]] = None, **kwargs: Any):
        super().__init__()
        merged: Dict[str, Any] = dict(data or {})
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, ConfigDict):
            return value
        if isinstance(value, dict):
            return ConfigDict(value)
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, self._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as exc:  # AttributeError so getattr(cfg, "x", d) works
            raise AttributeError(key) from exc

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def __deepcopy__(self, memo: Dict[int, Any]) -> "ConfigDict":
        out = ConfigDict()
        memo[id(self)] = out
        for key, value in self.items():
            out[copy.deepcopy(key, memo)] = copy.deepcopy(value, memo)
        return out

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(value: Any) -> Any:
            if isinstance(value, ConfigDict):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [unwrap(v) for v in value]
            return value

        return {k: unwrap(v) for k, v in self.items()}

    def to_json(self, **kwargs: Any) -> str:
        return json.dumps(self.to_dict(), **kwargs)

    def merge(self, other: Dict[str, Any]) -> "ConfigDict":
        """Recursively merge ``other`` into self (other wins)."""
        for key, value in other.items():
            if (
                key in self
                and isinstance(self[key], ConfigDict)
                and isinstance(value, dict)
            ):
                self[key].merge(value)
            else:
                self[key] = value
        return self


def load_yaml_config(path: str) -> ConfigDict:
    with open(path, "r") as fh:
        data = yaml.safe_load(fh) or {}
    return ConfigDict(data)


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse subclass with a ``-c/--config`` YAML pre-parse.

    Parity with reference config_parser.py:13-54: the YAML file named by
    ``-c`` is loaded first; CLI flags that were *explicitly given* override
    YAML values; YAML values override argparse defaults.
    """

    def __init__(self, *args: Any, **kwargs: Any):
        self.option_names: List[str] = []  # before super(): parent adds -h
        super().__init__(*args, **kwargs)
        self.config_parser = argparse.ArgumentParser(add_help=False)
        self.config_parser.add_argument(
            "-c", "--config", default=None, metavar="FILE", help="YAML config file"
        )

    def add_argument(self, *args: Any, **kwargs: Any):  # type: ignore[override]
        action = super().add_argument(*args, **kwargs)
        self.option_names.append(action.dest)
        return action

    def parse_args(self, args: Optional[List[str]] = None):  # type: ignore[override]
        argv = list(sys.argv[1:]) if args is None else list(args)
        res, remaining = self.config_parser.parse_known_args(argv)
        yaml_dict: Dict[str, Any] = {}
        if res.config is not None:
            with open(res.config, "r") as fh:
                yaml_dict = yaml.safe_load(fh) or {}

        namespace = super().parse_args(remaining)

        explicit = _explicitly_passed_dests(self, remaining)
        merged = ConfigDict(vars(namespace))
        for key, value in yaml_dict.items():
            if key not in explicit:
                merged[key] = value
        merged["config"] = res.config
        return merged


def _explicitly_passed_dests(
    parser: argparse.ArgumentParser, argv: List[str]
) -> set:
    """Return the set of dests the user actually typed on the command line."""
    given = set()
    tokens = set()
    for tok in argv:
        if tok.startswith("--"):
            tokens.add(tok.split("=", 1)[0])
        elif tok.startswith("-") and len(tok) > 1 and not tok[1].isdigit():
            tokens.add(tok.split("=", 1)[0])
    for action in parser._actions:  # noqa: SLF001
        if any(opt in tokens for opt in action.option_strings):
            given.add(action.dest)
    return given


def flatten(cfg: Dict[str, Any], prefix: str = "") -> Iterator[tuple]:
    for key, value in cfg.items():
        name = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            yield from flatten(value, name)
        else:
            yield name, value
