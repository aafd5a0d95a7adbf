"""Dataclass -> CLI flags (reference used tf.app.flags; same names here).

Supports --flag=value and --flag value; booleans accept true/false/1/0 or
bare `--flag` for True (tf.app.flags style).
"""

from __future__ import annotations

import argparse
import dataclasses
import typing

# Optional/int/str et al. must be importable here: dataclass annotations
# are strings (PEP 563) and get eval'd in this module's namespace.
from typing import Optional  # noqa: F401


def _parse_bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "t", "1", "yes"):
        return True
    if v.lower() in ("false", "f", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"bad boolean {v!r}")


def _unwrap_optional(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def add_dataclass_flags(parser: argparse.ArgumentParser, cls) -> None:
    for field in dataclasses.fields(cls):
        if dataclasses.is_dataclass(field.type) or dataclasses.is_dataclass(
            getattr(field, "default_factory", None)
        ):
            continue  # nested hparams handled separately
        tp = _unwrap_optional(
            field.type if not isinstance(field.type, str) else eval(field.type)
        )
        if dataclasses.is_dataclass(tp):
            continue
        name = f"--{field.name}"
        if name in parser._option_string_actions:
            continue  # config dataclass wins over duplicate hparam names
        default = (
            field.default
            if field.default is not dataclasses.MISSING
            else None
        )
        if tp is bool:
            parser.add_argument(
                name, type=_parse_bool, nargs="?", const=True,
                default=default,
            )
        elif tp in (int, float, str):
            parser.add_argument(name, type=tp, default=default)


def parse_into(cls, argv=None, hparams_cls=None, extra=None):
    """Parse argv into `cls` (+ nested `hparams` if hparams_cls given)."""
    parser = argparse.ArgumentParser(allow_abbrev=False)
    add_dataclass_flags(parser, cls)
    if hparams_cls is not None:
        add_dataclass_flags(parser, hparams_cls)
    if extra:
        for name, kw in extra.items():
            parser.add_argument(name, **kw)
    ns, unknown = parser.parse_known_args(argv)
    if unknown:
        raise SystemExit(f"unknown flags: {unknown}")
    ns_dict = vars(ns)
    cfg_kw = {
        f.name: ns_dict[f.name]
        for f in dataclasses.fields(cls)
        if f.name in ns_dict and ns_dict[f.name] is not None
    }
    cfg = cls(**cfg_kw)
    if hparams_cls is not None:
        hp_kw = {
            f.name: ns_dict[f.name]
            for f in dataclasses.fields(hparams_cls)
            if f.name in ns_dict and ns_dict[f.name] is not None
        }
        cfg.hparams = hparams_cls(**hp_kw)
    return cfg, ns
