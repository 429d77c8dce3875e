"""Env-var + CLI dual flag parsing over the config dataclasses.

Analog of the reference's EnvArgumentParser / setup_args
(rtp_llm/server/server_args/server_args.py): every field of every EngineConfig
group is exposed both as ``--<group>-<field-with-dashes>`` and as env var
``RTP_<GROUP>_<FIELD>`` (CLI wins over env wins over default), so deployments can
be configured either way — but derived generically from the dataclasses instead
of 3.7k lines of per-flag registration.
"""

from __future__ import annotations

import argparse
import dataclasses
import enum
import os
import typing
from typing import Any, Optional

from rtp_llm_tpu.config.engine_config import EngineConfig

ENV_PREFIX = "RTP"


def _parse_bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")


def _coerce(field_type: Any, raw: str) -> Any:
    origin = typing.get_origin(field_type)
    if origin is typing.Union:  # Optional[T]
        args = [a for a in typing.get_args(field_type) if a is not type(None)]
        field_type = args[0] if args else str
        origin = typing.get_origin(field_type)
    if field_type is bool:
        return _parse_bool(raw)
    if field_type is int:
        return int(raw)
    if field_type is float:
        return float(raw)
    if origin is tuple or field_type is tuple:
        return tuple(int(x) for x in raw.split(","))
    if isinstance(field_type, type) and issubclass(field_type, enum.Enum):
        return field_type(raw)
    return raw


def _iter_fields(cfg: EngineConfig):
    """Yield (group_name, group_obj, field) for every flat config field."""
    for group_name in EngineConfig.GROUPS:
        group = getattr(cfg, group_name)
        for f in dataclasses.fields(group):
            yield group_name, group, f
    for f in dataclasses.fields(EngineConfig):
        if f.name in EngineConfig.GROUPS:
            continue
        yield "", cfg, f


def env_name(group: str, field: str) -> str:
    parts = [ENV_PREFIX] + ([group.upper()] if group else []) + [field.upper()]
    return "_".join(parts)


def flag_name(group: str, field: str) -> str:
    base = f"{group}-{field}" if group else field
    return "--" + base.replace("_", "-")


def build_parser(cfg: Optional[EngineConfig] = None) -> argparse.ArgumentParser:
    cfg = cfg or EngineConfig()
    parser = argparse.ArgumentParser(
        prog="rtp-llm-tpu", description="TPU-native LLM serving engine"
    )
    parser.add_argument("model_tag", nargs="?", default=None, help="model path or HF id")
    groups: dict[str, Any] = {}
    for group_name, _group, f in _iter_fields(cfg):
        ag = groups.setdefault(
            group_name or "engine", parser.add_argument_group(group_name or "engine")
        )
        ag.add_argument(
            flag_name(group_name, f.name),
            dest=f"{group_name}.{f.name}" if group_name else f.name,
            default=None,
            help=f"(env: {env_name(group_name, f.name)})",
        )
    return parser


def apply_env_and_args(
    cfg: EngineConfig, argv: Optional[list] = None
) -> EngineConfig:
    """Resolve each field: CLI flag > env var > existing value."""
    parser = build_parser(cfg)
    ns, _unknown = parser.parse_known_args(argv)
    for group_name, group, f in _iter_fields(cfg):
        raw = None
        env = os.environ.get(env_name(group_name, f.name))
        if env is not None:
            raw = env
        cli = getattr(ns, f"{group_name}.{f.name}" if group_name else f.name, None)
        if cli is not None:
            raw = cli
        if raw is None:
            continue
        ftype = f.type if not isinstance(f.type, str) else _resolve_type(group, f.name)
        setattr(group, f.name, _coerce(ftype, raw))
    if getattr(ns, "model_tag", None):
        cfg.server.model_path = ns.model_tag
    return cfg


def _resolve_type(group: Any, name: str) -> Any:
    hints = typing.get_type_hints(type(group))
    return hints.get(name, str)


def parse_engine_config(argv: Optional[list] = None) -> EngineConfig:
    return apply_env_and_args(EngineConfig(), argv)
