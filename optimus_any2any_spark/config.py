"""``<COMPONENT>__<KEY>`` configuration convention.

The reference configures every pipeline entirely through environment
variables with a double-underscore component prefix plus ``--env`` CLI
overrides, last-one-wins (reference: README.md "Configuration
convention"; internal/config/util.go:41-78; internal/config/config.go:25).
This module reproduces that surface as a thin layer over a plain dict;
the values feed Spark reader/writer options and the template/JQ
compilers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

SEPARATOR = "__"

# Engine-wide defaults (reference: internal/config/config.go:9-21).
GENERIC_DEFAULTS = {
    "METADATA_PREFIX": "__METADATA__",
    "CONNECTOR_BATCH_SIZE": "512",
    "CONNECTOR_CONCURRENCY": "4",
    "SOURCE_CONCURRENCY": "4",
    "SINK_CONCURRENCY": "4",
    "RETRY_MAX": "3",
    "RETRY_BACKOFF_MS": "1000",
    "DRY_RUN": "false",
    "BUFFER_SIZE": "32",
}


def _parse_env_arg(arg: str) -> tuple[str, str]:
    key, sep, value = arg.partition("=")
    if not sep:
        raise ValueError(f"--env expects KEY=VALUE, got {arg!r}")
    return key.strip(), value


@dataclass
class Config:
    """Merged configuration: process env < explicit env args (last wins)."""

    values: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env_args: list[str] | None = None, environ: dict[str, str] | None = None) -> "Config":
        merged: dict[str, str] = dict(GENERIC_DEFAULTS)
        merged.update(environ if environ is not None else os.environ)
        for arg in env_args or []:
            k, v = _parse_env_arg(arg)
            merged[k] = v
        return cls(values=merged)

    def get(self, key: str, default: Any = None) -> Any:
        return self.values.get(key, default)

    def get_int(self, key: str, default: int = 0) -> int:
        v = self.values.get(key)
        return int(v) if v is not None and v != "" else default

    def get_bool(self, key: str, default: bool = False) -> bool:
        v = self.values.get(key)
        if v is None or v == "":
            return default
        return v.strip().lower() in ("1", "true", "yes", "on")

    def for_component(self, component: str) -> dict[str, str]:
        """All keys for ``COMPONENT__*``, prefix stripped, key lowercased.

        Mirrors the reference's struct-tag parsing of prefixed env vars
        (internal/config/util.go:41-53).
        """
        prefix = component.upper() + SEPARATOR
        return {
            k[len(prefix):].lower(): v
            for k, v in self.values.items()
            if k.startswith(prefix)
        }


def parse_rune(value: str | None) -> str | None:
    """Mirror the reference's rune parser for single-character config
    values like CSV delimiters (internal/config/util.go:54-68
    ``runeParser``): the two-character escape sequences ``\\t`` and
    ``\\n`` decode to the actual character, a single character passes
    through, anything else is a config error — the reference rejects
    multi-character delimiters rather than silently splitting on a
    multi-char separator."""
    if value is None or value == "":
        return None
    if value == "\\t":
        return "\t"
    if value == "\\n":
        return "\n"
    if len(value) == 1:
        return value
    raise ValueError(f"unable to parse {value!r} as rune")
