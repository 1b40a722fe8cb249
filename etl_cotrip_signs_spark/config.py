"""Engine configuration — reference-parity config semantics.

Mirrors the reference's TypeBox ``InputSchema`` (``/root/reference/task.ts:5-11``):
a required API token, three boolean geometry-allow flags defaulting to true,
and a debug flag defaulting to false — with runtime validation that raises on
a missing token (``task.ts:51-55``) and allow-list construction from the
flags (``task.ts:103-106``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    """Raised when required configuration is missing (task.ts:54)."""


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass(frozen=True)
class SignsConfig:
    """Validated, defaulted config for the signs pipeline (A4/A8)."""

    cotrip_token: str
    point: bool = True
    linestring: bool = True
    polygon: bool = True
    debug: bool = False
    api_base: str = "https://data.cotrip.org/api/v1/signs"

    def __post_init__(self) -> None:
        if not self.cotrip_token:
            raise ConfigError("No COTrip API Token Provided")

    def allowed_types(self) -> list[str]:
        """Geometry allow-list from the boolean flags (task.ts:103-106)."""
        allowed: list[str] = []
        if self.point:
            allowed.append("Point")
        if self.linestring:
            allowed.append("LineString")
        if self.polygon:
            allowed.append("Polygon")
        return allowed

    @classmethod
    def from_env(cls) -> "SignsConfig":
        """Read config from environment with reference defaults (task.ts:51-55)."""
        return cls(
            cotrip_token=os.environ.get("COTRIP_TOKEN", ""),
            point=_env_bool("COTRIP_POINT", True),
            linestring=_env_bool("COTRIP_LINESTRING", True),
            polygon=_env_bool("COTRIP_POLYGON", True),
            debug=_env_bool("COTRIP_DEBUG", False),
        )
