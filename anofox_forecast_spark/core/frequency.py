"""Frequency model — Polars-style string parse, calendar-aware.

Reproduces the reference's ``Frequency`` semantics
(ref src/core/time_series.rs:20-81): duration units (s/m/h/d/w) are fixed
spans; months/quarters/years are calendar units whose addition clamps the
day-of-month (Jan 31 + 1mo = Feb 28/29; ref ``add_months``
src/core/time_series.rs:1014-1039 — Spark's builtin ``add_months`` has the
same clamping contract, which is why we map to it directly).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_FREQ_RE = re.compile(r"^\s*(\d+)\s*(mo|ms|us|ns|[smhdwqy])\s*$", re.IGNORECASE)

_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


@dataclass(frozen=True)
class Frequency:
    """A parsed frequency: either a fixed duration or a calendar span.

    ``kind`` ∈ {"duration", "months", "years"}; ``n`` is the multiple.
    For kind="duration", ``seconds`` is the fixed span length.
    """

    kind: str
    n: int

    @property
    def seconds(self) -> int:
        if self.kind != "duration":
            raise ValueError(f"calendar frequency {self} has no fixed seconds")
        return self.n

    @property
    def months(self) -> int:
        if self.kind == "months":
            return self.n
        if self.kind == "years":
            return self.n * 12
        raise ValueError(f"duration frequency {self} has no months")

    def sql_interval(self) -> str:
        """INTERVAL literal usable in ``sequence()`` / ``window()``."""
        if self.kind == "duration":
            return f"interval {self.n} seconds"
        return f"interval {self.months} months"

    def window_duration(self) -> str:
        """Duration string for ``F.window`` (duration kinds only)."""
        return f"{self.seconds} seconds"


def parse_frequency(freq: str) -> Frequency:
    """Parse "30s" / "5m" / "1h" / "1d" / "1w" / "1mo" / "1q" / "1y".

    Same surface as ref src/core/time_series.rs:42-81.
    """
    m = _FREQ_RE.match(freq)
    if not m:
        raise ValueError(f"unparseable frequency {freq!r}")
    n, unit = int(m.group(1)), m.group(2).lower()
    if n <= 0:
        raise ValueError(f"frequency multiple must be positive: {freq!r}")
    if unit in _SECONDS:
        return Frequency("duration", n * _SECONDS[unit])
    if unit == "mo":
        return Frequency("months", n)
    if unit == "q":
        return Frequency("months", 3 * n)
    if unit == "y":
        return Frequency("years", n)
    raise ValueError(f"unsupported frequency unit {unit!r} in {freq!r}")
