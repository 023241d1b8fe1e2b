"""Axis-aligned bounds rectangle (CRS-contextual, like the reference).

Reference: /root/reference/src/bounds.rs:1-7 — a plain 4-float struct.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Bounds:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def as_tuple(self) -> tuple[float, float, float, float]:
        return (self.xmin, self.ymin, self.xmax, self.ymax)

    def intersects(self, other: "Bounds") -> bool:
        return not (
            self.xmax <= other.xmin
            or self.xmin >= other.xmax
            or self.ymax <= other.ymin
            or self.ymin >= other.ymax
        )
