"""Fractional pixel-space read window derived from world bounds.

Semantics match the reference (/root/reference/src/window.rs:13-75):
invert the geotransform, map the 4 bounds corners to pixel space, take
the min/max envelope. ``window_transform`` translates the base affine
to the window origin.
"""

from __future__ import annotations

from dataclasses import dataclass

from .affine import Affine
from .bounds import Bounds


@dataclass(frozen=True)
class Window:
    x_offset: float
    y_offset: float
    width: float
    height: float


def window_from_bounds(transform: Affine, bounds: Bounds) -> Window:
    """World bounds → fractional pixel window. Ref src/window.rs:13-62."""
    inv = transform.invert()
    corners = [
        inv.multiply(bounds.xmin, bounds.ymin),
        inv.multiply(bounds.xmin, bounds.ymax),
        inv.multiply(bounds.xmax, bounds.ymin),
        inv.multiply(bounds.xmax, bounds.ymax),
    ]
    xs = [c[0] for c in corners]
    ys = [c[1] for c in corners]
    xmin, xmax = min(xs), max(xs)
    ymin, ymax = min(ys), max(ys)
    return Window(x_offset=xmin, y_offset=ymin, width=xmax - xmin, height=ymax - ymin)


def window_transform(window: Window, transform: Affine) -> Affine:
    """Affine of the windowed sub-raster. Ref src/window.rs:64-75."""
    x, y = transform.multiply(window.x_offset, window.y_offset)
    return Affine(a=transform.a, b=transform.b, c=x, d=transform.d, e=transform.e, f=y)
