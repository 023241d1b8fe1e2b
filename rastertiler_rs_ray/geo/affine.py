"""6-parameter affine geotransform, rasterio parameter ordering.

Semantics match the reference (/root/reference/src/affine.rs):
``(a, b, c, d, e, f)`` maps pixel (col, row) → world:
``x = a*col + b*row + c``; ``y = d*col + e*row + f``.
GDAL order is ``[c, a, b, f, d, e]``.

``multiply`` is vectorized: pass numpy arrays for (x, y) to transform
whole coordinate columns at once inside map_batches kernels.
"""

from __future__ import annotations

from dataclasses import dataclass



@dataclass(frozen=True)
class Affine:
    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @staticmethod
    def from_gdal(t) -> "Affine":
        """GDAL [c,a,b,f,d,e] → rasterio (a,b,c,d,e,f). Ref src/affine.rs:30-39."""
        return Affine(a=t[1], b=t[2], c=t[0], d=t[4], e=t[5], f=t[3])

    def to_gdal(self) -> list[float]:
        return [self.c, self.a, self.b, self.f, self.d, self.e]

    def invert(self) -> "Affine":
        """Inverse transform via 2×2 determinant. Ref src/affine.rs:45-60."""
        inv_det = 1.0 / (self.a * self.e - self.b * self.d)
        a = self.e * inv_det
        b = -self.b * inv_det
        d = -self.d * inv_det
        e = self.a * inv_det
        return Affine(
            a=a,
            b=b,
            c=-self.c * a - self.f * b,
            d=d,
            e=e,
            f=-self.c * d - self.f * e,
        )

    def multiply(self, x, y):
        """Apply to point(s); accepts scalars or arrays. Ref src/affine.rs:62-67."""
        return (
            x * self.a + y * self.b + self.c,
            x * self.d + y * self.e + self.f,
        )

    def scale(self, sx: float, sy: float) -> "Affine":
        """Scale a and e only (resolution change). Ref src/affine.rs:69-78."""
        return Affine(self.a * sx, self.b, self.c, self.d, self.e * sy, self.f)

    def resolution(self) -> tuple[float, float]:
        return (abs(self.a), abs(self.e))
