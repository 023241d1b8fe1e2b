"""Table sources: Parquet-backed with a Lance-style swappable API.

The north rule names Lance tables as the input format; ``lance`` /
``ray.data.read_lance`` are not installable in this environment, so
``LanceStyleTable`` wraps ``ray.data.read_parquet`` behind the same
open/read surface and can be re-pointed at Lance when available.
Column pruning is always pushed to the read.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read one of the standard test tables with column pruning."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


@dataclass(frozen=True)
class LanceStyleTable:
    """A dataset-on-disk handle (directory or single file of parquet)."""

    path: str

    def to_dataset(self, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
        # literal gate: prefer the Lance reader when the format/library
        # exists (not installable in this environment), else parquet —
        # both push column pruning into the read
        if self.path.endswith(".lance"):
            try:
                import lance  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "path looks like a Lance dataset but the 'lance' "
                    "package is not installed"
                ) from e
            return ray.data.read_lance(self.path, columns=columns, **kwargs)
        return ray.data.read_parquet(self.path, columns=columns, **kwargs)

    def count_rows(self) -> int:
        import pyarrow.dataset as pads

        return pads.dataset(self.path, format="parquet").count_rows()

    def schema(self):
        import pyarrow.dataset as pads

        return pads.dataset(self.path, format="parquet").schema
