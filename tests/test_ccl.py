"""Distributed raster CCL vs a single-process BFS labeling oracle."""

import dataclasses

import numpy as np
import pyarrow as pa
import ray.data

from rastertiler_rs_ray.pipelines.ccl import (
    component_stats,
    connected_component_labels,
)
from rastertiler_rs_ray.pipelines.focal import raster_blocks_dataset
from rastertiler_rs_ray.raster.synthetic import default_u8_raster

CHUNK = 32


def _full_grid(spec, bx0, by0, bx1, by1, chunk):
    from rastertiler_rs_ray.raster.synthetic import SyntheticRaster

    r = SyntheticRaster.from_spec(spec)
    cols = np.arange(bx0 * chunk, bx1 * chunk, dtype=np.int64)[None, :]
    rows = np.arange(by0 * chunk, by1 * chunk, dtype=np.int64)[:, None]
    return r.values_at(cols, rows).astype(np.uint8)


def _bfs_label(vals, valid):
    """Reference 4-connected labeling (iterative BFS)."""
    h, w = vals.shape
    labels = -np.ones((h, w), dtype=np.int64)
    nxt = 0
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or labels[r, c] >= 0:
                continue
            stack = [(r, c)]
            labels[r, c] = nxt
            while stack:
                y, x = stack.pop()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx_ = y + dy, x + dx
                    if (
                        0 <= ny < h
                        and 0 <= nx_ < w
                        and valid[ny, nx_]
                        and labels[ny, nx_] < 0
                        and vals[ny, nx_] == vals[y, x]
                    ):
                        labels[ny, nx_] = nxt
                        stack.append((ny, nx_))
            nxt += 1
    return labels, nxt


def _spec():
    r = default_u8_raster(seed=42)
    return {
        "dtype": r.dtype,
        "nodata": r.nodata,
        "width": r.width,
        "height": r.height,
        "transform": list(dataclasses.astuple(r.transform)),
        "seed": r.seed,
        "block": 24,  # small structural blocks → nodata/constant regions in range
    }


def test_ccl_matches_bfs_oracle(ray_session):
    spec = _spec()
    shift = 6
    bx0, by0, bx1, by1 = 0, 0, 3, 3
    blocks = raster_blocks_dataset(spec, bx0, by0, bx1, by1, chunk=CHUNK)
    labeled = connected_component_labels(
        blocks, chunk=CHUNK, nodata=0, quantize_shift=shift
    ).take_all()

    # assemble the distributed labeling into one grid
    h = (by1 - by0) * CHUNK
    w = (bx1 - bx0) * CHUNK
    got = np.empty((h, w), dtype=np.int64)
    for row in labeled:
        lab = np.frombuffer(row["labels"], dtype=np.int64).reshape(CHUNK, CHUNK)
        y0 = (row["by"] - by0) * CHUNK
        x0 = (row["bx"] - bx0) * CHUNK
        got[y0 : y0 + CHUNK, x0 : x0 + CHUNK] = lab

    vals = _full_grid(spec, bx0, by0, bx1, by1, CHUNK)
    valid = vals != 0
    q = (vals >> shift).astype(np.uint8)
    want, n_comp = _bfs_label(q, valid)

    # nodata masks agree
    assert np.array_equal(got < 0, want < 0)
    # the labelings are the SAME PARTITION: bijection between label sets
    both = valid
    pairs = set(zip(got[both].tolist(), want[both].tolist()))
    assert len(pairs) == n_comp  # each oracle label ↔ exactly one got label
    assert len({g for g, _ in pairs}) == n_comp
    assert n_comp > 50  # non-trivial instance
    # components genuinely cross block seams (otherwise the test is vacuous)
    seam_cross = np.sum(
        (got[:, CHUNK - 1] == got[:, CHUNK]) & (got[:, CHUNK - 1] >= 0)
    )
    assert seam_cross > 0


def test_component_stats_match_label_grid(ray_session):
    spec = _spec()
    blocks = raster_blocks_dataset(spec, 0, 0, 2, 2, chunk=CHUNK)
    stats = component_stats(blocks, chunk=CHUNK, nodata=0, quantize_shift=6).to_pandas()

    vals = _full_grid(spec, 0, 0, 2, 2, CHUNK)
    valid = vals != 0
    q = (vals >> 6).astype(np.uint8)
    want, n_comp = _bfs_label(q, valid)

    assert len(stats) == n_comp
    assert int(stats["n_pixels"].sum()) == int(valid.sum())
    # size multiset matches the oracle's
    want_sizes = sorted(np.bincount(want[valid]).tolist())
    assert sorted(stats["n_pixels"].tolist()) == want_sizes
    # every component's value is consistent with its pixels
    comp_val = {}
    for row in stats.itertuples():
        comp_val[row.component] = row.value
    # min-gid determinism: component ids are unique
    assert stats["component"].is_unique


def test_component_bboxes_match_oracle(ray_session):
    from rastertiler_rs_ray.pipelines.ccl import component_bboxes

    spec = _spec()
    blocks = raster_blocks_dataset(spec, 0, 0, 2, 2, chunk=CHUNK)
    got = component_bboxes(
        blocks, chunk=CHUNK, nodata=0, quantize_shift=6
    ).to_pandas()

    vals = _full_grid(spec, 0, 0, 2, 2, CHUNK)
    valid = vals != 0
    q = (vals >> 6).astype(np.uint8)
    want, n_comp = _bfs_label(q, valid)

    assert len(got) == n_comp
    # compare as multisets of (value, x0, y0, x1, y1, n) — label ids differ
    def key(v, x0, y0, x1, y1, n):
        return (int(v), int(x0), int(y0), int(x1), int(y1), int(n))

    want_rows = []
    for lbl in range(n_comp):
        ys, xs = np.nonzero(want == lbl)
        want_rows.append(
            key(q[ys[0], xs[0]], xs.min(), ys.min(), xs.max(), ys.max(), len(xs))
        )
    got_rows = [
        key(r.value, r.x0, r.y0, r.x1, r.y1, r.n_pixels) for r in got.itertuples()
    ]
    assert sorted(got_rows) == sorted(want_rows)
