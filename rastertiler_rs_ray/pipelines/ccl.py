"""Distributed raster connected-component labeling (CCL).

The classic two-phase distributed CCL plan (the raster analog of the
dedup family's union-find topology):

1. **Local labeling** (map-only): each block labels its own pixels with
   a pixel-grid union-find over the block's internal 4-adjacency edges
   (equal value, both non-nodata).  Local labels are made globally
   unique by packing the block address into the high bits.
2. **Seam exchange** (one narrow shuffle): each block emits its east
   column and south row — O(perimeter), never the block body — keyed by
   the seam it shares with its neighbor; a ``map_groups`` over seams
   matches adjacent pixels and yields cross-block label pairs.
3. **Global union-find**: the pairs stream into
   ``dedup.connected_components`` (sharded two-level union-find — the
   same engine that merges MinHash buckets), and the root map — sized
   by the number of seam-CROSSING components, not pixels — is broadcast
   back over the labeled blocks.

Scale contract: pixels shuffle zero times (seam strips are
4·chunk/chunk² ≈ 3% of pixels at chunk=128, labels stay block-local);
the only all-to-all is the seam groupby and the component-stats
aggregate, both O(perimeter + components).  No driver-side state beyond
the broadcast root map.

The reference has no focal/global raster op (its kernel is pure
point-sampling, /root/reference/src/dataset.rs:121-196); CCL is part of
the graft surface (region extraction / mask vectorization — the step
between "rendered mask tiles" and "polygon features").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_LOCAL_BITS = 24  # local labels per block < 2^24 (chunk ≤ 4096)


def _label_block_local(vals: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """4-connected CCL of one block.  Returns int64 labels (flat pixel
    index of the component's minimum pixel) with -1 at invalid pixels.

    Fully vectorized label-equivalence CCL (the Playne–Hawick GPU
    scheme re-expressed in numpy): alternate full pointer-jump
    compression with a min-hook over every violated edge
    (``np.minimum.at``) until no edge joins two roots.  Unions always
    point the larger root at the smaller, so the invariant
    ``parent[x] <= x`` holds and the final compressed label of every
    pixel is the component's minimum flat index — the same label
    contract as a sequential union-by-min.  Converges in
    O(log diameter) rounds of pure numpy passes; no per-edge Python.
    """
    h, w = vals.shape
    n = h * w
    idx = np.arange(n, dtype=np.int64).reshape(h, w)

    right = valid[:, :-1] & valid[:, 1:] & (vals[:, :-1] == vals[:, 1:])
    down = valid[:-1, :] & valid[1:, :] & (vals[:-1, :] == vals[1:, :])
    us = np.concatenate([idx[:, :-1][right], idx[:-1, :][down]])
    vs = np.concatenate([idx[:, 1:][right], idx[1:, :][down]])

    parent = np.arange(n, dtype=np.int64)
    while True:
        while True:  # full path compression by pointer jumping
            gp = parent[parent]
            if np.array_equal(gp, parent):
                break
            parent = gp
        ru, rv = parent[us], parent[vs]
        lo = np.minimum(ru, rv)
        hi = np.maximum(ru, rv)
        m = lo != hi
        if not m.any():
            break
        np.minimum.at(parent, hi[m], lo[m])
    labels = np.where(valid.ravel(), parent, np.int64(-1))
    return labels


def _pack_gid(bx: np.ndarray, by: np.ndarray, local: np.ndarray) -> np.ndarray:
    block_id = (by.astype(np.int64) << np.int64(20)) | bx.astype(np.int64)
    return (block_id << np.int64(_LOCAL_BITS)) | local.astype(np.int64)


def label_blocks_local(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int = 0,
    quantize_shift: int = 0,
) -> ray.data.Dataset:
    """Phase 1: per-block local CCL.  Input rows (bx, by, pixels:binary
    uint8 chunk²); output adds ``labels`` (binary int64 chunk², globally
    unique gids, -1 = nodata) and ``qvals`` (binary uint8, the quantized
    values actually labeled).  ``quantize_shift`` right-shifts values
    before labeling (noise → blobs) — nodata is decided BEFORE the
    shift."""

    def f(batch: pa.Table) -> pa.Table:
        bxs = batch.column("bx").to_numpy(zero_copy_only=False)
        bys = batch.column("by").to_numpy(zero_copy_only=False)
        out_labels, out_q = [], []
        for i in range(len(batch)):
            vals = np.frombuffer(
                batch.column("pixels")[i].as_py(), dtype=np.uint8
            ).reshape(chunk, chunk)
            valid = vals != nodata
            q = (vals >> quantize_shift).astype(np.uint8)
            labels = _label_block_local(q, valid)
            gids = np.where(
                labels >= 0,
                _pack_gid(
                    np.int64(bxs[i]), np.int64(bys[i]), np.maximum(labels, 0)
                ),
                np.int64(-1),
            )
            out_labels.append(gids.tobytes())
            out_q.append(q.tobytes())
        return pa.table(
            {
                "bx": batch.column("bx"),
                "by": batch.column("by"),
                "labels": pa.array(out_labels, pa.binary()),
                "qvals": pa.array(out_q, pa.binary()),
            }
        )

    return blocks.map_batches(f, batch_format="pyarrow")


def _seam_pairs(labeled: ray.data.Dataset, *, chunk: int) -> ray.data.Dataset:
    """Phase 2: emit east/south boundary strips keyed by shared seam,
    match adjacent equal-valued pixels per seam → (u, v) gid pairs."""

    def emit(batch: pa.Table) -> pa.Table:
        keys, sides, poss, vals_, gids_ = [], [], [], [], []
        bxs = batch.column("bx").to_numpy(zero_copy_only=False)
        bys = batch.column("by").to_numpy(zero_copy_only=False)
        pos = np.arange(chunk, dtype=np.int32)
        for i in range(len(batch)):
            lab = np.frombuffer(
                batch.column("labels")[i].as_py(), dtype=np.int64
            ).reshape(chunk, chunk)
            q = np.frombuffer(
                batch.column("qvals")[i].as_py(), dtype=np.uint8
            ).reshape(chunk, chunk)
            bx, by = int(bxs[i]), int(bys[i])
            # four strips: the seam key is the WEST/NORTH block of the
            # pair, axis flag in bit 62 of the key
            strips = [
                # (key_bx, key_by, axis, side, values, labels)
                (bx, by, 0, 1, q[:, -1], lab[:, -1]),       # my east col
                (bx - 1, by, 0, 0, q[:, 0], lab[:, 0]),      # west seam, I'm the east side
                (bx, by, 1, 1, q[-1, :], lab[-1, :]),         # my south row
                (bx, by - 1, 1, 0, q[0, :], lab[0, :]),       # north seam, I'm the south side
            ]
            for kbx, kby, axis, side, vv, ll in strips:
                key = (
                    (np.int64(axis) << np.int64(62))
                    | (np.int64(kby + 1) << np.int64(21))
                    | np.int64(kbx + 1)
                )
                keys.append(np.full(chunk, key, dtype=np.int64))
                sides.append(np.full(chunk, side, dtype=np.int8))
                poss.append(pos)
                vals_.append(vv.astype(np.int16))
                gids_.append(ll)
        if not keys:
            return pa.table(
                {
                    "seam": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "pos": pa.array([], pa.int32()),
                    "val": pa.array([], pa.int16()),
                    "gid": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "seam": pa.array(np.concatenate(keys)),
                "side": pa.array(np.concatenate(sides)),
                "pos": pa.array(np.concatenate(poss)),
                "val": pa.array(np.concatenate(vals_)),
                "gid": pa.array(np.concatenate(gids_)),
            }
        )

    strips = labeled.map_batches(emit, batch_format="pyarrow")
    # Coalesce the narrow strips before the seam groupby: the sort
    # shuffle's fixed cost scales with INPUT block count, and strips
    # inherit one tiny block per labeled raster block (each strip row
    # is ~20 B × chunk).  ~64 source blocks of strips per partition
    # keeps partitions well under a MB while cutting shuffle task count
    # ~64×; the CPU floor preserves match-stage parallelism.
    try:
        nb = labeled.num_blocks()
    except Exception:  # lineage not materialized — leave as-is
        nb = None
    if nb is not None and nb > 1:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        strips = strips.repartition(max(min(cpus, nb), nb // 64))

    def match(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1]
        right = g[g["side"] == 0]
        if left.empty or right.empty:  # border seam: neighbor absent
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        m = left.merge(right, on="pos", suffixes=("_l", "_r"))
        m = m[
            (m["val_l"] == m["val_r"]) & (m["gid_l"] >= 0) & (m["gid_r"] >= 0)
        ]
        return pd.DataFrame(
            {"u": m["gid_l"].to_numpy(np.int64), "v": m["gid_r"].to_numpy(np.int64)}
        ).drop_duplicates()

    return strips.groupby("seam").map_groups(match, batch_format="pandas")


def _labels_and_roots(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int,
    quantize_shift: int,
):
    """Shared core: locally-labeled blocks (gids, NOT yet canonical) +
    the broadcast root map as (sorted nodes, components, sorted unique
    canonical ids of seam-crossing components)."""
    from .dedup import connected_components

    labeled = label_blocks_local(
        blocks, chunk=chunk, nodata=nodata, quantize_shift=quantize_shift
    ).materialize()
    pairs = _seam_pairs(labeled, chunk=chunk)
    roots = connected_components(pairs).to_pandas()
    nodes = roots["node"].to_numpy(np.int64)
    comps = roots["component"].to_numpy(np.int64)
    order = np.argsort(nodes, kind="mergesort")
    root_map_ref = ray.put(
        (nodes[order], comps[order], np.unique(comps))
    )
    return labeled, root_map_ref


def _map_sorted(nodes: np.ndarray, comps: np.ndarray, uniq: np.ndarray) -> np.ndarray:
    """uniq gids → canonical ids via sorted-array lookup (absent = self)."""
    if not len(nodes):
        return uniq
    pos = np.minimum(np.searchsorted(nodes, uniq), len(nodes) - 1)
    hit = nodes[pos] == uniq
    return np.where(hit, comps[pos], uniq)


def connected_component_labels(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int = 0,
    quantize_shift: int = 0,
) -> ray.data.Dataset:
    """Full distributed CCL: returns labeled blocks (bx, by, labels:
    binary int64 chunk² of GLOBAL component ids, -1 = nodata, qvals).
    Component id = minimum gid in the component (deterministic)."""
    labeled, root_map_ref = _labels_and_roots(
        blocks, chunk=chunk, nodata=nodata, quantize_shift=quantize_shift
    )

    def apply_roots(batch: pa.Table) -> pa.Table:
        nodes, comps, _canon = ray.get(root_map_ref)
        out = []
        for i in range(len(batch)):
            lab = np.frombuffer(batch.column("labels")[i].as_py(), dtype=np.int64)
            if len(nodes):
                # vectorized sorted-array lookup: labels absent from the
                # seam-crossing root map keep their own gid
                uniq, inv = np.unique(lab, return_inverse=True)
                lab = _map_sorted(nodes, comps, uniq)[inv]
            out.append(lab.tobytes())
        return pa.table(
            {
                "bx": batch.column("bx"),
                "by": batch.column("by"),
                "labels": pa.array(out, pa.binary()),
                "qvals": batch.column("qvals"),
            }
        )

    return labeled.map_batches(apply_roots, batch_format="pyarrow")


def component_stats(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int = 0,
    quantize_shift: int = 0,
    min_pixels: int = 1,
) -> ray.data.Dataset:
    """(component, value, n_pixels) per global component.

    Only the SEAM-CROSSING components shuffle: the partial pass maps
    each block's local gids through the broadcast root map and splits
    its per-component rows on canonical-id membership — a component
    confined to one block is already final (its id appears in no other
    block by construction) and streams straight to the output, while
    the boundary components (O(perimeter), ~0.5% of components at
    chunk=256) go through the groupby merge.  Turns the all-to-all
    over every component into one over the seam survivors — same
    contract as the rest of the module (pixels never shuffle, and now
    interior components don't either).
    """
    labeled, root_map_ref = _labels_and_roots(
        blocks, chunk=chunk, nodata=nodata, quantize_shift=quantize_shift
    )

    def partial(batch: pa.Table) -> pa.Table:
        nodes, comps, canon = ray.get(root_map_ref)
        out_c, out_v, out_n, out_b = [], [], [], []
        for i in range(len(batch)):
            lab = np.frombuffer(batch.column("labels")[i].as_py(), dtype=np.int64)
            q = np.frombuffer(batch.column("qvals")[i].as_py(), dtype=np.uint8)
            keep = lab >= 0
            if not keep.any():
                continue
            uniq, first_idx, counts = np.unique(
                lab[keep], return_index=True, return_counts=True
            )
            mapped = _map_sorted(nodes, comps, uniq)
            pos = np.minimum(np.searchsorted(canon, mapped), max(len(canon) - 1, 0))
            boundary = (
                (canon[pos] == mapped) if len(canon) else np.zeros(len(mapped), bool)
            )
            out_c.append(mapped)
            out_v.append(q[keep][first_idx].astype(np.int64))
            out_n.append(counts.astype(np.int64))
            out_b.append(boundary)
        if not out_c:
            return pa.table(
                {
                    "component": pa.array([], pa.int64()),
                    "value": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "boundary": pa.array([], pa.bool_()),
                }
            )
        return pa.table(
            {
                "component": pa.array(np.concatenate(out_c)),
                "value": pa.array(np.concatenate(out_v)),
                "n": pa.array(np.concatenate(out_n)),
                "boundary": pa.array(np.concatenate(out_b)),
            }
        )

    partials = labeled.map_batches(partial, batch_format="pyarrow").materialize()

    def interior_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.invert(batch.column("boundary")))
        return pa.table(
            {
                "component": t.column("component"),
                "value": t.column("value"),
                "n_pixels": t.column("n"),
            }
        )

    final_interior = partials.map_batches(interior_only, batch_format="pyarrow")

    def boundary_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("boundary"))
        return t.drop_columns(["boundary"])

    merged = (
        partials.map_batches(boundary_only, batch_format="pyarrow")
        .groupby(["component", "value"])
        .sum("n")
    )

    def finalize_merged(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component": batch.column("component"),
                "value": batch.column("value"),
                "n_pixels": batch.column("sum(n)"),
            }
        )

    out = final_interior.union(merged.map_batches(finalize_merged, batch_format="pyarrow"))
    if min_pixels > 1:
        def thresh(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pa.compute.greater_equal(batch.column("n_pixels"), pa.scalar(min_pixels))
            )

        out = out.map_batches(thresh, batch_format="pyarrow")
    return out


def component_bboxes(
    blocks: ray.data.Dataset,
    *,
    chunk: int,
    nodata: int = 0,
    quantize_shift: int = 0,
    min_pixels: int = 1,
) -> ray.data.Dataset:
    """Raster polygonize, step 1: per global component, the bounding
    box in GLOBAL pixel coordinates plus pixel count and value —
    ``(component, value, x0, y0, x1, y1, n_pixels)``, boxes inclusive.

    The mask→features bridge: after CCL, each component row is a
    feature candidate (building footprint, burn scar, cloud mask blob)
    that downstream vector stages (cell index, PIP, spatial join) can
    consume without ever touching pixels again.

    Same boundary-split plan as ``component_stats``: per-block partials
    (np.minimum/maximum.at over local unique labels, gids mapped to
    canonical through the broadcast root map) — interior components
    stream straight to the output, only seam-crossing ones go through
    the min/max/sum groupby.
    """
    from ray.data.aggregate import Max, Min, Sum

    labeled, root_map_ref = _labels_and_roots(
        blocks, chunk=chunk, nodata=nodata, quantize_shift=quantize_shift
    )

    COLS = ["component", "value", "x0", "y0", "x1", "y1", "n"]

    def partial(batch: pa.Table) -> pa.Table:
        nodes, comps, canon = ray.get(root_map_ref)
        acc = {c: [] for c in COLS}
        bnd = []
        bxs = batch.column("bx").to_numpy(zero_copy_only=False)
        bys = batch.column("by").to_numpy(zero_copy_only=False)
        for i in range(len(batch)):
            lab = np.frombuffer(batch.column("labels")[i].as_py(), dtype=np.int64)
            q = np.frombuffer(batch.column("qvals")[i].as_py(), dtype=np.uint8)
            keep = lab >= 0
            if not keep.any():
                continue
            flat = np.nonzero(keep)[0]
            gx = int(bxs[i]) * chunk + (flat % chunk)
            gy = int(bys[i]) * chunk + (flat // chunk)
            uniq, inv, counts = np.unique(
                lab[keep], return_inverse=True, return_counts=True
            )
            k = len(uniq)
            x0 = np.full(k, np.iinfo(np.int64).max)
            y0 = np.full(k, np.iinfo(np.int64).max)
            x1 = np.full(k, np.iinfo(np.int64).min)
            y1 = np.full(k, np.iinfo(np.int64).min)
            np.minimum.at(x0, inv, gx)
            np.minimum.at(y0, inv, gy)
            np.maximum.at(x1, inv, gx)
            np.maximum.at(y1, inv, gy)
            first_idx = np.unique(lab[keep], return_index=True)[1]
            mapped = _map_sorted(nodes, comps, uniq)
            pos = np.minimum(np.searchsorted(canon, mapped), max(len(canon) - 1, 0))
            boundary = (
                (canon[pos] == mapped) if len(canon) else np.zeros(k, bool)
            )
            acc["component"].append(mapped)
            acc["value"].append(q[keep][first_idx].astype(np.int64))
            acc["x0"].append(x0)
            acc["y0"].append(y0)
            acc["x1"].append(x1)
            acc["y1"].append(y1)
            acc["n"].append(counts.astype(np.int64))
            bnd.append(boundary)
        if not acc["component"]:
            cols = {c: pa.array([], pa.int64()) for c in COLS}
            cols["boundary"] = pa.array([], pa.bool_())
            return pa.table(cols)
        cols = {c: pa.array(np.concatenate(acc[c])) for c in COLS}
        cols["boundary"] = pa.array(np.concatenate(bnd))
        return pa.table(cols)

    partials = labeled.map_batches(partial, batch_format="pyarrow").materialize()

    def interior_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.invert(batch.column("boundary")))
        return pa.table(
            {
                "component": t.column("component"),
                "value": t.column("value"),
                "x0": t.column("x0"),
                "y0": t.column("y0"),
                "x1": t.column("x1"),
                "y1": t.column("y1"),
                "n_pixels": t.column("n"),
            }
        )

    final_interior = partials.map_batches(interior_only, batch_format="pyarrow")

    def boundary_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("boundary")).drop_columns(["boundary"])

    merged = (
        partials.map_batches(boundary_only, batch_format="pyarrow")
        .groupby("component")
        .aggregate(
            Max("value"),  # constant within a component; max = the value
            Min("x0"),
            Min("y0"),
            Max("x1"),
            Max("y1"),
            Sum("n"),
        )
    )

    def finalize_merged(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component": batch.column("component"),
                "value": batch.column("max(value)"),
                "x0": batch.column("min(x0)"),
                "y0": batch.column("min(y0)"),
                "x1": batch.column("max(x1)"),
                "y1": batch.column("max(y1)"),
                "n_pixels": batch.column("sum(n)"),
            }
        )

    out = final_interior.union(
        merged.map_batches(finalize_merged, batch_format="pyarrow")
    )
    if min_pixels > 1:
        def thresh(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pa.compute.greater_equal(batch.column("n_pixels"), pa.scalar(min_pixels))
            )

        out = out.map_batches(thresh, batch_format="pyarrow")
    return out
