"""Deterministic interleaved text+media document table (the graft input).

Schema per BASELINE.json input_hint::

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

``media_ref`` for media spans is ``geo://{lon:.6f},{lat:.6f}/{asset}``
— the document's geo position, drawn from a skewed mixture (dense
clusters + uniform background) so dense zoom levels genuinely exercise
salting (FIXTURES.md §A1). Every pixel of randomness derives from the
doc *index* via a counter-mode hash, so generation is independent of
batch partitioning: any worker generating any block produces identical
rows (determinism across parallelism).

~1/10 docs have no media span (no geo position → excluded from spatial
ops); span kinds alternate text/media with the first span always text.

The per-row invariant every pipeline must preserve: the ordered
sequence of (kind, text, media_ref) — see ``span_signatures``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

# fixed skewed cluster mixture (lon, lat, sigma_deg, weight)
CLUSTERS = [
    (-122.42, 37.77, 0.8),   # SF
    (2.35, 48.86, 0.6),      # Paris
    (139.69, 35.68, 0.7),    # Tokyo
    (151.21, -33.87, 0.9),   # Sydney
    (-58.38, -34.60, 0.8),   # Buenos Aires
]
CLUSTER_WEIGHT = 0.7  # fraction of geo docs in clusters (skew)

_WORDS = [
    "tile", "raster", "vector", "merge", "zoom", "pixel", "cell", "index",
    "join", "query", "batch", "actor", "shuffle", "stream", "block", "hash",
]


def _mix(i: np.ndarray, k: int, seed: int) -> np.ndarray:
    i = i.astype(np.uint64)
    h = i * np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(
        ((k * 0xC2B2AE3D27D4EB4F) ^ (seed * 0xD6E8FEB86659FD93)) & 0xFFFFFFFFFFFFFFFF
    )
    h ^= h >> np.uint64(32)
    h *= np.uint64(0xD6E8FEB86659FD93)
    h ^= h >> np.uint64(29)
    return h


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 hash → float64 in [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def doc_positions(idx: np.ndarray, seed: int = 42):
    """Vectorized doc index → (lon, lat, has_geo). Pure function of index."""
    idx = np.asarray(idx)
    has_geo = (_mix(idx, 1, seed) % np.uint64(10)) != np.uint64(0)
    in_cluster = _unit(_mix(idx, 2, seed)) < CLUSTER_WEIGHT
    ci = (_mix(idx, 3, seed) % np.uint64(len(CLUSTERS))).astype(np.int64)
    centers = np.array([(c[0], c[1]) for c in CLUSTERS])
    sigmas = np.array([c[2] for c in CLUSTERS])
    # box-muller from two uniforms for gaussian cluster scatter
    u1 = np.clip(_unit(_mix(idx, 4, seed)), 1e-12, 1.0)
    u2 = _unit(_mix(idx, 5, seed))
    r = np.sqrt(-2.0 * np.log(u1))
    g1 = r * np.cos(2 * np.pi * u2)
    g2 = r * np.sin(2 * np.pi * u2)
    clon = centers[ci, 0] + g1 * sigmas[ci]
    clat = centers[ci, 1] + g2 * sigmas[ci]
    ulon = _unit(_mix(idx, 6, seed)) * 360.0 - 180.0
    ulat = _unit(_mix(idx, 7, seed)) * 160.0 - 80.0
    lon = np.where(in_cluster, clon, ulon)
    lat = np.where(in_cluster, clat, ulat)
    lon = np.clip(lon, -179.999999, 179.999999)
    lat = np.clip(lat, -84.9, 84.9)
    return lon, lat, has_geo


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    idx = batch.column("id").to_numpy()
    n = len(idx)
    lon, lat, has_geo = doc_positions(idx, seed)
    n_spans = (1 + _mix(idx, 8, seed) % np.uint64(6)).astype(np.int64)

    doc_ids = [f"doc-{i:012d}" for i in idx.tolist()]

    # precompute per-(doc, span-slot) hashes in vectorized passes
    max_spans = int(n_spans.max()) if n else 0
    span_h = np.stack([_mix(idx, 100 + s, seed) for s in range(max_spans)]) if n else None
    slot_h = _mix(idx, 9, seed)

    kinds: list[str] = []
    texts: list[str] = []
    refs: list[str] = []
    offsets_flat: list[int] = []
    list_offsets = [0]
    for j in range(n):
        ns = int(n_spans[j])
        geo = bool(has_geo[j])
        # media span slot ∈ [1, ns-1] (forced when doc has geo and ns > 1)
        media_slot = 1 + int(slot_h[j] % np.uint64(ns - 1)) if ns > 1 else -1
        offset = 0
        for s in range(ns):
            h = int(span_h[s, j])
            if geo and s == media_slot:
                kinds.append("media")
                texts.append("")
                refs.append(f"geo://{lon[j]:.6f},{lat[j]:.6f}/img{h % 997}.png")
                offsets_flat.append(offset)
                offset += 1
            else:
                w = [_WORDS[(h >> (4 * t)) % len(_WORDS)] for t in range(3 + h % 5)]
                txt = " ".join(w)
                kinds.append("text")
                texts.append(txt)
                refs.append("")
                offsets_flat.append(offset)
                offset += len(txt)
        # single-span geo docs: append the media span at the end
        if geo and ns == 1:
            h = int(slot_h[j])
            kinds.append("media")
            texts.append("")
            refs.append(f"geo://{lon[j]:.6f},{lat[j]:.6f}/img{h % 997}.png")
            offsets_flat.append(offset)
        list_offsets.append(len(kinds))

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kinds, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(refs, pa.string()),
            pa.array(offsets_flat, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
    return pa.table({"doc_id": pa.array(doc_ids, pa.string()), "spans": spans})


def generate_documents(
    n: int, seed: int = 42, *, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Distributed deterministic generation of the interleaved doc table."""
    return ray.data.range(n, override_num_blocks=override_num_blocks).map_batches(
        lambda b: _gen_batch(b, seed), batch_format="pyarrow"
    )


def span_signatures(batch: pa.Table) -> dict[str, str]:
    """doc_id → sha256 over the ordered (kind, text, media_ref) sequence.

    The invariant checked after every pipeline (input_hint): surviving
    rows must have byte-identical span sequences. Test helper.
    """
    out = {}
    spans = batch.column("spans")
    ids = batch.column("doc_id").to_pylist()
    for i, doc in enumerate(ids):
        h = hashlib.sha256()
        for item in spans[i].as_py():
            h.update(item["kind"].encode())
            h.update(b"\x00")
            h.update(item["text"].encode())
            h.update(b"\x00")
            h.update(item["media_ref"].encode())
            h.update(b"\x01")
        out[doc] = h.hexdigest()
    return out
