"""First-class operators over the interleaved span payload.

The engine's input table (input_hint) is
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
— interleaved text + media documents.  These operators flatten that
nesting for span-level processing and rebuild it bit-exactly, with the
per-row invariant (ordered (kind, text, media_ref) span-sequence
equality, ``sources.docs.span_signatures``) pinned by a round-trip
test.

Scale contracts:

- ``explode_spans`` is batch-local: the list offsets and child arrays
  of a block flatten with Arrow kernels (zero per-row Python); a doc's
  spans never leave the block that holds the doc.
- ``spans_to_text`` is likewise batch-local (per-doc ordered join of
  the text spans).
- ``reassemble_spans`` is the one shuffle: span rows co-locate by a
  coarse hash(doc) shard (same topology as ``dedup.exact_dedup``),
  and each shard rebuilds its docs with one vectorized sort +
  run-length ListArray construction — Python cost per shard, not per
  document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

SPAN_FIELDS = ("kind", "text", "media_ref", "offset")


def explode_spans(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> ray.data.Dataset:
    """One row per span: (id, span_idx, kind, text, media_ref, offset).

    ``span_idx`` is the span's position within its document — the
    ordering key ``reassemble_spans`` needs to restore the sequence.
    A document whose spans list is empty (or null) contributes no rows,
    so it does NOT survive an explode→reassemble round trip — the round
    trip is exact over documents with ≥1 span (always true for the
    engine's generator, ``sources/docs.py``); callers with possibly
    span-less docs must re-attach them from the input.
    """

    def f(batch: pa.Table) -> pa.Table:
        spans = batch.column(spans_col).combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans)
        lengths = (
            pc.fill_null(pc.list_value_length(spans), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        span_idx = np.arange(len(flat), dtype=np.int64) - starts
        cols = {
            id_col: batch.column(id_col).take(parents),
            "span_idx": pa.array(span_idx, pa.int64()),
        }
        for name in SPAN_FIELDS:
            cols[name] = flat.field(name)
        return pa.table(cols)

    return docs.map_batches(f, batch_format="pyarrow")


def reassemble_spans(
    exploded: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Inverse of ``explode_spans``: group span rows back into
    ``(id, spans: list<struct>)`` with the original in-document order.

    Span rows shuffle once by hash(id) into ``num_shards`` coarse
    shards; a shard sorts by (id, span_idx) and rebuilds every one of
    its documents with a single run-length ``ListArray.from_arrays``
    pass — no per-document Python call.  The id column keeps its input
    type (string per the input_hint, but integer ids work too).
    """

    def shard(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas()
        h = pd.util.hash_array(ids.to_numpy(dtype=object)).astype(np.int64)
        return batch.append_column("__sshard", pa.array(h % num_shards))

    def rebuild(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([id_col, "span_idx"], kind="mergesort")
        gids = g[id_col].to_numpy(dtype=object)
        # run-length list offsets over the sorted (id, span_idx) rows
        change = np.flatnonzero(np.concatenate(([True], gids[1:] != gids[:-1])))
        offsets = np.concatenate((change, [len(gids)])).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(g["kind"], pa.string()),
                pa.array(g["text"], pa.string()),
                pa.array(g["media_ref"], pa.string()),
                pa.array(g["offset"].to_numpy().astype(np.int32), pa.int32()),
            ],
            names=list(SPAN_FIELDS),
        )
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.table(
            {id_col: pa.array(list(gids[change])), spans_col: spans}
        )

    return (
        exploded.map_batches(shard, batch_format="pyarrow")
        .groupby("__sshard")
        .map_groups(rebuild, batch_format="pandas")
    )


def spans_to_text(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    sep: str = " ",
    out_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Per-document ordered join of the TEXT spans — the bridge from the
    interleaved payload to every text operator (annotate / dedup /
    curation).  Media spans contribute nothing; a doc with no text
    spans yields the empty string.  ``keep_cols`` ride along unchanged.
    Batch-local."""

    def f(batch: pa.Table) -> pa.Table:
        spans = batch.column(spans_col).combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy()
        is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
        texts = pd.Series(flat.field("text").to_pandas()[is_text])
        joined = (
            texts.groupby(parents[is_text]).agg(sep.join)
            if len(texts)
            else pd.Series(dtype=object)
        )
        out = np.full(len(batch), "", dtype=object)
        out[joined.index.to_numpy()] = joined.to_numpy(dtype=object)
        cols = {id_col: batch.column(id_col), out_col: pa.array(out, pa.string())}
        for c in keep_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return docs.map_batches(f, batch_format="pyarrow")


def scrub_text_spans(
    docs: ray.data.Dataset,
    *,
    pattern: str,
    replacement: str,
    spans_col: str = "spans",
) -> ray.data.Dataset:
    """Spans-aware scrubbing: apply a regex replacement to the TEXT
    spans of an interleaved document, leaving media spans, span kinds,
    refs, offsets and ORDER untouched — the PII-removal pass that must
    not break the input_hint span-sequence contract for any field it
    didn't deliberately edit.

    Arrow-surgical and batch-local: the list column's offsets and the
    kind/media_ref/offset child arrays are reused AS-IS (zero copy);
    only the text child is rebuilt, with the regex applied once over
    the flattened child via ``pc.replace_substring_regex`` — never a
    per-span Python loop.  Applying the scrub to non-text entries
    would be wrong (a media_ref could match), so the mutated child is
    masked back to the original where kind != 'text'.
    """

    def f(batch: pa.Table) -> pa.Table:
        spans = batch.column(spans_col).combine_chunks()
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.chunk(0) if spans.num_chunks else pa.array(
                [], spans.type
            )
        flat = spans.flatten()
        text = flat.field("text")
        scrubbed = pc.replace_substring_regex(
            text, pattern=pattern, replacement=replacement
        )
        is_text = pc.equal(flat.field("kind"), "text")
        new_text = pc.if_else(is_text, scrubbed, text)
        struct = pa.StructArray.from_arrays(
            [flat.field("kind"), new_text, flat.field("media_ref"), flat.field("offset")],
            names=["kind", "text", "media_ref", "offset"],
        )
        # rebase offsets: a SLICED ListArray's offsets need not start at
        # 0, while flatten() returns only the referenced values
        offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int32)
        new_spans = pa.ListArray.from_arrays(pa.array(offs - offs[0] if len(offs) else offs, pa.int32()), struct)
        i = batch.column_names.index(spans_col)
        return batch.set_column(i, spans_col, new_spans)

    return docs.map_batches(f, batch_format="pyarrow")
