"""Training-data curation operators: decontamination, sequence packing,
and repetition-based quality stats.

These are the corpus-preparation stages that sit between the cleanup
ops (``textstats``: annotate / scrub / mix) and the dedup families
(``dedup``): drop eval-set leakage, pack documents into fixed-capacity
training sequences, and score repetition so downstream filters can cut
degenerate documents (the Gopher-style rules).

Scale contracts (100 TB):

- ``ngram_contamination`` is the canonical decontamination shape: the
  EVAL side is small by definition (benchmark suites are MBs), so its
  distinct n-gram set is collected once, broadcast via ``ray.put``, and
  the unbounded TRAIN side is probed map-only — zero shuffle, fully
  resumable.
- ``pack_sequences`` packs greedily WITHIN doc-id shards: packing is
  inherently sequential, so the global problem is sharded into
  independent bounded groups (one ``map_groups`` call each, Python loop
  bounded by ``shard_size``, not corpus size) — the same contract real
  pre-training pipelines use (pack per input file/shard).
- ``repetition_stats`` is per-document and batch-local: tokens explode
  inside the map task and aggregate back to one row per doc before the
  batch leaves the worker — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_TOKEN_RE = r"\S+"


def _flat_tokens(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Explode whitespace tokens of a text Series.

    Returns (tokens, doc_pos, doc_lens): flat object array of tokens,
    the positional doc index of each token, and tokens-per-doc.  All
    numpy/pandas kernels — no per-row Python loop.
    """
    toks = s.fillna("").str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64), lens
    ex = toks.explode().dropna()
    flat = ex.to_numpy(dtype=object)
    pos = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    return flat, pos, lens


def _ngram_strings(flat: np.ndarray, pos: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Join-with-space n-grams over the flat token array, masked so no
    gram crosses a document boundary.  Returns (grams, gram_doc_pos)."""
    if len(flat) < n:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    valid = pos[: len(pos) - n + 1] == pos[n - 1 :]
    grams = flat[: len(flat) - n + 1][valid]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[j : len(flat) - n + 1 + j][valid]
    return grams, pos[: len(pos) - n + 1][valid]


# ------------------------------------------------------------ contamination


def _broadcast_eval_grams(eval_ds: ray.data.Dataset, n: int, text_col: str):
    """Distinct eval-corpus n-grams → one ``ray.put`` pd.Index (the
    shared broadcast side of ngram_contamination / decontaminate; a
    drift between the two would silently split their oracle parity)."""

    def eval_grams(batch: pa.Table) -> pa.Table:
        flat, pos, _ = _flat_tokens(batch.column(text_col).to_pandas())
        grams, _ = _ngram_strings(flat, pos, n)
        return pa.table({"ng": pa.array(pd.unique(grams), pa.string())})

    gram_blocks = eval_ds.select_columns([text_col]).map_batches(
        eval_grams, batch_format="pyarrow"
    )
    gram_set = pd.unique(gram_blocks.to_pandas()["ng"].to_numpy(dtype=object))
    return ray.put(pd.Index(gram_set))


def ngram_contamination(
    train: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    *,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Train/eval decontamination: (id, n_hits) for every TRAIN document
    that shares at least one word ``n``-gram with the EVAL corpus.

    ``n_hits`` counts contaminated gram POSITIONS in the train doc
    (duplicates counted), so filters can threshold on overlap mass,
    not just membership.

    The eval side's distinct gram set is aggregated per block map-side,
    union'd on the driver (eval sets are small — this is the
    decontamination contract, mirrored from the broadcast side of
    ``relational.broadcast_semi_join``), and shipped once via
    ``ray.put``; the train scan is map-only.
    """
    gram_ref = _broadcast_eval_grams(eval_ds, n, text_col)

    def probe(batch: pa.Table) -> pa.Table:
        idx: pd.Index = ray.get(gram_ref)
        flat, pos, _ = _flat_tokens(batch.column(text_col).to_pandas())
        grams, gpos = _ngram_strings(flat, pos, n)
        if not len(grams):
            return pa.table(
                {id_col: pa.array([], batch.column(id_col).type), "n_hits": pa.array([], pa.int64())}
            )
        hit = pd.Series(grams).isin(idx).to_numpy()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        hits_per_doc = np.bincount(gpos[hit], minlength=len(ids))
        keep = hits_per_doc > 0
        return pa.table(
            {
                id_col: pa.array(ids[keep], batch.column(id_col).type),
                "n_hits": pa.array(hits_per_doc[keep], pa.int64()),
            }
        )

    return train.select_columns([id_col, text_col]).map_batches(probe, batch_format="pyarrow")


# ------------------------------------------------------------ packing


def pack_sequences(
    docs: ray.data.Dataset,
    *,
    capacity: int = 256,
    shard_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Greedy first-fit sequence packing: assign each document (in
    ``id_col`` order within a shard of ``shard_size`` consecutive ids)
    to a training sequence of token ``capacity``; a document that does
    not fit the open sequence starts a new one (even when it alone
    exceeds ``capacity``).

    Output: (id, seq_id, seq_offset, n_tokens) with
    ``seq_id = shard * 1_000_000 + local_seq`` and ``seq_offset`` the
    token offset of the doc inside its sequence.

    Shards pack independently (the map_groups parallelism unit); the
    per-group greedy loop is O(shard_size) — bounded by a constant, not
    the corpus.  Requires an integer ``id_col``.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")

    def add_meta(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        nt = s.fillna("").str.count(_TOKEN_RE).to_numpy(dtype=np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(nt, pa.int64()),
                "__pshard": pa.array(ids // shard_size, pa.int64()),
            }
        )

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        nt = g["n_tokens"].to_numpy()
        seq_local = np.zeros(len(g), dtype=np.int64)
        offset = np.zeros(len(g), dtype=np.int64)
        fill = 0
        seq = 0
        for i, t in enumerate(nt):  # bounded by shard_size, not corpus
            if i and fill + t > capacity:
                seq += 1
                fill = 0
            seq_local[i] = seq
            offset[i] = fill
            fill += t
        shard = int(g["__pshard"].iloc[0])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "seq_id": shard * 1_000_000 + seq_local,
                "seq_offset": offset,
                "n_tokens": nt,
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(add_meta, batch_format="pyarrow")
        .groupby("__pshard")
        .map_groups(pack, batch_format="pandas")
    )


# ------------------------------------------------------------ repetition


def _repetition_arrays(s: pd.Series) -> dict[str, np.ndarray]:
    """Per-row repetition signals for a text Series (batch-local)."""
    nrows = len(s)
    flat, pos, lens = _flat_tokens(s)
    distinct = np.zeros(nrows, dtype=np.int64)
    top_tok = np.zeros(nrows, dtype=np.int64)
    if len(flat):
        tc = pd.DataFrame({"d": pos, "w": flat}).groupby(["d", "w"], sort=False).size()
        per_doc = tc.groupby(level=0)
        distinct[per_doc.size().index.to_numpy()] = per_doc.size().to_numpy()
        top_tok[per_doc.max().index.to_numpy()] = per_doc.max().to_numpy()
    grams, gpos = _ngram_strings(flat, pos, 2)
    n_bg = np.maximum(lens - 1, 0)
    top_bg = np.zeros(nrows, dtype=np.int64)
    if len(grams):
        bc = pd.DataFrame({"d": gpos, "b": grams}).groupby(["d", "b"], sort=False).size()
        bmax = bc.groupby(level=0).max()
        top_bg[bmax.index.to_numpy()] = bmax.to_numpy()
    safe_nt = np.maximum(lens, 1)
    safe_bg = np.maximum(n_bg, 1)
    return {
        "n_tokens": lens,
        "distinct_frac_e4": 10000 * distinct // safe_nt,
        "top_token_frac_e4": 10000 * top_tok // safe_nt,
        "top_bigram_frac_e4": 10000 * top_bg // safe_bg,
    }


def repetition_stats(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Gopher-style repetition signals, one row per document:

    - ``n_tokens``: whitespace token count
    - ``distinct_frac_e4``: 10000 * distinct_tokens // n_tokens
    - ``top_token_frac_e4``: 10000 * max_token_count // n_tokens
    - ``top_bigram_frac_e4``: 10000 * max_bigram_count // n_bigrams

    Scaled-integer outputs (floor division) are bitwise-stable across
    engines (oracle contract).  Entirely batch-local map work.
    """

    def stats(batch: pa.Table) -> pa.Table:
        arrs = _repetition_arrays(batch.column(text_col).to_pandas())
        return pa.table(
            {id_col: batch.column(id_col)}
            | {k: pa.array(v, pa.int64()) for k, v in arrs.items()}
        )

    return docs.select_columns([id_col, text_col]).map_batches(stats, batch_format="pyarrow")


def filter_repetitive(
    docs: ray.data.Dataset,
    *,
    min_distinct_frac_e4: int = 4000,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Quality gate: keep documents whose distinct-token fraction is at
    least ``min_distinct_frac_e4`` (scaled-e4).  Batch-local map filter
    over all original columns — the composable form of
    ``repetition_stats`` for pipeline use.  Computes ONLY the distinct
    count (not the unused top-token/bigram signals) — this is the
    flagship curate pipeline's hot path."""

    def f(batch: pa.Table) -> pa.Table:
        flat, pos, lens = _flat_tokens(batch.column(text_col).to_pandas())
        distinct = np.zeros(len(batch), dtype=np.int64)
        if len(flat):
            nu = pd.DataFrame({"d": pos, "w": flat}).groupby("d", sort=False)["w"].nunique()
            distinct[nu.index.to_numpy()] = nu.to_numpy()
        frac = 10000 * distinct // np.maximum(lens, 1)
        return batch.filter(pa.array(frac >= min_distinct_frac_e4))

    return docs.map_batches(f, batch_format="pyarrow")


def decontaminate(
    train: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    *,
    n: int = 4,
    text_col: str = "text",
    mode: str = "exact",
    bits_log2: int = 24,
) -> ray.data.Dataset:
    """Drop every TRAIN document sharing a word ``n``-gram with the EVAL
    corpus; all original train columns pass through.  Same broadcast
    eval-gram topology as ``ngram_contamination`` (which reports instead
    of dropping).

    ``mode="exact"`` (default) collects the eval corpus's distinct gram
    STRINGS on the driver — right whenever the eval side is a benchmark
    suite (MBs).  ``mode="bloom"`` is the scale escape hatch for an
    eval side too large to union exactly: per-block partial Bloom
    filters over the HASHED grams OR-merge into one ``2^bits_log2``-bit
    filter (a few MB regardless of eval size, never the gram strings),
    broadcast once; the probe is identical map-only work.  Bloom false
    positives OVER-scrub (a clean train doc can be dropped, rate
    ≈ (1 - e^{-k·n_grams/m})^k) but can never leak a contaminated doc —
    the conservative direction for decontamination.
    """
    if mode == "exact":
        gram_ref = _broadcast_eval_grams(eval_ds, n, text_col)
    elif mode == "bloom":
        from ..functions.bloom import Bloom

        def partial(batch: pa.Table) -> pa.Table:
            flat, pos, _ = _flat_tokens(batch.column(text_col).to_pandas())
            grams, _ = _ngram_strings(flat, pos, n)
            b = Bloom(bits_log2, 4)
            if len(grams):
                b.add_many(pd.util.hash_array(grams).astype(np.int64))
            return pa.table({"bloom": pa.array([b.to_bytes()], pa.binary())})

        parts = eval_ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        ).take_all()
        merged = Bloom(bits_log2, 4)
        for row in parts:
            merged = merged.merge(Bloom.from_bytes(row["bloom"], bits_log2, 4))
        gram_ref = ray.put(merged)
    else:
        raise ValueError(f"mode must be 'exact' or 'bloom', got {mode!r}")

    def drop_contaminated(batch: pa.Table) -> pa.Table:
        membership = ray.get(gram_ref)
        flat, pos, _ = _flat_tokens(batch.column(text_col).to_pandas())
        grams, gpos = _ngram_strings(flat, pos, n)
        if not len(grams):
            return batch
        if isinstance(membership, pd.Index):
            hit = pd.Series(grams).isin(membership).to_numpy()
        else:  # Bloom
            hit = membership.contains(pd.util.hash_array(grams).astype(np.int64))
        bad = np.zeros(len(batch), dtype=bool)
        bad[np.unique(gpos[hit])] = True
        return batch.filter(pa.array(~bad))

    return train.map_batches(drop_contaminated, batch_format="pyarrow")


# ------------------------------------------------- duplicate substrings


def _dup_gram_positions(
    docs: ray.data.Dataset,
    *,
    n: int,
    id_col: str,
    text_col: str,
    num_shards: int,
) -> ray.data.Dataset:
    """Narrow ``(id, pos)`` rows for every word n-gram occurrence whose
    gram appears MORE THAN ONCE corpus-wide (the shared discovery stage
    of ``dup_ngram_coverage`` and ``remove_dup_ngrams``).  One
    ``groupby`` exchange of (ng, id, pos) rows, counted exactly with a
    vectorized value_counts per COARSE hash(ng) shard — output is
    bounded by the duplicated fraction of the corpus."""

    def gram_rows(batch: pa.Table) -> pa.Table:
        flat, pos, lens = _flat_tokens(batch.column(text_col).to_pandas())
        grams, gdoc = _ngram_strings(flat, pos, n)
        starts = np.cumsum(lens) - lens
        indoc = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        valid = pos[: len(pos) - n + 1] == pos[n - 1 :] if len(flat) >= n else np.empty(0, bool)
        gpos = indoc[: len(indoc) - n + 1][valid] if len(flat) >= n else np.empty(0, np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ng": pa.array(grams, pa.string()),
                id_col: pa.array(ids[gdoc]),
                "pos": pa.array(gpos, pa.int64()),
            }
        )

    def gram_shard(batch: pa.Table) -> pa.Table:
        grams = batch.column("ng").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.int64)
        return batch.append_column("__gshard", pa.array(h % num_shards))

    def dup_only(shard_df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per COARSE shard (not per gram): every
        # occurrence of a gram hash-lands in the same shard, so a
        # shard-local value_counts is the exact global count
        cnt = shard_df["ng"].map(shard_df["ng"].value_counts())
        return shard_df.loc[cnt.to_numpy() > 1, [id_col, "pos"]]

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(gram_rows, batch_format="pyarrow")
        .map_batches(gram_shard, batch_format="pyarrow")
        .groupby("__gshard")
        .map_groups(dup_only, batch_format="pandas")
    )


def dup_ngram_coverage(
    docs: ray.data.Dataset,
    *,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 32,
    join_partitions: int | None = None,
) -> ray.data.Dataset:
    """Substring-level duplication signal (the hashed analog of the
    suffix-array pass in Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): per document, how many of its tokens are
    covered by a word ``n``-gram that occurs MORE THAN ONCE in the whole
    corpus (including a second time inside the same document).  Output:
    ``(id, n_tokens, covered_tokens)`` — scaled-integer columns only,
    bitwise-stable across engines.

    Scale contract (no driver-side state, texts never shuffle):

    1. map: explode word n-grams with their in-document token position
       → narrow rows ``(ng, id, pos)``.
    2. one ``groupby(ng)`` shuffle; a group emits its ``(id, pos)``
       members only when the gram occurs >1 time — output is bounded by
       the duplicated fraction of the corpus.
    3. duplicated positions hash-shard by id (same coarse topology as
       ``reassemble_spans``); each shard computes the interval-union
       coverage with one vectorized diff pass (positions sorted per
       doc; position i contributes ``min(next_i - i, n)``, the last of
       a doc contributes ``n``).
    4. per-doc token counts (map-only) LEFT JOIN the covered counts on
       a hash-partitioned key exchange (`relational.shuffle_hash_join`)
       — both sides are one narrow row per doc.
    """
    from .relational import shuffle_hash_join

    dup_pos = _dup_gram_positions(
        docs, n=n, id_col=id_col, text_col=text_col, num_shards=num_shards
    )

    def shard(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids, dtype=object)).astype(np.int64)
        return batch.append_column("__cshard", pa.array(h % num_shards))

    def coverage(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([id_col, "pos"], kind="mergesort")
        ids = g[id_col].to_numpy()
        pos = g["pos"].to_numpy()
        contrib = np.full(len(g), n, dtype=np.int64)
        if len(g) > 1:
            same = ids[1:] == ids[:-1]
            d = pos[1:] - pos[:-1]
            contrib[:-1][same] = np.minimum(d[same], n)
        out = pd.DataFrame({id_col: ids, "covered_tokens": contrib})
        return out.groupby(id_col, sort=False, as_index=False)["covered_tokens"].sum()

    covered = (
        dup_pos.map_batches(shard, batch_format="pyarrow")
        .groupby("__cshard")
        .map_groups(coverage, batch_format="pandas")
    )

    def tok_counts(batch: pa.Table) -> pa.Table:
        _, _, lens = _flat_tokens(batch.column(text_col).to_pandas())
        return pa.table(
            {id_col: batch.column(id_col), "n_tokens": pa.array(lens, pa.int64())}
        )

    counts = docs.select_columns([id_col, text_col]).map_batches(
        tok_counts, batch_format="pyarrow"
    )
    joined = shuffle_hash_join(
        counts, covered, on=id_col, join_type="left_outer",
        num_partitions=join_partitions,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cov = pc.fill_null(pc.cast(batch.column("covered_tokens"), pa.int64()), 0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pc.cast(batch.column("n_tokens"), pa.int64()),
                "covered_tokens": cov,
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def remove_dup_ngrams(
    docs: ray.data.Dataset,
    *,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 32,
) -> ray.data.Dataset:
    """Exact-substring deduplication REWRITE (the apply step of Lee et
    al.): drop every token covered by a word ``n``-gram that occurs
    more than once corpus-wide; keep the rest in order.  Output:
    ``(id, text, n_removed)`` where ``text`` is the surviving tokens
    joined by single spaces (whitespace is normalized even for
    untouched documents — deterministic on both engines) and documents
    with no surviving tokens yield the empty string.

    Scale contract: duplicated positions come from the shared
    ``_dup_gram_positions`` exchange; the rewrite co-locates each doc's
    text with its (sparse) duplicated positions via ONE tag-union
    shuffle on a coarse hash(id) shard (the ``asof_join`` topology —
    no driver state, no broadcast of O(corpus) positions).  Within a
    shard everything is vectorized except the per-doc ' '.join of
    surviving tokens (same cost shape as ``spans_to_text``)."""
    dup_pos = _dup_gram_positions(
        docs, n=n, id_col=id_col, text_col=text_col, num_shards=num_shards
    )

    def tag_text(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids, dtype=object)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__rshard": pa.array(h % num_shards),
                "__tag": pa.array(np.zeros(len(batch), np.int8)),
                text_col: batch.column(text_col),
                "pos": pa.array(np.full(len(batch), -1, np.int64)),
            }
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids, dtype=object)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__rshard": pa.array(h % num_shards),
                "__tag": pa.array(np.ones(len(batch), np.int8)),
                text_col: pa.array(np.full(len(batch), "", dtype=object), pa.string()),
                "pos": pc.cast(batch.column("pos"), pa.int64()),
            }
        )

    tagged = docs.select_columns([id_col, text_col]).map_batches(
        tag_text, batch_format="pyarrow"
    ).union(dup_pos.map_batches(tag_pos, batch_format="pyarrow"))

    def rewrite(group: pd.DataFrame) -> pd.DataFrame:
        t = group[group["__tag"].to_numpy() == 0]
        p = group[group["__tag"].to_numpy() == 1]
        flat, rowpos, lens = _flat_tokens(t[text_col])
        starts = np.cumsum(lens) - lens
        # map each duplicated position to its doc's row in t
        row_of = pd.Series(np.arange(len(t)), index=t[id_col].to_numpy())
        prows = row_of.loc[p[id_col].to_numpy()].to_numpy() if len(p) else np.empty(0, np.int64)
        gstart = starts[prows] + p["pos"].to_numpy() if len(p) else np.empty(0, np.int64)
        diff = np.zeros(len(flat) + n, dtype=np.int64)
        np.add.at(diff, gstart, 1)
        np.add.at(diff, gstart + n, -1)
        covered = np.cumsum(diff)[: len(flat)] > 0
        kept, kparents = flat[~covered], rowpos[~covered]
        joined = (
            pd.Series(kept).groupby(kparents).agg(" ".join)
            if len(kept)
            else pd.Series(dtype=object)
        )
        out_text = np.full(len(t), "", dtype=object)
        out_text[joined.index.to_numpy()] = joined.to_numpy(dtype=object)
        kept_counts = np.bincount(kparents, minlength=len(t)) if len(kept) else np.zeros(len(t), np.int64)
        return pd.DataFrame(
            {
                id_col: t[id_col].to_numpy(),
                text_col: out_text,
                "n_removed": (lens - kept_counts).astype(np.int64),
            }
        )

    return tagged.groupby("__rshard").map_groups(rewrite, batch_format="pandas")


# ------------------------------------------------------- per-source capping


def _mix64_i64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64 keys (unsigned avalanche)."""
    h = x.astype(np.int64).view(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def cap_per_source(
    docs: ray.data.Dataset,
    *,
    cap: int,
    source_col: str = "source",
    key_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
    salt_shards: int = 64,
) -> ray.data.Dataset:
    """Per-source frequency cap: keep at most ``cap`` documents per
    ``source_col``, chosen deterministically as the ``cap`` smallest
    ``splitmix64(key)`` values (hash order = an unbiased-but-seedless
    uniform sample; ties broken by key).  The C4/Gopher-style domain-cap
    stage that stops one crawler-friendly host from dominating a corpus.

    Scale contract (100 TB, millions of sources, heavy skew): selection
    by k-smallest is associative, so it tree-combines —

    1. map-side: each block keeps its ``cap`` smallest (h, key) per
       source (vectorized sort + groupby-head, no Python loop);
    2. pre-combine on ``(source, salt)`` where salt = h mod
       ``salt_shards``: a hot source's candidates split across
       ``salt_shards`` bounded groups instead of one giant group
       (blocks x cap rows), each kept to its cap;
    3. final ``groupby(source)`` over <= salt_shards x cap narrow rows
       per source.

    Only (source, key, h, carry_cols) rows ever shuffle — texts/blobs
    stay in place; rejoin winners by key downstream if full rows are
    needed.  Returns columns (key_col, source_col, *carry_cols).
    """
    cols = [key_col, source_col, *carry_cols]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        h = _mix64_i64(df[key_col].to_numpy())
        out["__h"] = h.view(np.int64)  # int64 view; order fixed below
        return _k_smallest(out, source_col, cap)

    def _k_smallest(df: pd.DataFrame, by, k: int) -> pd.DataFrame:
        # uint64 hash order (view back), then key for ties
        df = df.assign(__ho=df["__h"].to_numpy().view(np.uint64))
        df = df.sort_values(["__ho", key_col], kind="stable")
        return df.groupby(by, sort=False).head(k).drop(columns="__ho")

    cand = docs.select_columns(cols).map_batches(partial, batch_format="pandas")

    def presalt(df: pd.DataFrame) -> pd.DataFrame:
        h = df["__h"].to_numpy().view(np.uint64)
        return df.assign(__salt=(h % np.uint64(salt_shards)).astype(np.int64))

    combined = (
        cand.map_batches(presalt, batch_format="pandas")
        .groupby([source_col, "__salt"])
        .map_groups(lambda g: _k_smallest(g, source_col, cap), batch_format="pandas")
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _k_smallest(g, source_col, cap)[cols]

    return (
        combined.drop_columns(["__salt"])
        .groupby(source_col)
        .map_groups(final, batch_format="pandas")
    )


# -------------------------------------------------- token-budget selection


def select_by_token_budget(
    ds: ray.data.Dataset,
    budget: int,
    *,
    group_col: str = "lang",
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    bins: int = 4096,
    lo: float = 0.0,
    hi: float = 1.0,
) -> ray.data.Dataset:
    """Data selection under a token budget: per ``group_col`` value,
    keep the maximal quality-ordered prefix of documents whose running
    token total stays ≤ ``budget`` (order: ``score_col`` desc, then
    ``id_col`` — the standard "select best docs until the budget is
    spent" corpus-construction rule).

    Scale contract (100 TB, budget selection without a global sort):

    1. one map-only pass bins each doc's score into ``bins`` fixed
       buckets over [lo, hi];
    2. one aggregate of (group, bin) → token sums — the exchange and
       the driver table are ``groups × bins`` bounded, independent of
       corpus size;
    3. the driver finds each group's threshold bin t (where the
       top-down cumulative crosses the budget) and broadcasts {group:
       (t, tokens_above_t)};
    4. docs in bins above t pass with NO further data movement; only
       the boundary-bin docs (≈1/bins of the group) shuffle into a
       per-group exact prefix evaluation.

    Equal scores always land in the same bin, so bin-level inclusion
    plus exact boundary evaluation reproduces the total-order rule
    exactly.  Returns (id_col, group_col, token_col).
    """
    import ray as _ray

    from .relational import grouped_aggregate

    width = (hi - lo) / bins
    out_cols = [id_col, group_col, token_col]

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        s = df[score_col].to_numpy(dtype=np.float64)
        df["__bin"] = np.clip(
            np.floor((s - lo) / width), 0, bins - 1
        ).astype(np.int64)
        return df

    anno = ds.map_batches(binned, batch_format="pandas").materialize()

    hist = grouped_aggregate(
        anno.select_columns([group_col, "__bin", token_col]),
        [group_col, "__bin"],
        [("tok", token_col, "sum")],
    ).to_pandas()  # groups x bins bounded by construction

    thresholds: dict = {}
    for g, grp in hist.groupby(group_col, sort=False):
        grp = grp.sort_values("__bin", ascending=False)
        cum = grp["tok"].cumsum().to_numpy()
        over = np.flatnonzero(cum > budget)
        if len(over) == 0:
            thresholds[g] = (-1, 0)  # whole group fits
        else:
            i = int(over[0])
            t = int(grp["__bin"].to_numpy()[i])
            base = int(cum[i] - grp["tok"].to_numpy()[i])
            thresholds[g] = (t, base)
    ref = _ray.put(thresholds)

    def keep_above(df: pd.DataFrame) -> pd.DataFrame:
        th = _ray.get(ref)
        t = df[group_col].map(lambda g: th.get(g, (bins, 0))[0]).to_numpy()
        return df.loc[df["__bin"].to_numpy() > t, out_cols]

    def boundary(df: pd.DataFrame) -> pd.DataFrame:
        th = _ray.get(ref)
        t = df[group_col].map(lambda g: th.get(g, (bins, 0))[0]).to_numpy()
        return df.loc[df["__bin"].to_numpy() == t]

    def exact_prefix(g: pd.DataFrame) -> pd.DataFrame:
        th = _ray.get(ref)
        if not len(g):
            return g[out_cols]
        _t, base = th[g[group_col].iloc[0]]
        g = g.sort_values(
            [score_col, id_col], ascending=[False, True], kind="mergesort"
        )
        cum = base + g[token_col].cumsum().to_numpy()
        return g.loc[cum <= budget, out_cols]

    kept = anno.map_batches(keep_above, batch_format="pandas")
    edge = (
        anno.map_batches(boundary, batch_format="pandas")
        .groupby(group_col)
        .map_groups(exact_prefix, batch_format="pandas")
    )
    return kept.union(edge)


# ------------------------------------------------ context-window chunking


def chunk_documents(
    docs: ray.data.Dataset,
    *,
    chunk_tokens: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Split each document into overlapping fixed-token-window chunks —
    the context-window preparation stage of an LLM training pipeline
    (Pile/GPT-style striding).

    Chunk ``i`` (0-based) covers whitespace tokens
    ``[i·stride, min(i·stride + chunk_tokens, n))``; a non-empty doc
    with ``n`` tokens yields ``1 + max(0, ceil((n - chunk_tokens) /
    stride))`` chunks (the final chunk may be short; empty docs yield
    none), so every token is covered and consecutive chunks overlap by
    ``chunk_tokens - stride``.

    Scale contract: map-only (zero shuffle) — each batch tokenizes
    once, computes per-doc chunk counts vectorized, and emits the
    exploded (id, chunk_id, chunk_text, n_tokens) rows; output size is
    ~``1/stride`` rows per input token regardless of cluster size, and
    blocks split downstream under Ray's target block size.  With
    ``stride < chunk_tokens`` output bytes exceed input bytes by the
    overlap factor — size ``batch_size`` so the exploded batch stays
    heap-bounded.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    empty = pd.DataFrame(
        {
            id_col: pd.Series([], dtype=np.int64),
            "chunk_id": pd.Series([], dtype=np.int64),
            "chunk_text": pd.Series([], dtype=str),
            "n_tokens": pd.Series([], dtype=np.int64),
        }
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        toks = df[text_col].str.findall(r"\S+")
        n = toks.str.len().to_numpy(dtype=np.int64)
        nchunks = np.where(
            n == 0, 0, 1 + np.maximum(0, -(-(n - chunk_tokens) // stride))
        )
        if nchunks.sum() == 0:
            return empty
        row = np.arange(len(df), dtype=np.int64).repeat(nchunks)
        cid = np.concatenate([np.arange(c, dtype=np.int64) for c in nchunks if c])
        starts = cid * stride
        ends = np.minimum(starts + chunk_tokens, n[row])
        tok_arrs = toks.to_numpy()
        texts = [
            " ".join(tok_arrs[r][s:e])
            for r, s, e in zip(row.tolist(), starts.tolist(), ends.tolist())
        ]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[row],
                "chunk_id": cid,
                "chunk_text": texts,
                "n_tokens": ends - starts,
            }
        )

    return docs.map_batches(explode, batch_format="pandas", batch_size=batch_size)


def temperature_sample(
    docs: ray.data.Dataset,
    *,
    temperature: float,
    target_frac: float,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt_shards: int = 64,
) -> ray.data.Dataset:
    """Temperature-flattened source sampling — the multilingual /
    multi-domain mixing primitive (GPT-3 / PaLM style): sources are
    kept in proportion to ``count^temperature`` instead of raw count,
    so ``temperature < 1`` up-weights small sources relative to
    crawler-friendly giants, and the whole corpus is downsampled to
    ``target_frac`` of its rows.  Per-source quota::

        k_s = min(n_s, floor(n_s^T / sum_s n_s^T * N_target + 0.5))

    with ``N_target = floor(target_frac * N + 0.5)`` (no upsampling — epoch
    replication is ``mix_corpora``'s job).  Members are the ``k_s``
    smallest ``splitmix64(key)`` per source (deterministic, seedless,
    uniform within source; ties by key) — a per-source VARIABLE cap,
    resolved with the same tree-combined k-smallest topology as
    ``cap_per_source``: quotas are integer COUNTS, so engine/oracle
    agreement never rides a float threshold compare.

    Scale contract: the count aggregate and the quota table are
    O(#sources) (domain cardinality, bounded like the tfidf vocab —
    broadcast as sorted arrays, looked up by searchsorted); only
    ``(source, key, h)`` rows shuffle, in bounded salt groups.
    Returns ``(key_col, source_col)``.
    """
    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        docs, [source_col], [("n", key_col, "count")]
    ).to_pandas()
    n = counts["n"].to_numpy(dtype=np.float64)
    # floor(x + 0.5), not np.round: banker's rounding differs from SQL
    n_target = float(np.floor(target_frac * n.sum() + 0.5))
    w = np.power(n, temperature)
    quota = np.minimum(
        n, np.floor(w / w.sum() * n_target + 0.5)
    ).astype(np.int64)
    return _quota_select(
        docs,
        counts[source_col].to_numpy(),
        quota,
        source_col=source_col,
        key_col=key_col,
        salt_shards=salt_shards,
    )


def _quota_select(
    docs: ray.data.Dataset,
    src_keys: np.ndarray,
    quota: np.ndarray,
    *,
    source_col: str,
    key_col: str,
    salt_shards: int,
) -> ray.data.Dataset:
    """Shared per-source VARIABLE-cap selection core: keep the quota_s
    smallest splitmix64(key) members per source (ties by key), resolved
    with the tree-combined k-smallest topology of ``cap_per_source``.
    Quotas broadcast once as sorted parallel arrays (O(#sources))."""
    order = np.argsort(src_keys)
    caps_ref = ray.put((src_keys[order], quota[order]))

    def cap_of(vals: np.ndarray) -> np.ndarray:
        keys, caps = ray.get(caps_ref)
        return caps[np.searchsorted(keys, vals)]

    cols = [key_col, source_col]

    def rank_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__ho=df["__h"].to_numpy().view(np.uint64))
        df = df.sort_values(["__ho", key_col], kind="stable")
        rank = df.groupby(source_col, sort=False).cumcount().to_numpy()
        capv = cap_of(df[source_col].to_numpy())
        return df[rank < capv].drop(columns="__ho")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["__h"] = _mix64_i64(df[key_col].to_numpy()).view(np.int64)
        return rank_filter(out)

    cand = docs.select_columns(cols).map_batches(partial, batch_format="pandas")

    def presalt(df: pd.DataFrame) -> pd.DataFrame:
        h = df["__h"].to_numpy().view(np.uint64)
        return df.assign(__salt=(h % np.uint64(salt_shards)).astype(np.int64))

    combined = (
        cand.map_batches(presalt, batch_format="pandas")
        .groupby([source_col, "__salt"])
        .map_groups(rank_filter, batch_format="pandas")
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return rank_filter(g)[cols]

    return (
        combined.drop_columns(["__salt"])
        .groupby(source_col)
        .map_groups(final, batch_format="pandas")
    )


def mix_to_weights(
    docs: ray.data.Dataset,
    weights: dict[str, float],
    target_n: int,
    *,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt_shards: int = 64,
) -> ray.data.Dataset:
    """Sample a corpus down to an EXPLICIT target mixture — "the
    training set should be 40% web, 30% code, 30% books" — the
    recipe-driven complement of ``temperature_sample``'s count-derived
    flattening.  Per-source quota::

        k_s = min(n_s, floor(w_s / sum(w) * target_n + 0.5))

    over the sources present in both the corpus and ``weights``
    (sources absent from ``weights`` contribute nothing); no
    upsampling — a source smaller than its slot yields what it has
    (epoch replication is ``mix_corpora``'s job).  Members are the
    ``k_s`` smallest ``splitmix64(key)`` per source — deterministic,
    seedless, integer-quota (never a float threshold compare), and the
    selection is the same tree-combined variable-cap topology as
    ``temperature_sample``.  Returns ``(key_col, source_col)``.
    """
    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        docs, [source_col], [("n", key_col, "count")]
    ).to_pandas()
    counts = counts[counts[source_col].isin(weights)]
    n = counts["n"].to_numpy(dtype=np.float64)
    w = np.array([weights[s] for s in counts[source_col]], np.float64)
    total_w = float(sum(weights.values()))
    quota = np.minimum(n, np.floor(w / total_w * target_n + 0.5)).astype(np.int64)

    # sources absent from the recipe never reach the selection core
    # (its searchsorted quota lookup assumes every source has a quota row)
    allowed = ray.put(pa.array(list(weights)))

    def keep_allowed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column(source_col), value_set=ray.get(allowed))
        )

    docs = docs.map_batches(keep_allowed, batch_format="pyarrow")
    return _quota_select(
        docs,
        counts[source_col].to_numpy(),
        quota,
        source_col=source_col,
        key_col=key_col,
        salt_shards=salt_shards,
    )


def leakage_safe_split(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    train_pct: int = 80,
) -> ray.data.Dataset:
    """Near-dup-aware train/eval split: every document of a near-
    duplicate component lands on the SAME side, so an eval example can
    never leak into train through a paraphrase or copy — the standard
    contamination failure of row-wise random splits (and the reason
    production splits key on cluster/domain, not on the row).

    ``pairs`` (columns ``u``, ``v``) is the near-dup pair stream any of
    the dedup families emits (minhash/simhash/ngram/embedding verified
    pairs, exact-hash groups, link edges).  Components resolve through
    ``connected_components`` (sharded two-level union-find); a doc
    without a pair is its own component.  The side is
    ``splitmix64(component) % 100 < train_pct`` — deterministic,
    seedless, resumable, and exactly reproducible in SQL.

    Scale contract: the component table is candidate-pair-sized (only
    docs that HAVE a near-dup), never corpus-sized; the one corpus-wide
    exchange is the narrow (id ⋈ node) left hash join; hashing and
    labeling are map-only.  Output: (id, component, split).
    """
    from .dedup import connected_components
    from .relational import shuffle_hash_join

    comp = connected_components(pairs)  # (node, component)
    # Ray 2.49.2 strips schemas off all-empty datasets (zero-COLUMN
    # blocks), crashing the hash join when ``pairs`` is empty.  Union a
    # sentinel row keyed on int64-min — no real doc id, so left_outer
    # simply drops it — to keep the right side schema-ful always.
    sent = -(1 << 63)
    comp = comp.union(
        ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([sent], pa.int64()),
                    "component": pa.array([sent], pa.int64()),
                }
            )
        )
    )
    joined = shuffle_hash_join(
        docs.select_columns([id_col]), comp,
        on=id_col, right_on="node", join_type="left_outer",
    )

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "component": pa.array([], pa.int64()),
                    "split": pa.array([], pa.string()),
                }
            )
        own = pc.cast(t.column(id_col), pa.int64())
        comp_v = (
            pc.coalesce(pc.cast(t.column("component"), pa.int64()), own)
            if "component" in t.column_names
            else own
        )
        cv = np.asarray(comp_v, dtype=np.int64)
        h = _mix64_i64(cv)
        train = (h % np.uint64(100)) < np.uint64(train_pct)
        return pa.table(
            {
                id_col: t.column(id_col),
                "component": pa.array(cv, pa.int64()),
                "split": pa.array(
                    np.where(train, "train", "eval"), pa.string()
                ),
            }
        )

    return joined.map_batches(label, batch_format="pyarrow")


def training_shards(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    num_shards: int = 64,
) -> ray.data.Dataset:
    """Deterministic global pseudo-shuffle + sharding for training
    export: ``shard = splitmix64(id) % num_shards`` and ``pos`` = the
    doc's rank within its shard ordered by ``(splitmix64(id), id)``.
    Reading shards round-robin replays a uniform-at-random document
    order WITHOUT ever running a true ``random_shuffle`` — the hash IS
    the permutation, so the order is seedless, reproducible, resumable
    per shard, and identical however the input was partitioned (the
    standard trick for epoch shuffling at 100 TB, where an all-to-all
    random shuffle per epoch is unpayable).

    Scale contract: one narrow (id, shard, hash) groupby exchange;
    ranks are assigned per shard inside ``map_groups`` (vectorized
    argsort over one shard ≈ corpus/num_shards rows); doc payloads
    never move — join the output back or pass ``docs`` already pruned
    to ids, then write with ``checkpointed_write`` partitioned on
    ``shard``.
    """
    def keyed(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        h = _mix64_i64(ids)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shard": pa.array(
                    (h % np.uint64(num_shards)).astype(np.int64), pa.int64()
                ),
                "__h": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        # unsigned hash order (the int64 view flips sign on big hashes)
        hu = df["__h"].to_numpy().view(np.uint64)
        order = np.lexsort((df[id_col].to_numpy(), hu))
        out = df.iloc[order].reset_index(drop=True)
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(),
                "shard": out["shard"].to_numpy(),
                "pos": np.arange(len(out), dtype=np.int64),
            }
        )

    keyed_ds = docs.select_columns([id_col]).map_batches(
        keyed, batch_format="pyarrow"
    )
    return keyed_ds.groupby("shard").map_groups(rank, batch_format="pandas")


def source_overlap_matrix(
    docs: ray.data.Dataset,
    *,
    n: int = 4,
    source_col: str = "source",
    text_col: str = "text",
    num_shards: int = 32,
    max_sources_per_gram: int | None = None,
) -> ray.data.Dataset:
    """Cross-source n-gram overlap matrix: for every unordered source
    pair (a < b), the number of DISTINCT n-gram types both emit — the
    corpus-level contamination / provenance diagnostic run before
    mixing (a high cell means two "independent" sources share pipeline
    ancestry or mirror each other).

    Scale contract: each block emits its distinct (gram, source) pairs
    (the explode never leaves the map task); pairs co-locate by
    hash(gram) into ``num_shards`` coarse groups; a shard resolves all
    of its grams with ONE vectorized self-merge (per-gram source lists
    are tiny — bounded by source cardinality, or by
    ``max_sources_per_gram`` when sources are web domains: a gram seen
    by more sources than the cap is dropped as stopword-like, the
    standard guard against the quadratic hot-gram blowup; None = no
    cap, exact).  Per-shard pair-count partials tree-sum through one
    final O(#source-pairs) groupby.  Returns (src_a, src_b, shared).
    """

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        flat, starts, counts = _flat_tokens(df[text_col])
        grams, owner = _ngram_strings(flat, starts, n)
        out = pd.DataFrame(
            {
                "ng": grams,
                source_col: df[source_col].to_numpy()[owner],
            }
        ).drop_duplicates()
        h = pd.util.hash_array(out["ng"].to_numpy(dtype=object)).astype(np.int64)
        return out.assign(__gshard=h % num_shards)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):  # zero-column empty reduce partitions (see raylog.py)
            return g
        u = g[["ng", source_col]].drop_duplicates()
        if max_sources_per_gram is not None:
            sz = u.groupby("ng", sort=False)["ng"].transform("size")
            u = u[sz <= max_sources_per_gram]
        m = u.merge(u, on="ng")
        m = m[m[f"{source_col}_x"] < m[f"{source_col}_y"]]
        out = (
            m.groupby([f"{source_col}_x", f"{source_col}_y"], sort=False)
            .size()
            .reset_index(name="shared")
        )
        out.columns = ["src_a", "src_b", "shared"]
        return out

    from .relational import grouped_aggregate

    partials = (
        docs.map_batches(pairs, batch_format="pandas")
        .groupby("__gshard")
        .map_groups(shard_pairs, batch_format="pandas")
    )
    return grouped_aggregate(partials, ["src_a", "src_b"], [("shared", "shared", "sum")])
