"""Deduplication operators over document tables, Ray-Data-first.

Five dedup families a 100 TB training-data pipeline needs, each built
on the same shuffle shape as the reference's tile content-dedup
(`INSERT OR IGNORE` on content hash, /root/reference/src/mbtiles.rs:104-107
→ groupby(hash) keep-first, SURVEY.md §2.6 G5):

- ``exact_dedup``             hash(normalized text) → hash-partition →
                              keep min doc_id per group.
- ``minhash_lsh_dedup``       char-shingles → k minhashes → band
                              signatures → groupby(band bucket) →
                              IN-GROUP estimated-Jaccard verify →
                              verified-pair Dataset → components →
                              survivors.
- ``simhash_dedup``           64-bit simhash → bucket by 4×16-bit
                              quarters → in-group Hamming verify.
- ``ngram_jaccard_dedup``     word n-gram minhash LSH candidates,
                              exact Jaccard verify via a distributed
                              double join of candidate texts.
- ``embedding_cosine_dedup``  random-hyperplane LSH buckets over an
                              embedding column, exact cosine verify via
                              the same distributed pair join.

Scale contract (what never happens on the driver):

- No ``take_all()`` of per-document state — signatures ride the band
  explode (minhash: ``num_hashes``×8 B × bands per doc; simhash: 8 B),
  so each bucket group verifies its own candidates inside
  ``map_groups`` with both signatures in hand.
- Verified duplicate pairs form a ``Dataset``; connected components /
  survivor election run OFF-driver: a single worker task for small
  pair sets, else a sharded two-level union-find — per-shard local
  union-find in ``map_groups`` (shard = hash(u) range), then a tiny
  cross-shard label-link graph resolved in one worker task
  (the "shard the union-find by pair-hash range" scheme).
- Payload verification (exact n-gram Jaccard, exact cosine) moves the
  payload only for candidate-pair members: texts/vectors are
  semi-filtered map-side against a broadcast candidate-id set, then
  attached to each pair by a broadcast lookup (candidate payloads ≤
  ``_BROADCAST_PAYLOAD_LIMIT``) or, beyond that, a distributed double
  hash join — both candidate-sized, never corpus-sized.
- The only driver-resident artifacts are the candidate-id and drop-id
  arrays — O(duplicates), not O(corpus).  For corpora where even the
  duplicate-id set exceeds driver memory, swap ``_filter_dropped``'s
  broadcast for an anti-join on ``id_col`` (relational.shuffle_hash_join
  with join_type="left_anti") — the shuffle-cost tradeoff is documented
  there.

Pair lists are quadratic only within a bucket — band width / bit
budget keeps buckets small, and a ``max_bucket`` guard skips
degenerate buckets (the "empty-document" hot-key analog of the
all-ocean tile, SURVEY §7.6.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.text import _FP_BASE, _FP_OFF, char_shingles, word_ngrams

# ---------------------------------------------------------------- exact


def _adaptive_shards(ds: ray.data.Dataset, *, floor: int = 64) -> tuple[ray.data.Dataset, int]:
    """Materialize ``ds`` and derive a shard count targeting
    ``_TARGET_SHARD_BYTES`` per ``map_groups`` group, so one group holds
    a bounded slice of the data instead of a fixed 1/64 of the corpus
    (which OOMs a worker at cluster scale).  The shuffle that follows
    pays the materialization cost anyway; the object store spills."""
    ds = ds.materialize()
    return ds, max(floor, int(ds.size_bytes() // _TARGET_SHARD_BYTES))


_TARGET_SHARD_BYTES = 256 << 20


def _norm_hash64(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """int64 hash of whitespace-normalized text — the shared content-
    identity convention of ``exact_dedup`` and ``dedup_incremental``
    (split/join normalization, ``pd.util.hash_array``)."""
    s = texts.to_pandas().fillna("")
    norm = s.str.split().str.join(" ")
    return pd.util.hash_array(norm.to_numpy(dtype=object)).astype(np.int64)


def exact_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int | None = None,
) -> ray.data.Dataset:
    """Keep the min-id row per exact (whitespace-normalized) text.

    Content hashes are nearly unique (most documents are NOT
    duplicates), so ``groupby(hash).map_groups`` would pay one Python
    call per distinct document.  Instead the shuffle co-locates rows by
    hash(content) into coarse shards — equal hashes still land
    together — and each shard elects winners with one vectorized
    pandas ``groupby(hash).idxmin`` pass.  ``num_shards`` defaults to
    size-adaptive (~256 MB of rows per shard).
    """

    def add_hash(shards: int):
        def f(batch: pa.Table) -> pa.Table:
            h = _norm_hash64(batch.column(text_col))
            return batch.append_column("__content_hash", pa.array(h)).append_column(
                "__cshard", pa.array(h % shards)
            )

        return f

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__content_hash", id_col], kind="mergesort")
        g = g.drop_duplicates("__content_hash", keep="first")
        return g.drop(columns=["__content_hash", "__cshard"])

    if num_shards is None:
        docs, num_shards = _adaptive_shards(docs)
    return (
        docs.map_batches(add_hash(num_shards), batch_format="pyarrow")
        .groupby("__cshard")
        .map_groups(keep_min, batch_format="pandas")
    )


# ------------------------------------------- pair → component machinery


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller id as root → survivor = min of cluster
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def _uf_over_tables(tables) -> _UnionFind:
    uf = _UnionFind()
    for t in tables:
        # Ray's join op emits zero-row blocks with EMPTY schemas; they
        # pass through map_batches untouched — skip them.
        if len(t) == 0 or "u" not in t.schema.names:
            continue
        for a, b in zip(t.column("u").to_pylist(), t.column("v").to_pylist()):
            uf.union(a, b)
    return uf


@ray.remote
def _uf_drop_task(*blocks) -> pa.Array:
    """Worker-task union-find over pair blocks → ids to drop (non-roots)."""
    uf = _uf_over_tables(blocks)
    drop = sorted(x for x in uf.parent if uf.find(x) != x)
    return pa.array(drop) if drop else None


@ray.remote
def _uf_roots_task(*blocks):
    """Worker-task union-find over (label, label) links → sorted key /
    root arrays for vectorized remapping (None when no links)."""
    uf = _uf_over_tables(blocks)
    if not uf.parent:
        return None
    keys = sorted(uf.parent)
    return pa.array(keys), pa.array([uf.find(k) for k in keys])


def _two_level_labels(pairs: ray.data.Dataset, num_shards: int):
    """Shared sharded union-find core: pair Dataset → (``merged``
    assignments Dataset with rows (kind 0 = node→min-local-label
    assignment / kind 1 = label→label link, u, v), broadcast root-map
    ref resolving cross-shard labels to the global component min).
    Used by both ``compute_drop_ids`` and ``connected_components``."""

    def add_shard(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch.column("u").to_pandas().to_numpy(dtype=object)
        ).astype(np.int64)
        return batch.append_column("__shard", pa.array(h % num_shards))

    def local_uf(group: pa.Table) -> pa.Table:
        uf = _uf_over_tables([group])
        nodes = sorted(uf.parent)
        u_type = group.column("u").type
        return pa.table(
            {
                "node": pa.array(nodes, u_type),
                "label": pa.array([uf.find(x) for x in nodes], u_type),
            }
        )

    local = (
        pairs.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(local_uf, batch_format="pyarrow")
    )

    def add_node_shard(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch.column("node").to_pandas().to_numpy(dtype=object)
        ).astype(np.int64)
        return batch.append_column("__nshard", pa.array(h % num_shards))

    # per node (vectorized over a whole hash-shard of nodes):
    # assignment = min label; links = (min label, each other label)
    def assign_and_link(group: pa.Table) -> pa.Table:
        t = group.column("node").type
        df = pd.DataFrame(
            {
                "node": group.column("node").to_pandas(),
                "label": group.column("label").to_pandas(),
            }
        ).drop_duplicates()
        mins = df.groupby("node", sort=False)["label"].transform("min")
        assign = df[df["label"] == mins]
        extras = df[df["label"] != mins]
        kinds = np.concatenate(
            [np.zeros(len(assign), np.int8), np.ones(len(extras), np.int8)]
        )
        us = pd.concat([assign["node"], mins[extras.index]])
        vs = pd.concat([assign["label"], extras["label"]])
        return pa.table(
            {
                "kind": pa.array(kinds, pa.int8()),
                "u": pa.array(us.to_numpy(), t),
                "v": pa.array(vs.to_numpy(), t),
            }
        )

    merged = (
        local.map_batches(add_node_shard, batch_format="pyarrow")
        .groupby("__nshard")
        .map_groups(assign_and_link, batch_format="pyarrow")
        .materialize()
    )

    def links_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.equal(batch.column("kind"), 1)).select(["u", "v"])

    links = merged.map_batches(links_only, batch_format="pyarrow").materialize()
    roots = ray.get(_uf_roots_task.remote(*links.to_arrow_refs()))
    return merged, ray.put(roots)


def _resolve_labels(label: np.ndarray, r) -> np.ndarray:
    """Remap local labels through the broadcast (keys, roots) map from
    ``_two_level_labels`` (identity where a label has no cross-shard
    link)."""
    if r is None:
        return label
    keys = np.asarray(r[0].to_pandas(), dtype=object)
    vals = np.asarray(r[1].to_pandas(), dtype=object)
    idx = np.searchsorted(keys, label)
    idx_c = np.clip(idx, 0, len(keys) - 1)
    hit = keys[idx_c] == label
    return np.where(hit, vals[idx_c], label)


def compute_drop_ids(
    pairs: ray.data.Dataset,
    *,
    shard_threshold: int = 2_000_000,
    num_shards: int | None = None,
) -> pa.Array | None:
    """Duplicate-pair Dataset (columns ``u``, ``v``) → ids to drop
    (every node that is not the min of its connected component).

    Small pair sets (≤ ``shard_threshold``) resolve in ONE worker task.
    Larger sets use the sharded two-level scheme: hash(u)-range shards
    (count adaptive, ~1M pairs/shard) each run a local union-find in
    ``map_groups`` emitting (node, local-min-label); a node landing in
    several shards links its labels, and that far smaller label graph
    resolves in one worker task whose root map is broadcast back over
    the assignments.  Level 2 re-keys by hash(node) into shard-sized
    groups processed with vectorized pandas (never one Python call per
    node).  Duplicate edges (the same pair found by several bands) are
    harmless — union-find is idempotent — so callers never pre-dedupe
    pairs.

    Returns a sorted id array (driver-resident, O(duplicates)) for the
    broadcast filter, or None when there are no duplicates.
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return None
    if n_pairs <= shard_threshold:
        return ray.get(_uf_drop_task.remote(*pairs.to_arrow_refs()))
    if num_shards is None:
        num_shards = max(64, n_pairs // 1_000_000)

    merged, roots_ref = _two_level_labels(pairs, num_shards)

    def drop_in_batch(batch: pa.Table) -> pa.Table:
        assign = batch.filter(pa.compute.equal(batch.column("kind"), 0))
        node = assign.column("u")
        label = assign.column("v").to_pandas().to_numpy(dtype=object)
        label = _resolve_labels(label, ray.get(roots_ref))
        keep = label != np.asarray(node.to_pandas(), dtype=object)
        return pa.table({"drop_id": node.filter(pa.array(keep))})

    out = []
    for b in merged.map_batches(drop_in_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.append(b.column("drop_id").combine_chunks())
    if not out or sum(len(a) for a in out) == 0:
        return None
    flat = pa.concat_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out]
    )
    return flat.take(pa.compute.array_sort_indices(flat))


def _filter_dropped(
    docs: ray.data.Dataset, drop: pa.Array | None, id_col: str
) -> ray.data.Dataset:
    """Map-only survivor filter against the broadcast drop-id array."""
    drop_ref = ray.put(drop)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ds_arr = ray.get(drop_ref)
        if ds_arr is None:
            return batch
        return batch.filter(pc.invert(pc.is_in(batch.column(id_col), value_set=ds_arr)))

    return docs.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------- minhash


def _minhash_params(num_hashes: int, seed: int = 1234):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**61 - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, 2**61 - 1, size=num_hashes, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: doc → num_hashes minhash signature.

    State (hash params) built once per actor (§2.3 pattern); __call__
    vectorizes over the shingle sets with one (num_hashes × shingles)
    numpy broadcast per doc.  A fully batch-flattened reduceat variant
    was measured 20x SLOWER (a (total_windows × num_hashes) broadcast
    blows the cache; the per-doc arrays stay L2-resident) — re-measure
    before "optimizing" this into flattened form again.
    """

    def __init__(self, num_hashes: int = 64, shingle_k: int = 5, text_col: str = "text"):
        self.a, self.b = _minhash_params(num_hashes)
        self.num_hashes = num_hashes
        self.k = shingle_k
        self.text_col = text_col

    def signature(self, shingles: set[int]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
        sh = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        with np.errstate(over="ignore"):
            vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) >> np.uint64(3)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.stack(
            [self.signature(char_shingles(t or "", self.k)) for t in texts]
        ) if texts else np.zeros((0, self.num_hashes), dtype=np.uint64)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64) if sigs.size else [], pa.int64()),
            self.num_hashes,
        )
        return batch.append_column("__minhash", sig_col)


def _band_hash(sigs: np.ndarray, band: int, rows_per_band: int) -> np.ndarray:
    """Stable 64-bit hash of one band slice of each signature."""
    sl = sigs[:, band * rows_per_band : (band + 1) * rows_per_band].astype(np.uint64)
    h = np.full(len(sl), int(_FP_OFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in range(sl.shape[1]):
            h = (h ^ sl[:, c]) * _FP_BASE
            h ^= h >> np.uint64(29)
    return h


def _band_salt(band: int) -> np.uint64:
    with np.errstate(over="ignore"):
        return np.uint64((band * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)


def _empty_pairs(id_type: pa.DataType) -> pa.Table:
    empty = pa.array([], id_type)
    return pa.table({"u": empty, "v": empty})


# Broadcast candidate payloads when they fit in this many bytes of the
# object store; beyond it, fall back to the candidate-sized shuffle join.
_BROADCAST_PAYLOAD_LIMIT = 256 << 20


def _col_type(ds: ray.data.Dataset, col: str) -> pa.DataType:
    """Arrow type of ``col`` from a Dataset's (Ray) schema wrapper."""
    s = ds.schema()
    return s.types[s.names.index(col)]


def _apply_per_bucket(
    buckets: ray.data.Dataset,
    per_bucket,
    id_type: pa.DataType,
    *,
    num_shards: int | None = None,
) -> ray.data.Dataset:
    """Run ``per_bucket(bucket_table) -> pairs`` over every multi-member
    ``__bucket`` group WITHOUT one map_groups call per bucket.

    LSH bucket keys are nearly unique (most buckets hold one doc), so a
    ``groupby(__bucket).map_groups`` pays one Python call per bucket —
    one per DOCUMENT×band at scale.  Instead the shuffle groups by
    hash(bucket) into coarse shards; inside a shard one sort +
    run-length slicing visits only the multi-member buckets (exactly
    the candidate-bearing ones), so Python call count tracks
    candidates, not corpus size.  ``num_shards`` defaults to
    size-adaptive so a shard group stays ~256 MB regardless of corpus
    size.
    """
    if num_shards is None:
        buckets, num_shards = _adaptive_shards(buckets)

    def shard(batch: pa.Table) -> pa.Table:
        b = batch.column("__bucket").to_numpy()
        return batch.append_column(
            "__bshard", pa.array((b % num_shards).astype(np.int64))
        )

    def run(group: pa.Table) -> pa.Table:
        t = group.sort_by("__bucket")
        b = t.column("__bucket").to_numpy()
        # run boundaries over the sorted bucket column
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        outs = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                outs.append(per_bucket(t.slice(s, e - s)))
        outs = [o for o in outs if len(o)]
        return pa.concat_tables(outs) if outs else _empty_pairs(id_type)

    return (
        buckets.map_batches(shard, batch_format="pyarrow")
        .groupby("__bshard")
        .map_groups(run, batch_format="pyarrow")
    )


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency=(1, 16),
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """MinHash + LSH near-dedup: keep one representative (min id) per
    near-duplicate cluster; estimated Jaccard verify on candidates.

    The full signature rides the band explode (num_hashes×8 B × bands
    per doc) so each bucket verifies its own candidates in
    ``map_groups`` — nothing per-document ever lands on the driver.

    A narrow-explode variant (only (id, bucket) rows shuffle; distinct
    candidate pairs verified via the ngram/embedding payload-attach
    path) was MEASURED WORSE at sf0.1 and is not an asymptotic win
    either: with 4-row bands the candidate set is false-positive
    dominated (~8 candidate pairs/doc, 400k pairs → 255 verified), so
    attaching 2×num_hashes×8 B per candidate pair moves the SAME ~8
    KB/doc the signature ride costs, plus three extra stages (pair
    dedup shuffle, member scan, attach) — 12.5 s vs 8.2 s warm end to
    end.  In-bucket verify amortizes false positives at vectorized
    speed; re-measure candidate density before reviving the variant.
    """
    rows_per_band = num_hashes // bands
    signed = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, shingle_k=shingle_k, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()

    # band explode: one row per (doc, band), signature carried
    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs = np.asarray(batch.column("__minhash").combine_chunks().flatten()).reshape(
            n, num_hashes
        )
        ids = batch.column(id_col).combine_chunks()
        sig_chunk = batch.column("__minhash").combine_chunks()
        out = []
        for band in range(bands):
            bh = _band_hash(sigs, band, rows_per_band)
            out.append(
                pa.table(
                    {
                        id_col: ids,
                        "__minhash": sig_chunk,
                        # band index folded into bucket so bands don't collide
                        "__bucket": pa.array((bh ^ _band_salt(band)).astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(out)

    def verify_group(group: pa.Table) -> pa.Table:
        id_type = group.column(id_col).type
        n = len(group)
        if n < 2 or n > max_bucket:
            return _empty_pairs(id_type)
        ids = group.column(id_col).to_pylist()
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        sigs = np.asarray(group.column("__minhash").combine_chunks().flatten()).reshape(
            n, num_hashes
        )[order]
        # pairwise fraction of agreeing hash positions = estimated Jaccard
        eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(n, 1)
        keep = eq[iu, ju] >= jaccard_threshold
        sorted_ids = [ids[i] for i in order]
        return pa.table(
            {
                "u": pa.array([sorted_ids[i] for i in iu[keep]], id_type),
                "v": pa.array([sorted_ids[j] for j in ju[keep]], id_type),
            }
        )

    pairs = _apply_per_bucket(
        signed.map_batches(explode, batch_format="pyarrow"),
        verify_group,
        _col_type(signed, id_col),
    )
    drop = compute_drop_ids(pairs)
    return _filter_dropped(signed.drop_columns(["__minhash"]), drop, id_col)


# ------------------------------------------------------------- simhash


class SimHasher:
    """Actor-pool stage: doc → 64-bit simhash over hashed shingles."""

    def __init__(self, shingle_k: int = 5, text_col: str = "text"):
        self.k = shingle_k
        self.text_col = text_col

    def simhash(self, shingles: set[int]) -> int:
        if not shingles:
            return 0
        sh = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        h = np.array(
            [self.simhash(char_shingles(t or "", self.k)) for t in texts], dtype=np.uint64
        )
        return batch.append_column("__simhash", pa.array(h.astype(np.int64)))


def simhash_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    concurrency=(1, 16),
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """SimHash near-dedup: 4×16-bit prefix tables bucket candidates
    (any pair within Hamming ≤ 3 of 64 bits shares ≥1 exact 16-bit
    quarter by pigeonhole); exact Hamming verify inside each bucket
    group (the 8-byte hash rides the explode)."""
    signed = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column("__simhash").to_numpy().astype(np.uint64)
        ids = batch.column(id_col).combine_chunks()
        sim = batch.column("__simhash").combine_chunks()
        out = []
        for q in range(4):
            quarter = ((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            out.append(
                pa.table(
                    {
                        id_col: ids,
                        "__simhash": sim,
                        "__bucket": pa.array(quarter + (q << 16)),
                    }
                )
            )
        return pa.concat_tables(out)

    def verify_group(group: pa.Table) -> pa.Table:
        id_type = group.column(id_col).type
        n = len(group)
        if n < 2 or n > max_bucket:
            return _empty_pairs(id_type)
        ids = group.column(id_col).to_pylist()
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        h = group.column("__simhash").to_numpy().astype(np.uint64)[order]
        x = np.ascontiguousarray(h[:, None] ^ h[None, :])
        pop = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
        iu, ju = np.triu_indices(n, 1)
        keep = pop[iu, ju] <= hamming_threshold
        sorted_ids = [ids[i] for i in order]
        return pa.table(
            {
                "u": pa.array([sorted_ids[i] for i in iu[keep]], id_type),
                "v": pa.array([sorted_ids[j] for j in ju[keep]], id_type),
            }
        )

    pairs = _apply_per_bucket(
        signed.map_batches(explode, batch_format="pyarrow"),
        verify_group,
        _col_type(signed, id_col),
    )
    drop = compute_drop_ids(pairs)
    return _filter_dropped(signed.drop_columns(["__simhash"]), drop, id_col)


# ---------------------------------------- distributed payload verify


def _candidate_pairs_from_buckets(
    buckets: ray.data.Dataset, id_col: str, *, max_bucket: int, id_type: pa.DataType
) -> ray.data.Dataset:
    """Bucketed (id, __bucket) rows → distinct candidate-pair Dataset."""

    def emit(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column(id_col).to_pylist()))
        if len(ids) < 2 or len(ids) > max_bucket:
            return _empty_pairs(id_type)
        iu, ju = np.triu_indices(len(ids), 1)
        return pa.table(
            {
                "u": pa.array([ids[i] for i in iu], id_type),
                "v": pa.array([ids[j] for j in ju], id_type),
            }
        )

    return _apply_per_bucket(buckets, emit, id_type)


def _member_id_array(pairs: ray.data.Dataset) -> pa.Array | None:
    """Distinct candidate-pair member ids (driver array, O(candidates)).

    Iterated as narrow Arrow batches, never ``take_all``.  For corpora
    where candidates outgrow driver memory, substitute a distributed
    Bloom filter build (functions/bloom.py) — false positives only add
    rows to the verify join.
    """
    chunks = []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        chunks.append(b.column("u").combine_chunks())
        chunks.append(b.column("v").combine_chunks())
    chunks = [c for c in chunks if len(c)]
    if not chunks:
        return None
    flat = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in chunks]
    )
    return pa.compute.unique(flat)


def _attach_pair_payloads(
    pairs: ray.data.Dataset,
    source: ray.data.Dataset,
    *,
    id_col: str,
    payload_col: str,
) -> ray.data.Dataset:
    """(u, v) pairs + source table → (u, v, __payload_u, __payload_v).

    Payloads move only for candidate members: the source is
    semi-filtered map-side against the broadcast member-id set, then a
    distributed double hash join attaches each side.  All shuffles are
    candidate-sized.
    """
    pairs = pairs.materialize()  # consumed twice: member scan + join
    members = _member_id_array(pairs)
    if members is None or len(members) == 0:
        return None
    members_ref = ray.put(members)

    def fetch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.select([id_col, payload_col]).filter(
            pc.is_in(batch.column(id_col), value_set=ray.get(members_ref))
        )
        # Arrow's hash join rejects list-typed non-key fields — ship
        # vector payloads as row bytes instead (decoded with
        # np.frombuffer by the verifier).  Float-valued lists (any
        # layout, incl. fixed_size_list<float32>) go as float64 — the
        # embedding verifier decodes float64 unconditionally; integer
        # lists keep their native dtype, since int64 minhash signatures
        # would corrupt through a float64 round-trip (53-bit mantissa).
        ptype = t.column(payload_col).type
        if (
            pa.types.is_list(ptype)
            or pa.types.is_large_list(ptype)
            or pa.types.is_fixed_size_list(ptype)
        ):
            n = len(t)
            if n == 0:
                rows = pa.array([], pa.binary())
            else:
                col = t.column(payload_col).combine_chunks()
                flat = np.asarray(col.flatten())
                if not np.issubdtype(flat.dtype, np.integer):
                    flat = flat.astype(np.float64)
                mat = flat.reshape(n, -1)
                rows = pa.array([row.tobytes() for row in mat], pa.binary())
            t = t.set_column(
                t.schema.get_field_index(payload_col), payload_col, rows
            )
        return t

    small = source.map_batches(fetch, batch_format="pyarrow").materialize()

    # Candidate payloads are O(candidate members), not O(corpus).  When
    # they fit comfortably in the object store (per-node shared-memory
    # copy), attach them with a broadcast lookup — zero shuffle, one
    # vectorized index_in+take per pairs block.  The double shuffle
    # join below remains the fallback for candidate sets too large to
    # broadcast (e.g. a pathological corpus that is mostly duplicates).
    if small.size_bytes() <= _BROADCAST_PAYLOAD_LIMIT:

        @ray.remote
        def _combine(*blocks: pa.Table) -> pa.Table:
            blocks = [b for b in blocks if len(b)]
            t = pa.concat_tables(blocks) if blocks else None
            return t.combine_chunks() if t is not None else None

        tbl_ref = _combine.remote(*small.to_arrow_refs())

        def attach(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if len(batch) == 0 or "u" not in batch.schema.names:
                return batch
            tbl = ray.get(tbl_ref)
            ids = tbl.column(id_col)
            pay = tbl.column(payload_col)
            iu = pc.index_in(batch.column("u"), value_set=ids)
            iv = pc.index_in(batch.column("v"), value_set=ids)
            return batch.append_column("__payload_u", pc.take(pay, iu)).append_column(
                "__payload_v", pc.take(pay, iv)
            )

        return pairs.map_batches(attach, batch_format="pyarrow")

    from .relational import shuffle_hash_join

    left_side = small.map_batches(
        lambda b: b.rename_columns(["__ju", "__payload_u"]), batch_format="pyarrow"
    )
    right_side = small.map_batches(
        lambda b: b.rename_columns(["__jv", "__payload_v"]), batch_format="pyarrow"
    )
    num_parts = max(int(ray.cluster_resources().get("CPU", 8)), 8)
    joined = shuffle_hash_join(
        pairs, left_side, on="u", right_on="__ju", num_partitions=num_parts
    )
    joined = shuffle_hash_join(
        joined, right_side, on="v", right_on="__jv", num_partitions=num_parts
    )
    return joined.drop_columns([c for c in ("__ju", "__jv") if c in joined.columns()])


# ------------------------------------------------------ n-gram jaccard


def ngram_jaccard_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    concurrency=(1, 16),
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """Word-n-gram Jaccard dedup: minhash-LSH candidate generation over
    the n-gram sets, then EXACT Jaccard verification — the candidate
    texts are attached to each pair by a distributed double join and
    the n-gram sets recomputed per pair in ``map_batches`` (exactness
    at verify time, sketch only for bucketing)."""

    class NGramMinHasher(MinHasher):
        def __call__(self, batch: pa.Table) -> pa.Table:  # shingles → word n-grams
            texts = batch.column(self.text_col).to_pylist()
            sigs = np.stack(
                [self.signature(word_ngrams(t or "", n)) for t in texts]
            ) if texts else np.zeros((0, self.num_hashes), dtype=np.uint64)
            sig_col = pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.int64) if sigs.size else [], pa.int64()),
                self.num_hashes,
            )
            return batch.append_column("__minhash", sig_col)

    rows_per_band = num_hashes // bands
    signed = docs.map_batches(
        NGramMinHasher,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def explode(batch: pa.Table) -> pa.Table:
        nrows = len(batch)
        sigs = np.asarray(batch.column("__minhash").combine_chunks().flatten()).reshape(
            nrows, num_hashes
        )
        ids = batch.column(id_col).combine_chunks()
        out_ids, out_buckets = [], []
        for band in range(bands):
            bh = _band_hash(sigs, band, rows_per_band)
            out_ids.append(ids)
            out_buckets.append(pa.array((bh ^ _band_salt(band)).astype(np.int64)))
        return pa.table({id_col: pa.concat_arrays(out_ids), "__bucket": pa.concat_arrays(out_buckets)})

    buckets = signed.map_batches(explode, batch_format="pyarrow")
    id_type = _col_type(docs, id_col)
    pairs = _candidate_pairs_from_buckets(
        buckets, id_col, max_bucket=max_bucket, id_type=id_type
    )
    with_texts = _attach_pair_payloads(pairs, docs, id_col=id_col, payload_col=text_col)

    if with_texts is None:
        drop = None
    else:

        def verify(batch: pa.Table) -> pa.Table:
            # the >broadcast-limit join fallback emits zero-row blocks
            # with EMPTY schemas (see _uf_over_tables) — skip them with
            # the pair id type preserved
            if "u" not in batch.schema.names or len(batch) == 0:
                return _empty_pairs(id_type)
            keep = []
            tu = batch.column("__payload_u").to_pylist()
            tv = batch.column("__payload_v").to_pylist()
            for a, b in zip(tu, tv):
                ga, gb = word_ngrams(a or "", n), word_ngrams(b or "", n)
                un = len(ga | gb)
                keep.append(bool(un and len(ga & gb) / un >= threshold))
            return batch.filter(pa.array(keep)).select(["u", "v"])

        drop = compute_drop_ids(with_texts.map_batches(verify, batch_format="pyarrow"))
    return _filter_dropped(docs, drop, id_col)


# ------------------------------------------------- embedding cosine


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.97,
    num_planes: int = 12,
    seed: int = 99,
    max_bucket: int = 512,
) -> ray.data.Dataset:
    """Near-dup removal on an embedding column: random-hyperplane LSH
    buckets (sign pattern of num_planes projections) generate candidate
    pairs; exact cosine verifies via the distributed pair join
    (vectors move only for candidate members); min-id survivor per
    cluster.

    Neighbouring buckets at Hamming distance 1 are also probed
    (multi-probe) so near-threshold pairs split by one plane are kept.
    """
    first = ds.take(1)
    dim = len(first[0][vec_col]) if first else 0
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, num_planes)) if dim else np.zeros((0, num_planes))
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        n = len(batch)
        vecs = np.asarray(batch.column(vec_col).combine_chunks().flatten(), dtype=np.float64).reshape(n, -1)
        norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        signs = (norm @ pl) > 0
        code = (signs.astype(np.uint64) << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        ids = batch.column(id_col).combine_chunks()
        out_ids = [ids]
        out_codes = [pa.array(code.astype(np.int64))]
        for p in range(num_planes):  # multi-probe ring-1
            out_ids.append(ids)
            out_codes.append(pa.array((code ^ (np.uint64(1) << np.uint64(p))).astype(np.int64)))
        return pa.table({id_col: pa.concat_arrays(out_ids), "__bucket": pa.concat_arrays(out_codes)})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow")
    id_type = _col_type(ds, id_col)
    pairs = _candidate_pairs_from_buckets(
        buckets, id_col, max_bucket=max_bucket, id_type=id_type
    )
    with_vecs = _attach_pair_payloads(pairs, ds, id_col=id_col, payload_col=vec_col)

    if with_vecs is None:
        drop = None
    else:

        def verify(batch: pa.Table) -> pa.Table:
            if "u" not in batch.schema.names or len(batch) == 0:
                return _empty_pairs(id_type)
            va = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in batch.column("__payload_u").to_pylist()]
            )
            vb = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in batch.column("__payload_v").to_pylist()]
            )
            na = np.maximum(np.linalg.norm(va, axis=1), 1e-12)
            nb = np.maximum(np.linalg.norm(vb, axis=1), 1e-12)
            cos = (va * vb).sum(axis=1) / (na * nb)
            return batch.filter(pa.array(cos >= threshold)).select(["u", "v"])

        drop = compute_drop_ids(with_vecs.map_batches(verify, batch_format="pyarrow"))
    return _filter_dropped(ds, drop, id_col)


# ------------------------------------------------- paragraph-level dedup


def dedup_paragraphs(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_shards: int = 64,
) -> ray.data.Dataset:
    """CCNet-style paragraph-level exact deduplication: split every
    document on ``sep``, keep only the corpus-wide FIRST occurrence of
    each exact paragraph (first = smallest ``(id, paragraph_index)``),
    and reassemble each document from its surviving paragraphs in
    order.  Output: ``(id, text, n_removed)``; a document whose every
    paragraph was seen earlier yields the empty string.

    The boilerplate-removal primitive for web corpora (headers,
    footers, nav text repeat across pages; CCNet dedups at paragraph
    granularity for exactly this reason).

    Scale contract: paragraph TEXT never rides an exchange.  Stage 1
    maps each doc to one narrow row per paragraph — ``(hash64(para),
    id, idx)``, ~24 B — and stage 2 elects first-occurrence winners on
    a coarse ``hash % num_shards`` co-location (equal hashes land in
    the same shard) with ONE vectorized sort + duplicated() pass per
    shard, emitting only loser drop-tags ``(id, idx)``.  Stage 3
    co-locates each doc's text with its sparse drop tags via the same
    tag-union shuffle ``remove_dup_ngrams`` uses (one exchange keyed by
    ``hash(id)``), re-splits, boolean-masks, and joins — no driver
    state anywhere.
    """

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "__h": pa.array([], pa.int64()),
                    id_col: pa.array([], batch.column(id_col).type),
                    "idx": pa.array([], pa.int64()),
                    "__pshard": pa.array([], pa.int64()),
                }
            )
        texts = batch.column(text_col).to_pandas().fillna("")
        parts = texts.str.split(sep)
        lens = parts.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate([np.asarray(p, dtype=object) for p in parts])
        parents = np.repeat(np.arange(n), lens)
        starts = np.cumsum(lens) - lens
        idx = np.arange(len(flat), dtype=np.int64) - starts[parents]
        h = pd.util.hash_array(flat).astype(np.int64)
        ids = batch.column(id_col).take(pa.array(parents))
        return pa.table(
            {
                "__h": pa.array(h),
                id_col: ids,
                "idx": pa.array(idx),
                "__pshard": pa.array(h % num_shards),
            }
        )

    def losers(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["__h", id_col, "idx"], kind="mergesort")
        drop = g[g["__h"].duplicated(keep="first")]
        # arrow out, metadata stripped: blocks with pandas metadata have
        # UNHASHABLE schemas and every downstream reduce task then logs
        # "Failed to hash the schemas" (see raylog.py)
        return pa.Table.from_pandas(
            drop[[id_col, "idx"]], preserve_index=False
        ).replace_schema_metadata(None)

    drop_tags = (
        docs.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("__pshard")
        .map_groups(losers, batch_format="pandas")
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
                "idx": pa.array(np.full(len(batch), -1, np.int64)),
            }
        )

    def tag_drop(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(ids, dtype=object)).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__rshard": pa.array(h % num_shards),
                "__tag": pa.array(np.ones(len(batch), np.int8)),
                text_col: pa.array(np.full(len(batch), "", dtype=object), pa.string()),
                "idx": pa.array(batch.column("idx").to_numpy(zero_copy_only=False)),
            }
        )

    tagged = (
        docs.select_columns([id_col, text_col])
        .map_batches(tag_text, batch_format="pyarrow")
        .union(drop_tags.map_batches(tag_drop, batch_format="pyarrow"))
    )

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        t = group[group["__tag"].to_numpy() == 0]
        d = group[group["__tag"].to_numpy() == 1]
        texts = t[text_col].fillna("")
        parts = texts.str.split(sep)
        lens = parts.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate(
            [np.asarray(p, dtype=object) for p in parts]
        ) if len(t) else np.empty(0, dtype=object)
        parents = np.repeat(np.arange(len(t)), lens)
        starts = np.cumsum(lens) - lens
        row_of = pd.Series(np.arange(len(t)), index=t[id_col].to_numpy())
        drows = row_of.loc[d[id_col].to_numpy()].to_numpy() if len(d) else np.empty(0, np.int64)
        gdrop = starts[drows] + d["idx"].to_numpy() if len(d) else np.empty(0, np.int64)
        keep = np.ones(len(flat), dtype=bool)
        keep[gdrop] = False
        kept, kparents = flat[keep], parents[keep]
        joined = (
            pd.Series(kept).groupby(kparents).agg(sep.join)
            if len(kept)
            else pd.Series(dtype=object)
        )
        out_text = np.full(len(t), "", dtype=object)
        out_text[joined.index.to_numpy()] = joined.to_numpy(dtype=object)
        return pd.DataFrame(
            {
                id_col: t[id_col].to_numpy(),
                text_col: out_text,
                "n_removed": np.bincount(drows, minlength=len(t)).astype(np.int64)
                if len(d)
                else np.zeros(len(t), np.int64),
            }
        )

    return tagged.groupby("__rshard").map_groups(rebuild, batch_format="pandas")


# ------------------------------------------------- connected components


def connected_components(
    pairs: ray.data.Dataset,
    *,
    shard_threshold: int = 2_000_000,
    num_shards: int | None = None,
) -> ray.data.Dataset:
    """Undirected edge list (columns ``u``, ``v``) → one row per
    distinct node: ``(node, component)`` where ``component`` is the
    smallest node id in the node's connected component.  The
    entity-resolution primitive behind every near-dup family here,
    exposed first-class (record linkage, citation clusters, follower
    graphs).  Nodes with no edge never appear in the input and so are
    absent from the output — union a self-map of the full node set if
    isolated nodes must be labeled.

    Scale contract: the ``compute_drop_ids`` topology.  Small edge
    sets (≤ ``shard_threshold``) resolve in one worker task; larger
    sets run the sharded two-level union-find (hash(u)-sharded local
    UF in ``map_groups`` → tiny cross-shard label graph in one task →
    broadcast root map applied over the distributed assignments), so
    no single process ever holds the full edge set.  Duplicate and
    self edges are harmless (union-find is idempotent).
    """
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        schema = pairs.schema()  # ray.data.Schema: parallel names/types lists
        t = (
            schema.types[schema.names.index("u")]
            if schema is not None and "u" in schema.names
            else pa.int64()
        )
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], t), "component": pa.array([], t)})
        )
    if n_pairs <= shard_threshold:
        r = ray.get(_uf_roots_task.remote(*pairs.to_arrow_refs()))
        return ray.data.from_arrow(pa.table({"node": r[0], "component": r[1]}))
    if num_shards is None:
        num_shards = max(64, n_pairs // 1_000_000)

    merged, roots_ref = _two_level_labels(pairs, num_shards)

    def emit(batch: pa.Table) -> pa.Table:
        assign = batch.filter(pa.compute.equal(batch.column("kind"), 0))
        node = assign.column("u")
        label = assign.column("v").to_pandas().to_numpy(dtype=object)
        label = _resolve_labels(label, ray.get(roots_ref))
        return pa.table({"node": node, "component": pa.array(label, node.type)})

    return merged.map_batches(emit, batch_format="pyarrow")


# ------------------------------------------------- incremental ingest


def dedup_incremental(
    new: ray.data.Dataset,
    reference: ray.data.Dataset,
    *,
    text_col: str = "text",
    ref_text_col: str | None = None,
    bits_log2: int = 22,
    k: int = 4,
) -> ray.data.Dataset:
    """Drop rows of ``new`` whose exact (whitespace-normalized) text
    already exists in ``reference`` — the batch-(N+1)-vs-corpus
    incremental-ingest dedup (the production shape: yesterday's corpus
    is sealed; only today's crawl is screened against it).  Within-batch
    duplicates of ``new`` are NOT removed — compose with ``exact_dedup``
    for that.

    Topology (NO all-to-all exchange anywhere):

    1. per-block partial Bloom filters over reference content hashes
       OR-merge driver-side (associative; ``2^bits_log2 / 8`` bytes
       each) and broadcast once via ``ray.put`` — the reference is
       summarized, never broadcast or shuffled;
    2. Bloom-NEGATIVE rows of ``new`` are definitively clean (false
       negatives impossible) and stream straight through, map-only —
       at web scale this is ~99% of the batch;
    3. Bloom-positive "suspects" (true duplicates + ~1% false
       positives) are exact-verified: the suspect hash set —
       O(duplicates), the only driver-resident state — semi-filters
       the reference map-side, the confirmed-hash intersection
       broadcasts back, and one map-only filter drops confirmed rows.

    For batches whose suspect set exceeds driver memory, swap step 3
    for a shuffle anti-join on the hash column
    (``relational.shuffle_hash_join``) — exchange cost, same result.
    """
    from ..functions.bloom import Bloom

    ref_text_col = ref_text_col or text_col

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__ih", pa.array(_norm_hash64(batch.column(text_col)))
        )

    def ref_hashes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"__ih": pa.array(_norm_hash64(batch.column(ref_text_col)))}
        )

    def bloom_partial(batch: pa.Table) -> pa.Table:
        b = Bloom(bits_log2, k)
        b.add_many(batch.column("__ih").to_numpy())
        return pa.table({"bloom": pa.array([b.to_bytes()], pa.binary())})

    ref_h = reference.map_batches(ref_hashes, batch_format="pyarrow")
    merged = Bloom(bits_log2, k)
    for row in ref_h.map_batches(bloom_partial, batch_format="pyarrow").take_all():
        merged = merged.merge(Bloom.from_bytes(row["bloom"], bits_log2, k))
    bloom_ref = ray.put(merged.to_bytes())

    # hash once; two downstream passes read the same blocks
    new_h = new.map_batches(add_hash, batch_format="pyarrow").materialize()

    def _collect_hashes(ds: ray.data.Dataset) -> np.ndarray:
        # per-block pre-uniqued partials stream to the driver —
        # O(suspects), the documented driver bound
        chunks = [
            np.asarray(b.column("__ih"))
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
            if b.num_rows
        ]
        return (
            np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
        )

    def suspect_hashes(batch: pa.Table) -> pa.Table:
        h = batch.column("__ih").to_numpy()
        b = Bloom.from_bytes(ray.get(bloom_ref), bits_log2, k)
        return pa.table({"__ih": pa.array(np.unique(h[b.contains(h)]), pa.int64())})

    suspects = _collect_hashes(
        new_h.map_batches(suspect_hashes, batch_format="pyarrow")
    )
    if len(suspects):
        sus_ref = ray.put(suspects)

        def confirm(batch: pa.Table) -> pa.Table:
            h = batch.column("__ih").to_numpy()
            mask = np.isin(h, ray.get(sus_ref))
            return pa.table({"__ih": pa.array(np.unique(h[mask]), pa.int64())})

        confirmed = _collect_hashes(
            ref_h.map_batches(confirm, batch_format="pyarrow")
        )
    else:
        confirmed = np.empty(0, np.int64)
    conf_ref = ray.put(confirmed)

    def drop_confirmed(batch: pa.Table) -> pa.Table:
        h = batch.column("__ih").to_numpy()
        keep = ~np.isin(h, ray.get(conf_ref))
        return batch.filter(pa.array(keep)).drop_columns(["__ih"])

    return new_h.map_batches(drop_confirmed, batch_format="pyarrow")


def _aggressive_norm(s: pd.Series) -> pd.Series:
    """Canonical text form for normalization-aware dedup: lowercase,
    every non-[a-z0-9] run → one space, strip.  Chosen because Python
    ``re`` and DuckDB RE2 agree exactly on this class (no unicode
    case-fold edge cases enter: the class itself is ASCII)."""
    return (
        s.fillna("")
        .str.lower()
        .str.replace(r"[^a-z0-9]+", " ", regex=True)
        .str.strip()
    )


def normalized_exact_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int | None = None,
) -> ray.data.Dataset:
    """Exact dedup under aggressive canonicalization (lowercase +
    punctuation/whitespace folding) — catches the trivially-reformatted
    duplicates (case changes, punctuation swaps, re-wrapped whitespace)
    that byte-exact dedup misses and MinHash wastes signatures on.
    Keeps the min-``id_col`` row per canonical form; original text rides
    through untouched.

    Same 100-TB topology as ``exact_dedup``: canonical-hash coarse
    shards co-locate equal forms, one vectorized idxmin pass per shard;
    only (row + 16 bytes) moves, no driver state.
    """

    def add_hash(shards: int):
        def f(batch: pa.Table) -> pa.Table:
            norm = _aggressive_norm(batch.column(text_col).to_pandas())
            h = pd.util.hash_array(norm.to_numpy(dtype=object)).astype(np.int64)
            return batch.append_column("__content_hash", pa.array(h)).append_column(
                "__cshard", pa.array(h % shards)
            )

        return f

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):  # zero-column empty reduce partitions (see raylog.py)
            return group
        g = group.sort_values(["__content_hash", id_col], kind="mergesort")
        g = g.drop_duplicates("__content_hash", keep="first")
        return g.drop(columns=["__content_hash", "__cshard"])

    if num_shards is None:
        docs, num_shards = _adaptive_shards(docs)
    return (
        docs.map_batches(add_hash(num_shards), batch_format="pyarrow")
        .groupby("__cshard")
        .map_groups(keep_min, batch_format="pandas")
    )


def semdedup(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.97,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dense_cluster: int = 4096,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate pruning on an embedding column — k-means clusters
    the corpus, then WITHIN each cluster any pair with cosine
    similarity >= ``threshold`` is collapsed, keeping the member
    farthest from its centroid (the paper's keep-rule; ties broken by
    lowest id for determinism).

    Topology: distributed Lloyd training (``ann.kmeans_centroids`` —
    centroid state is the only driver payload), one tagging pass that
    assigns each vector and computes its centroid distance, ONE hash
    exchange on the cluster id, and a per-cluster greedy prune in
    ``map_groups`` (members visited farthest-first; a member survives
    iff its cosine to every already-kept member is < threshold).
    Dropped ids are O(duplicates) driver-resident, broadcast back for
    the map-only survivor filter — the same final shape as the LSH
    dedups.

    Scale: the within-cluster pairwise test is the algorithm's defined
    cost (SemDeDup runs k large precisely so clusters stay small —
    corpus/k on average; k is the knob).  Clusters up to
    ``dense_cluster`` members use one full cosine matrix; bigger ones
    fall back to an incremental kept-matrix product with identical
    semantics — a memory strategy switch, never a truncation.
    """
    from .ann import _as_matrix, _normalize, kmeans_centroids

    cents = kmeans_centroids(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    cents_ref = ray.put(cents)

    def tag(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        if len(batch) == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                    "vec": pa.array([], pa.binary()),
                }
            )
        mat = _as_matrix(batch, vec_col)
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        best = d2[np.arange(len(mat)), assign]
        return pa.table(
            {
                "cluster": pa.array(assign.astype(np.int64)),
                id_col: batch.column(id_col),
                "d2": pa.array(best, pa.float64()),
                "vec": pa.array([row.tobytes() for row in mat], pa.binary()),
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        m = len(g)
        if m <= 1:
            return pa.table({id_col: pa.array([], pa.int64())})
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        d2 = g.column("d2").to_numpy(zero_copy_only=False)
        vecs = np.stack(
            [np.frombuffer(b, dtype=np.float64) for b in g.column("vec").to_pylist()]
        )
        nm = _normalize(vecs)
        order = np.lexsort((ids, -d2))  # farthest-from-centroid first
        dropped = np.zeros(m, dtype=bool)
        if m <= dense_cluster:
            sim = nm[order] @ nm[order].T
            for i in range(1, m):
                kept_before = ~dropped[order[:i]]
                if (sim[i, :i][kept_before] >= threshold).any():
                    dropped[order[i]] = True
        else:
            kept_rows = [nm[order[0]]]
            for i in range(1, m):
                cand = nm[order[i]]
                km = np.stack(kept_rows)
                if (km @ cand >= threshold).any():
                    dropped[order[i]] = True
                else:
                    kept_rows.append(cand)
        return pa.table({id_col: pa.array(ids[dropped], pa.int64())})

    drops = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
        .to_pandas()  # O(duplicates) driver-resident, like compute_drop_ids
    )
    drop = pa.array(np.sort(drops[id_col].to_numpy())) if len(drops) else None
    return _filter_dropped(ds, drop, id_col)


def record_linkage(
    ds: ray.data.Dataset,
    *,
    id_col: str,
    name_col: str,
    block_prefix: int = 8,
    max_distance: int = 1,
) -> ray.data.Dataset:
    """Entity resolution (record linkage): cluster rows whose names are
    within ``max_distance`` Levenshtein edits, using prefix blocking so
    the quadratic verify only runs inside blocks — the classic
    blocking → verify → transitive-closure pipeline (Fellegi-Sunter
    family).

    Topology: one groupby on the block key (names move once), in-group
    pairwise byte-DP verify bounded by block size, duplicate-pair
    stream into the sharded union-find (``connected_components``), and
    every row labeled with its component's minimum id (singletons label
    themselves).  Same survivor-election scale contract as the dedup
    family; blocking recall is the caller's knob (prefix length), NOT a
    silent cap — pairs split by blocking are out of contract by
    definition, exactly like LSH banding.
    """

    def keyed(b: pa.Table) -> pa.Table:
        names = pc.utf8_slice_codeunits(b.column(name_col), 0, block_prefix)
        return pa.table(
            {
                "block": names,
                id_col: b.column(id_col),
                name_col: b.column(name_col),
            }
        )

    def verify(g: pa.Table) -> pa.Table:
        n = len(g)
        e = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
        if n < 2:
            return e
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        names = [s.encode() for s in g.column(name_col).to_pylist()]

        def lev_le(a: bytes, bb: bytes, k: int) -> bool:
            if abs(len(a) - len(bb)) > k:
                return False
            prev = list(range(len(bb) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i] + [0] * len(bb)
                for j, cb in enumerate(bb, 1):
                    cur[j] = min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                if min(cur) > k:
                    return False
                prev = cur
            return prev[-1] <= k

        us, vs = [], []
        for i in range(n):  # block-bounded quadratic verify
            for j in range(i + 1, n):
                a, b2 = int(ids[i]), int(ids[j])
                if a > b2:
                    a, b2 = b2, a
                if lev_le(names[i], names[j], max_distance):
                    us.append(a)
                    vs.append(b2)
        if not us:
            return e
        return pa.table({"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    pairs = keyed_ds.groupby("block").map_groups(verify, batch_format="pyarrow")
    comp = connected_components(pairs)

    # label every row: component min where linked, self otherwise —
    # union a self-map and take the min per id (one narrow groupby)
    def self_map(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b.column(id_col), pa.int64()),
                "component": pc.cast(b.column(id_col), pa.int64()),
            }
        )

    from .relational import grouped_aggregate as _ga

    labels = _ga(
        comp.union(ds.map_batches(self_map, batch_format="pyarrow")),
        ["node"],
        [("canonical_id", "component", "min")],
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b.column("node"), "canonical_id": b.column("canonical_id")}
        )

    return labels.map_batches(rename, batch_format="pyarrow")
