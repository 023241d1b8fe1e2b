"""Deduplication operators over document tables, Ray-Data-first.

Five dedup families a 100 TB training-data pipeline needs, each built
on the same shuffle shape as the reference's tile content-dedup
(`INSERT OR IGNORE` on content hash, /root/reference/src/mbtiles.rs:104-107
→ groupby(hash) keep-first, SURVEY.md §2.6 G5):

- ``exact_dedup``             hash(normalized text) → hash-partition →
                              keep min doc_id per group.
- ``minhash_lsh_dedup``       char-shingles → k minhashes → band
                              signatures → groupby(band bucket) →
                              candidate pairs → union-find → survivors.
- ``simhash_dedup``           64-bit simhash → bucket by rotated prefix
                              (4×16-bit tables) → verify Hamming ≤ t.
- ``ngram_jaccard_dedup``     word n-gram sets, LSH-bucketed candidate
                              generation + exact Jaccard verify.
- ``embedding_cosine_dedup``  random-hyperplane LSH buckets over an
                              embedding column + exact cosine verify.

Scale notes.  Every family is (1) per-batch vectorized signature
computation in ``map_batches`` (actor pools where state is warmed),
(2) ONE shuffle on the bucket key, (3) per-group candidate
verification in ``map_groups``, (4) a driver-side union-find over the
(tiny) duplicate-pair list, broadcast back as a drop-set.  The only
all-to-all exchange moves signatures (dozens of bytes/doc), never the
documents themselves; the final filter streams the full table against
the broadcast drop-set.  Pair lists are quadratic only within a
bucket — band width / bit budget keeps buckets small, and a
``max_bucket`` guard skips degenerate buckets (the "empty-document"
hot-key analog of the all-ocean tile, SURVEY §7.6.5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.text import _FP_BASE, _FP_OFF, char_shingles, word_ngrams

# ---------------------------------------------------------------- exact


def exact_dedup(
    docs: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the min-id row per exact (whitespace-normalized) text.

    Hash-partition on a 64-bit content hash of the normalized text,
    keep-first inside each group — one shuffle of (id, hash) width.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().fillna("")
        norm = s.str.split().str.join(" ")
        h = pd.util.hash_array(norm.to_numpy(dtype=object)).astype(np.int64)
        return batch.append_column("__content_hash", pa.array(h))

    def keep_min(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = pc.index(group.column(id_col), pc.min(group.column(id_col)))
        return group.slice(i.as_py(), 1)

    return (
        docs.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__content_hash")
        .map_groups(keep_min, batch_format="pyarrow")
        .drop_columns(["__content_hash"])
    )


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
    numpy broadcast per doc.
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
        # per-doc loop, but each doc's shingling + 64-hash min is one
        # numpy sliding-window pass — measured FASTER than a fully
        # batch-flattened reduceat variant (cache-local per-doc arrays,
        # set-dedup before the 64×|shingles| broadcast)
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


def _pairs_from_groups(
    grouped: ray.data.Dataset, id_col: str, *, max_bucket: int = 256
) -> list[tuple]:
    """Per-bucket candidate pair emission (map_groups) → driver list."""

    def emit(group: pa.Table) -> pa.Table:
        id_type = group.column(id_col).type
        ids = sorted(group.column(id_col).to_pylist())
        if len(ids) < 2 or len(ids) > max_bucket:
            empty = pa.array([], id_type)
            return pa.table({"left": empty, "right": empty})
        left, right = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                left.append(ids[i])
                right.append(ids[j])
        return pa.table({"left": pa.array(left), "right": pa.array(right)})

    rows = grouped.map_groups(emit, batch_format="pyarrow").take_all()
    return [(r["left"], r["right"]) for r in rows]


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


def _drop_set_from_pairs(pairs) -> set:
    uf = _UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {x for x in uf.parent if uf.find(x) != x}


def _filter_dropped(docs: ray.data.Dataset, drop: set, id_col: str) -> ray.data.Dataset:
    drop_ref = ray.put(pa.array(sorted(drop)) if drop else None)

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ds_arr = ray.get(drop_ref)
        if ds_arr is None:
            return batch
        return batch.filter(pc.invert(pc.is_in(batch.column(id_col), value_set=ds_arr)))

    return docs.map_batches(f, batch_format="pyarrow")


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """MinHash + LSH near-dedup: keep one representative (min id) per
    near-duplicate cluster; estimated Jaccard verify on candidates.
    """
    rows_per_band = num_hashes // bands
    signed = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, shingle_k=shingle_k, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    ).materialize()

    # band explode: one row per (doc, band) with bucket = hash(band slice)
    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs = np.asarray(batch.column("__minhash").combine_chunks().flatten()).reshape(
            n, num_hashes
        )
        ids = batch.column(id_col)
        out_ids, out_buckets = [], []
        for band in range(bands):
            bh = _band_hash(sigs, band, rows_per_band)
            out_ids.append(ids)
            # band index folded into bucket so bands don't collide
            with np.errstate(over="ignore"):
                salt = np.uint64((band * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            out_buckets.append(pa.array((bh ^ salt).astype(np.int64)))
        return pa.table({
            id_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]),
            "__bucket": pa.concat_arrays(out_buckets),
        })

    buckets = signed.map_batches(explode, batch_format="pyarrow")
    raw_pairs = set(_pairs_from_groups(buckets.groupby("__bucket"), id_col))

    # verify candidates with estimated jaccard from full signatures
    if raw_pairs:
        sig_rows = signed.select_columns([id_col, "__minhash"]).take_all()
        sig_map = {r[id_col]: np.asarray(r["__minhash"], dtype=np.int64) for r in sig_rows}
        pairs = [
            (a, b)
            for a, b in raw_pairs
            if (sig_map[a] == sig_map[b]).mean() >= jaccard_threshold
        ]
    else:
        pairs = []
    drop = _drop_set_from_pairs(pairs)
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
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """SimHash near-dedup: 4×16-bit prefix tables bucket candidates
    (any pair within Hamming ≤ 3 of 64 bits shares ≥1 exact 16-bit
    quarter by pigeonhole); exact Hamming verify per candidate."""
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
        out_ids, out_buckets = [], []
        for q in range(4):
            quarter = ((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            out_ids.append(ids)
            out_buckets.append(pa.array(quarter + (q << 16)))
        return pa.table({
            id_col: pa.concat_arrays(out_ids),
            "__bucket": pa.concat_arrays(out_buckets),
        })

    buckets = signed.map_batches(explode, batch_format="pyarrow")
    raw_pairs = set(_pairs_from_groups(buckets.groupby("__bucket"), id_col))

    if raw_pairs:
        rows = signed.select_columns([id_col, "__simhash"]).take_all()
        hmap = {r[id_col]: np.uint64(r["__simhash"]) for r in rows}
        pairs = [
            (a, b)
            for a, b in raw_pairs
            if bin(int(hmap[a]) ^ int(hmap[b])).count("1") <= hamming_threshold
        ]
    else:
        pairs = []
    drop = _drop_set_from_pairs(pairs)
    return _filter_dropped(signed.drop_columns(["__simhash"]), drop, id_col)


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
    concurrency=(1, 4),
) -> ray.data.Dataset:
    """Word-n-gram Jaccard dedup: minhash-LSH candidate generation over
    the n-gram sets, then EXACT Jaccard verification (the n-gram sets of
    candidate docs are recomputed per pair — exactness at verify time,
    sketch only for bucketing)."""

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
    ).materialize()

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
            with np.errstate(over="ignore"):
                salt = np.uint64((band * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            out_buckets.append(pa.array((bh ^ salt).astype(np.int64)))
        return pa.table({id_col: pa.concat_arrays(out_ids), "__bucket": pa.concat_arrays(out_buckets)})

    buckets = signed.map_batches(explode, batch_format="pyarrow")
    raw_pairs = set(_pairs_from_groups(buckets.groupby("__bucket"), id_col))

    pairs = []
    if raw_pairs:
        need = {x for p in raw_pairs for x in p}
        need_ref = ray.put(pa.array(sorted(need)))

        def fetch(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.select([id_col, text_col]).filter(
                pc.is_in(batch.column(id_col), value_set=ray.get(need_ref))
            )

        texts = {
            r[id_col]: r[text_col]
            for r in docs.map_batches(fetch, batch_format="pyarrow").take_all()
        }
        grams = {i: word_ngrams(texts.get(i) or "", n) for i in need}
        for a, b in raw_pairs:
            ga, gb = grams[a], grams[b]
            u = len(ga | gb)
            if u and len(ga & gb) / u >= threshold:
                pairs.append((a, b))
    drop = _drop_set_from_pairs(pairs)
    return _filter_dropped(signed.drop_columns(["__minhash"]), drop, id_col)


# ------------------------------------------------- embedding cosine


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.97,
    num_planes: int = 12,
    seed: int = 99,
) -> ray.data.Dataset:
    """Near-dup removal on an embedding column: random-hyperplane LSH
    buckets (sign pattern of num_planes projections) generate candidate
    pairs; exact cosine verifies; min-id survivor per cluster.

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
    raw_pairs = set(_pairs_from_groups(buckets.groupby("__bucket"), id_col, max_bucket=512))

    pairs = []
    if raw_pairs:
        need = {x for p in raw_pairs for x in p}
        need_ref = ray.put(pa.array(sorted(need)))

        def fetch(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.select([id_col, vec_col]).filter(
                pc.is_in(batch.column(id_col), value_set=ray.get(need_ref))
            )

        vec_map = {
            r[id_col]: np.asarray(r[vec_col], dtype=np.float64)
            for r in ds.map_batches(fetch, batch_format="pyarrow").take_all()
        }
        for a, b in raw_pairs:
            va, vb = vec_map[a], vec_map[b]
            c = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-12))
            if c >= threshold:
                pairs.append((a, b))
    drop = _drop_set_from_pairs(pairs)
    return _filter_dropped(ds, drop, id_col)
