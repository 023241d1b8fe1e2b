"""Text-analysis Dataset stages over a documents table.

Thin Ray Data wrappers around the vectorized kernels in
``functions/text.py`` — each is one ``map_batches`` pass appending
columns (no shuffle, no row loop).  ``TextAnnotator`` is the
actor-pool form holding the compiled regex machinery once per actor
(§2.3 stateful-stage pattern); the plain functions are stateless
task-based stages for cheap kernels.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import text as T


class TextAnnotator:
    """Actor: annotate token counts, char-class ratios, stopword ratio,
    quality score, language guess, and 64-bit fingerprint per doc."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # warm the per-language regex cache once per actor
        _ = T.TOKEN_RE.pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_col).to_pandas()
        alpha, digit, punct, space = T.char_class_ratios(s)
        out = batch
        for name, arr in [
            ("n_tokens", pa.array(T.whitespace_token_count(s), pa.int64())),
            ("n_bpe_tokens", pa.array(T.bpe_ish_token_count(s), pa.int64())),
            ("alpha_ratio", pa.array(alpha, pa.float64())),
            ("digit_ratio", pa.array(digit, pa.float64())),
            ("punct_ratio", pa.array(punct, pa.float64())),
            ("stopword_ratio", pa.array(T.stopword_ratio(s), pa.float64())),
            ("quality", pa.array(T.quality_score(s), pa.float64())),
            ("lang_guess", pa.array(T.language_id(s), pa.string())),
            ("fingerprint", pa.array(T.doc_fingerprint(s).astype(np.int64), pa.int64())),
        ]:
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out


def annotate_text(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    concurrency=(1, 4),
    batch_size: int = 4096,
) -> ray.data.Dataset:
    return docs.map_batches(
        TextAnnotator,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def token_counts(docs: ray.data.Dataset, *, text_col: str = "text") -> ray.data.Dataset:
    """Stateless stage: (id cols ...) + n_tokens (whitespace tokens)."""

    def f(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        return batch.append_column("n_tokens", pa.array(T.whitespace_token_count(s), pa.int64()))

    return docs.map_batches(f, batch_format="pyarrow")


def word_counts(docs: ray.data.Dataset, *, text_col: str = "text") -> ray.data.Dataset:
    """Explode text to whitespace tokens and count occurrences per word.

    The explode never leaves the map task: each block contributes a
    (word, n) value_counts partial, so the exchange moves vocab-sized
    partials instead of one row per token — at 10^12 docs the shuffle
    is ~blocks x vocab, not corpus length.
    """
    import pandas as pd

    from .relational import grouped_aggregate

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[text_col].str.findall(r"\S+").explode().dropna().value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "n": vc.to_numpy()})

    return grouped_aggregate(
        docs.map_batches(partial, batch_format="pandas"), ["word"], [("n", "n", "sum")]
    )


class PIIScrubber:
    """Actor-pool stage: redact email / IPv4 / phone-shaped spans from a
    text column, appending ``had_pii``.

    Patterns are compiled once per actor (§2.3 stateful-stage pattern)
    and kept RE2-compatible (no lookaround) so a SQL engine's
    ``regexp_replace(..., 'g')`` reproduces the output byte-for-byte —
    parity is pinned by the pii_scrub oracle query.  Redaction is the
    canonical pre-training cleanup stage: map-only, zero shuffle, and
    trivially resumable at 100 TB.
    """

    PATTERNS: list[tuple[str, str]] = [
        (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
        (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
        (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ]

    def __init__(self, text_col: str = "text", out_col: str = "clean_text"):
        import re

        self.text_col = text_col
        self.out_col = out_col
        self.compiled = [(re.compile(p), r) for p, r in self.PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_col).to_pandas().fillna("")
        clean = s
        for pat, repl in self.compiled:
            clean = clean.str.replace(pat, repl, regex=True)
        out = batch.append_column(self.out_col, pa.array(clean, pa.string()))
        return out.append_column(
            "had_pii", pa.array((clean != s).to_numpy(), pa.bool_())
        )


def pii_scrub(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return docs.map_batches(
        PIIScrubber,
        fn_constructor_kwargs=dict(text_col=text_col, out_col=out_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def _bounded_vocab(
    vocab: ray.data.Dataset,
    *,
    value_col: str,
    word_col: str = "word",
    min_count: int = 1,
    max_vocab: int = 1 << 20,
) -> "pd.DataFrame":
    """Materialize a vocab-keyed aggregate onto the driver with a HARD
    bound: distributed ``min_count`` prune (kills the hapax tail — web
    vocab grows ~O(corpus^0.7) and is hapax-dominated) then a top-
    ``max_vocab`` cut by (count desc, word asc) — the sort/limit runs
    distributed, so the driver heap holds at most ``max_vocab`` rows no
    matter the corpus."""
    import pandas as pd

    if min_count > 1:
        lo = min_count

        def prune(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.greater_equal(batch.column(value_col), lo))

        vocab = vocab.map_batches(prune, batch_format="pyarrow")
    capped = vocab.sort([value_col, word_col], descending=[True, False]).limit(
        max_vocab
    )
    out = capped.to_pandas()
    assert len(out) <= max_vocab
    return out


def tfidf_top_terms(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_vocab: int = 1 << 20,
) -> ray.data.Dataset:
    """Per-doc highest-TF-IDF term (ties → lexicographically smallest).

    Same two-pass broadcast-state shape as ``unigram_logprob_scores``:
    pass 1 aggregates document frequency from map-side unique-per-doc
    partials (the exchange is vocab-sized, never token-rows); the IDF
    table broadcasts once via ``ray.put``; pass 2 scores each doc
    with one explode + vectorized ``Series.map`` + per-doc argmax.
    ``score_e4`` is the scaled-integer form (``floor(score·10⁴+0.5)``,
    non-negative scores) so the oracle compare is ulp-robust.

    Vocabulary contract (keeps the driver heap bounded at web scale):
    words with document frequency < ``min_df`` are not index terms
    (standard hapax pruning), and at most ``max_vocab`` terms survive,
    cut by (df desc, word asc).  Documents containing no surviving term
    emit no row — the SQL oracle mirrors both rules.
    """
    import ray as _ray

    from .relational import grouped_aggregate

    # consumed three times (DF aggregate, count, scoring) — pin the
    # upstream pipeline's output once instead of re-executing it
    docs = docs.materialize()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.findall(r"\S+")
        if not len(df):
            return pd.DataFrame({"word": pd.Series([], dtype=str), "df": pd.Series([], dtype=np.int64)})
        ex = pd.DataFrame(
            {
                "doc": df[id_col].to_numpy().repeat(toks.str.len().to_numpy()),
                "word": np.concatenate([np.asarray(t, dtype=object) for t in toks]),
            }
        )
        vc = ex.drop_duplicates()["word"].value_counts()
        return pd.DataFrame({"word": vc.index.astype(str), "df": vc.to_numpy()})

    dfreq = _bounded_vocab(
        grouped_aggregate(
            docs.map_batches(df_partial, batch_format="pandas"),
            ["word"],
            [("df", "df", "sum")],
        ),
        value_col="df",
        min_count=min_df,
        max_vocab=max_vocab,
    )
    n_docs = float(docs.count())
    idf = pd.Series(
        np.log(n_docs / dfreq["df"].to_numpy(dtype=np.float64)),
        index=dfreq["word"].astype(str),
    )
    ref = _ray.put(idf)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tbl = _ray.get(ref)
        toks = df[text_col].str.findall(r"\S+")
        if not len(df):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64), "top_term": pd.Series([], dtype=str),
                 "score_e4": pd.Series([], dtype=np.int64)}
            )
        g = (
            pd.DataFrame(
                {
                    "doc": df[id_col].to_numpy().repeat(toks.str.len().to_numpy()),
                    "word": np.concatenate([np.asarray(t, dtype=object) for t in toks]),
                }
            )
            .groupby(["doc", "word"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["score"] = g["tf"].to_numpy(dtype=np.float64) * g["word"].map(tbl).to_numpy(
            dtype=np.float64
        )
        # words pruned from the bounded vocab (df < min_df or beyond
        # max_vocab) are not index terms; docs with none left emit no row
        g = g.dropna(subset=["score"])
        g = g.sort_values(
            ["doc", "score", "word"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("doc", keep="first")
        return pd.DataFrame(
            {
                id_col: g["doc"].to_numpy(),
                "top_term": g["word"].astype(str).to_numpy(),
                # floor(x+0.5) == SQL round() for the non-negative scores
                "score_e4": np.floor(g["score"].to_numpy() * 1e4 + 0.5).astype(np.int64),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def mix_corpora(
    docs: ray.data.Dataset,
    weights: dict[str, float],
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    mult: int = 2654435761,
) -> ray.data.Dataset:
    """Deterministic training-mix construction: per ``group_col`` value,
    repeat each doc ``floor(w)`` times plus one more with probability
    ``frac(w)`` (decided by the same ``(id·mult) % 1000`` hash family as
    ``hash_sample`` — reproducible, resumable, and SQL-mirrorable).
    Output rows gain a ``copy_idx`` column (0-based repeat index).

    This is the sampling-ratio corpus mixing of large-scale LM data
    recipes ("N epochs of corpus A, 0.3 of corpus B") as a map-only
    stage: no shuffle, groups absent from ``weights`` drop out, and the
    fractional hash decides membership identically on every run.
    """
    base = {k: int(np.floor(w)) for k, w in weights.items()}
    frac_milli = {k: int(round((w - np.floor(w)) * 1000)) for k, w in weights.items()}

    def expand(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        ids = batch.column(id_col).to_numpy().astype(np.int64, copy=False)
        b = g.map(base).fillna(0).to_numpy(dtype=np.int64)
        fm = g.map(frac_milli).fillna(0).to_numpy(dtype=np.int64)
        extra = ((ids * np.int64(mult)) % np.int64(1000) < fm).astype(np.int64)
        known = g.isin(base).to_numpy(dtype=bool)
        copies = np.where(known, b + extra, 0)
        take = np.repeat(np.arange(len(batch), dtype=np.int64), copies)
        out = batch.take(pa.array(take))
        # 0..copies-1 per source row, vectorized: global arange minus
        # each row's segment start
        starts = np.repeat(np.cumsum(copies) - copies, copies)
        copy_idx = np.arange(len(take), dtype=np.int64) - starts
        return out.append_column("copy_idx", pa.array(copy_idx))

    return docs.map_batches(expand, batch_format="pyarrow")


def unigram_logprob_scores(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 1 << 20,
) -> ray.data.Dataset:
    """Per-doc mean unigram log-probability (LM-perplexity-style quality
    score): pass 1 builds corpus word counts (map-side partials — the
    "training" aggregate), the logprob table broadcasts once via
    ray.put, pass 2 scores each doc vectorized.  The classic two-pass
    broadcast-state shape of model-based quality filtering at 10^12
    docs: the model state is aggregate-sized, never the corpus.

    The LM keeps at most ``max_vocab`` words, cut distributed by
    (count desc, word asc); everything else scores at the OOV floor
    ``log(0.5 / total)``.  ``total`` stays the FULL corpus token count
    (a scalar aggregate), so probabilities are unaffected for words
    that survive the cut — only the tail collapses onto the floor.
    """
    import math

    import ray as _ray

    counts_ds = word_counts(docs, text_col=text_col).materialize()
    total = float(counts_ds.sum("n"))
    counts = _bounded_vocab(counts_ds, value_col="n", max_vocab=max_vocab)
    table = pd.Series(
        np.log(counts["n"].to_numpy(dtype=np.float64) / total),
        index=counts["word"].astype(str),
    )
    oov = math.log(0.5 / total)  # unseen/capped-word floor
    ref = _ray.put((table, oov))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # explode tokens, one vectorized hash lookup (Series.map), then a
        # groupby-mean back to the doc — no per-token Python in the sum
        tbl, floor = _ray.get(ref)
        toks = df[text_col].str.findall(r"\S+").reset_index(drop=True)
        lp_tok = toks.explode().dropna().map(tbl).fillna(floor)
        mean_lp = lp_tok.groupby(level=0).mean().reindex(
            range(len(df)), fill_value=0.0
        )
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "mean_lp": mean_lp.to_numpy()}
        )

    return docs.map_batches(score, batch_format="pandas")


def inverted_index(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 10,
    num_shards: int = 32,
) -> ray.data.Dataset:
    """Distributed inverted-index build: one row per word with its
    document frequency and the first ``postings_cap`` doc ids (sorted,
    comma-joined string — a bounded posting-list preview; the cap keeps
    hot words from producing multi-GB rows).

    Scale contract: the explode never leaves the map task — each block
    emits its DISTINCT (word, id) pairs, so the exchange moves
    per-block vocabulary pairs, not one row per token.  Pairs
    hash-shard by word into ``num_shards`` coarse groups; a shard
    resolves all of its words with vectorized pandas passes (the only
    per-word Python is the ','.join over the <= ``postings_cap``
    retained ids).
    """
    import pandas as pd

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # explode() labels survive from the pre-explode index; they are
        # only valid positional indices into the id column on a default
        # RangeIndex, so pin that here rather than assume the caller's
        df = df.reset_index(drop=True)
        toks = df[text_col].str.findall(r"\S+")
        ex = toks.explode().dropna()
        out = pd.DataFrame(
            {"word": ex.to_numpy(dtype=object), id_col: df[id_col].to_numpy()[ex.index]}
        ).drop_duplicates()
        h = pd.util.hash_array(out["word"].to_numpy(dtype=object)).astype(np.int64)
        return out.assign(__wshard=h % num_shards)

    def build(shard_df: pd.DataFrame) -> pd.DataFrame:
        u = shard_df[["word", id_col]].drop_duplicates().sort_values(["word", id_col])
        g = u.groupby("word", sort=False)
        df_counts = g.size()
        head = u.groupby("word", sort=False).head(postings_cap)
        post = (
            head.assign(s=head[id_col].astype(str))
            .groupby("word", sort=False)["s"]
            .agg(",".join)
        )
        return pd.DataFrame(
            {
                "word": df_counts.index.to_numpy(dtype=object),
                "df": df_counts.to_numpy(np.int64),
                "postings": post.reindex(df_counts.index).to_numpy(dtype=object),
            }
        )

    return (
        docs.select_columns([id_col, text_col])
        .map_batches(pairs, batch_format="pandas")
        .groupby("__wshard")
        .map_groups(build, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# trained character-n-gram language classifier
#
# Two-phase distributed "train a model, broadcast it, score everything"
# pattern: phase 1 is a (lang, gram) count aggregate over the labeled rows
# with per-batch pandas partials (so the exchange moves per-block distinct
# (lang, gram) pairs, not per-occurrence rows), capped to a top-V profile
# per language — the driver-side model is ≤ n_langs x top_v rows BY
# CONSTRUCTION, never vocabulary-sized.  Phase 2 broadcasts the profile
# matrix once via ray.put and scores each batch with searchsorted +
# np.add.at — integer count-overlap scoring (a Cavnar-Trenkle-style
# profile heuristic simplified to exact integer arithmetic) so the SQL
# oracle reproduces the argmax bit-for-bit with no float-sum-order
# ambiguity.  Docs shorter than n chars have no grams and are dropped,
# matching the oracle's FROM-grams semantics.
# ---------------------------------------------------------------------------


def train_char_ngram_profiles(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
    top_v: int = 32,
) -> pd.DataFrame:
    """(lang, gram, cnt) top-``top_v`` character-n-gram profile per
    language; grams packed uint64-as-int64 (see packed_char_ngrams).
    Ties broken (cnt DESC, gram ASC) to match the oracle's row_number."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        grams, di, _ = T.packed_char_ngrams(batch[text_col], n)
        df = pd.DataFrame(
            {"lang": batch[lang_col].to_numpy()[di], "gram": grams.astype(np.int64)}
        )
        return df.groupby(["lang", "gram"], sort=False).size().reset_index(name="cnt")

    # The TRAIN side is a labeled sample — bounded by definition (you
    # label thousands of docs, not the 100-TB corpus; the corpus-scale
    # path is the broadcast scoring pass).  So the per-block distinct
    # (lang, gram, cnt) partials merge EXACTLY on the driver with one
    # vectorized groupby-sum — replacing a Ray Aggregate + Sort pair
    # whose all-to-all fixed cost dominated this profile-sized table
    # ~10x (same lesson as the render images-phase partial merge).
    pdf = docs.map_batches(partials, batch_format="pandas").to_pandas()
    if not len(pdf):
        return pdf.reindex(columns=["lang", "gram", "cnt"])
    cnt = pdf.groupby(["lang", "gram"], sort=False)["cnt"].sum().reset_index()
    cnt = cnt.sort_values(["cnt", "gram"], ascending=[False, True], kind="mergesort")
    # bounded: <= n_langs x top_v rows by construction
    return cnt.groupby("lang", sort=False).head(top_v).reset_index(drop=True)


class _LangScorer:
    """Actor: broadcast profile matrix in __init__, score batches with one
    searchsorted + one scatter-add; integer scores, deterministic argmax
    (langs sorted ascending, np.argmax first-max = smallest lang)."""

    def __init__(self, profiles_ref, *, text_col, id_col, n):
        prof: pd.DataFrame = ray.get(profiles_ref)
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.langs = np.array(sorted(prof["lang"].unique()), dtype=object)
        lang_idx = {l: i for i, l in enumerate(self.langs)}
        grams = np.sort(prof["gram"].unique().astype(np.uint64))
        self.grams = grams
        self.counts = np.zeros((len(grams), len(self.langs)), dtype=np.int64)
        gi = np.searchsorted(grams, prof["gram"].to_numpy().astype(np.uint64))
        li = np.array([lang_idx[l] for l in prof["lang"]])
        self.counts[gi, li] = prof["cnt"].to_numpy()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        g, di, _ = T.packed_char_ngrams(batch[self.text_col], self.n)
        nb, nl = len(batch), len(self.langs)
        if nl == 0:  # degenerate: no trainable gram in the labeled set
            return pd.DataFrame(
                {self.id_col: batch[self.id_col].iloc[0:0],
                 "pred_lang": pd.Series([], dtype=object),
                 "score": pd.Series([], dtype=np.int64),
                 "margin": pd.Series([], dtype=np.int64)}
            )
        scores = np.zeros((nb, nl), dtype=np.int64)
        if len(g):
            idx = np.searchsorted(self.grams, g)
            idx_c = np.minimum(idx, len(self.grams) - 1)
            found = self.grams[idx_c] == g
            np.add.at(scores, di[found], self.counts[idx_c[found]])
        has_grams = np.zeros(nb, dtype=bool)
        has_grams[di] = True
        best = scores.argmax(axis=1)
        top = scores[np.arange(nb), best]
        if nl > 1:
            second = -np.partition(-scores, 1, axis=1)[:, 1]
        else:
            second = np.zeros(nb, dtype=np.int64)
        out = pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "pred_lang": self.langs[best],
                "score": top,
                "margin": top - second,
            }
        )
        return out.loc[has_grams]


def language_id_trained(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
    top_v: int = 32,
    labeled: ray.data.Dataset | None = None,
    batch_size: int = 8192,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Train-then-classify language ID: per-language top-V char-n-gram
    profiles from the ``labeled`` rows (default: self-train on ``docs``),
    broadcast once, integer count-overlap argmax per doc.

    Returns (id_col, pred_lang, score, margin); docs with < n chars are
    dropped (no grams).  Scale: the train exchange moves per-block
    distinct (lang, gram) pairs; the model is ≤ n_langs·top_v rows; the
    scoring pass is map-only over a broadcast model.
    """
    prof = train_char_ngram_profiles(
        labeled if labeled is not None else docs,
        text_col=text_col,
        lang_col=lang_col,
        n=n,
        top_v=top_v,
    )
    ref = ray.put(prof)
    return docs.map_batches(
        _LangScorer,
        fn_constructor_kwargs={"profiles_ref": ref, "text_col": text_col,
                               "id_col": id_col, "n": n},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Position-level winnowing fingerprints: polynomial hash of every
    character k-gram (exact-integer mod 2^32, see kgram_hashes), then for
    each window of ``w`` consecutive hashes keep the minimum (rightmost
    on ties), deduplicated — the classic local fingerprinting scheme that
    guarantees any shared substring of length ≥ k+w-1 yields a shared
    fingerprint.  Returns distinct (id_col, pos, fp) with 1-based char
    positions.  Docs with fewer than k+w-1 chars produce no rows (no full
    window).  Map-only: zero shuffle, batch-local numpy throughout.
    """

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        h, di, pos = T.kgram_hashes(batch[text_col], k)
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype=batch[id_col].dtype),
                "pos": pd.Series([], dtype=np.int64),
                "fp": pd.Series([], dtype=np.int64),
            }
        )
        if len(h) < w:
            return empty
        hw = np.lib.stride_tricks.sliding_window_view(h, w)
        valid = di[: len(hw)] == di[w - 1 :]
        if not valid.any():
            return empty
        rev = hw[valid][:, ::-1]
        off = (w - 1) - np.argmin(rev, axis=1)
        sel = np.flatnonzero(valid) + off
        key = di[sel].astype(np.uint64) << np.uint64(32) | pos[sel].astype(np.uint64)
        sel = sel[np.unique(key, return_index=True)[1]]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[di[sel]],
                "pos": pos[sel] + 1,
                "fp": h[sel].astype(np.int64),
            }
        )

    return docs.map_batches(per_batch, batch_format="pandas", batch_size=batch_size)


def bm25_topk(
    docs: ray.data.Dataset,
    queries: list[tuple[int, str]],
    *,
    k: int = 5,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """BM25 top-k retrieval of documents for a small set of queries.

    Scale contract (100 TB corpus, request-sized query set): the
    queries are broadcast state, never the corpus —

    1. pass 1 aggregates document frequency ONLY for query-vocabulary
       terms plus the two corpus scalars (doc count, total doc length)
       via map-side partials; the exchange and the driver pull are
       query-vocab-sized (``O(Σ|q|)``), independent of corpus vocab;
    2. the per-term idf table + avgdl broadcast once via ``ray.put``;
    3. pass 2 scores each block vectorized (explode → isin(qvocab) →
       per-(doc,term) tf) and keeps only its block-local top-k per
       query, so the final ``groupby(query_id)`` merge moves
       ``blocks × k`` rows per query.

    Scoring is the Lucene BM25 variant (idf = ln(1 + (N-df+.5)/(df+.5)),
    always positive; query-term multiplicity ignored).  Each (doc,term)
    contribution is rounded to a scaled integer (``floor(x·10⁶+.5)``)
    BEFORE summation so the doc score is an exact integer sum — ulp-robust
    against the SQL oracle regardless of float summation order.

    Returns (query_id, doc_id, score_e6), the k highest-scoring docs per
    query (ties → smallest doc_id).
    """
    import ray as _ray

    from .relational import grouped_aggregate

    qterms = pd.DataFrame(
        [(qid, w) for qid, qtext in queries for w in set(qtext.split())],
        columns=["query_id", "word"],
    )
    qvocab = set(qterms["word"])
    docs = docs.materialize()  # consumed twice (df pass + scoring pass)

    # ---- pass 1: query-vocab df + corpus scalars, one tiny exchange.
    # keys are namespaced ('n:' doc count, 'l:' token total, 'w:<word>'
    # df) so the scalar sentinels can never collide with a real token.
    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.findall(r"\S+")
        if not len(df):
            return pd.DataFrame(
                {"key": pd.Series([], dtype=str), "val": pd.Series([], dtype=np.int64)}
            )
        lens = toks.str.len().to_numpy(dtype=np.int64)
        ex = pd.DataFrame(
            {
                "doc": np.arange(len(df), dtype=np.int64).repeat(lens),
                "word": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks]
                    or [np.array([], dtype=object)]
                ),
            }
        )
        ex = ex[ex["word"].isin(qvocab)]
        vc = ex.drop_duplicates()["word"].value_counts()
        return pd.DataFrame(
            {
                "key": ["n:", "l:"] + ("w:" + vc.index.astype(str)).tolist(),
                "val": np.concatenate(
                    [[len(df), int(lens.sum())], vc.to_numpy(dtype=np.int64)]
                ).astype(np.int64),
            }
        )

    stats = (
        grouped_aggregate(
            docs.map_batches(stats_partial, batch_format="pandas"),
            ["key"],
            [("val", "val", "sum")],
        )
        .to_pandas()  # query-vocab-sized by construction (≤ Σ|q| + 2 rows)
        .set_index("key")["val"]
    )
    n_docs = int(stats["n:"])
    avgdl = int(stats["l:"]) / n_docs
    dfreq = {key[2:]: int(v) for key, v in stats.items() if key.startswith("w:")}
    idf = pd.Series(
        {
            w: float(np.log(1.0 + (n_docs - dfw + 0.5) / (dfw + 0.5)))
            for w, dfw in dfreq.items()
        },
        dtype=np.float64,
    )
    ref = _ray.put((idf, avgdl, qterms))

    empty = pd.DataFrame(
        {
            "query_id": pd.Series([], dtype=np.int64),
            id_col: pd.Series([], dtype=np.int64),
            "score_e6": pd.Series([], dtype=np.int64),
        }
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["query_id", "score_e6", id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.groupby("query_id", sort=False).head(k).reset_index(drop=True)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        tbl, adl, qt = _ray.get(ref)
        if not len(df):
            return empty
        toks = df[text_col].str.findall(r"\S+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        ex = pd.DataFrame(
            {
                "row": np.arange(len(df), dtype=np.int64).repeat(lens),
                "word": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks]
                    or [np.array([], dtype=object)]
                ),
            }
        )
        ex = ex[ex["word"].isin(tbl.index)]
        if not len(ex):
            return empty
        tf = ex.groupby(["row", "word"], sort=False).size().reset_index(name="tf")
        tfv = tf["tf"].to_numpy(dtype=np.float64)
        dl = lens[tf["row"].to_numpy()].astype(np.float64)
        w_idf = tf["word"].map(tbl).to_numpy(dtype=np.float64)
        # association mirrors the SQL oracle term by term:
        # (idf * (tf*(k1+1))) / (tf + k1*((1-b) + (b*dl)/avgdl))
        s = (w_idf * (tfv * (k1 + 1.0))) / (tfv + k1 * ((1.0 - b) + (b * dl) / adl))
        tf["s"] = np.floor(s * 1e6 + 0.5).astype(np.int64)
        m = tf.merge(qt, on="word")  # a term may serve several queries
        agg = (
            m.groupby(["query_id", "row"], sort=False)["s"].sum().reset_index()
        )
        out = pd.DataFrame(
            {
                "query_id": agg["query_id"].to_numpy(dtype=np.int64),
                id_col: df[id_col].to_numpy()[agg["row"].to_numpy()],
                "score_e6": agg["s"].to_numpy(dtype=np.int64),
            }
        )
        return topk(out)  # block-local partial top-k

    cand = docs.map_batches(score, batch_format="pandas")
    return cand.groupby("query_id").map_groups(topk, batch_format="pandas")


def pmi_bigrams(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 20,
) -> ray.data.Dataset:
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase-mining / tokenizer-merge-candidate pass over a text
    corpus.  PMI(a,b) = ln(p(ab) / (p(a)·p(b))) with p(ab) over the
    bigram total and p(·) over the unigram total, i.e.
    ``ln((c_ab·T·T) / (B·c_a·c_b))`` — emitted quantized
    (``score_e6 = floor(pmi·1e6 + 0.5)``) so the DuckDB oracle compares
    bit-for-bit (same libm, same float op order).

    Scale contract: bigram and unigram counts are map-side partials
    (per-block ``value_counts``) so each exchange moves blocks×vocab
    rows, never corpus-length token streams; unigram counts attach to
    the surviving (``c_ab ≥ min_count``) bigrams via two distributed
    hash joins — no vocab table ever lands on the driver.  The final
    top-k is a per-block partial top-k into a single-partition merge,
    O(blocks·k) rows.  Ties break on (w1, w2) ascending in both
    engines, so the cut is deterministic.
    """
    from .relational import grouped_aggregate, shuffle_hash_join

    def bigram_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.findall(r"\S+")
        toks = toks[toks.str.len() >= 2]
        if not len(toks):
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object),
                 "w2": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        w1 = np.concatenate([np.asarray(t[:-1], dtype=object) for t in toks])
        w2 = np.concatenate([np.asarray(t[1:], dtype=object) for t in toks])
        vc = pd.DataFrame({"w1": w1, "w2": w2}).value_counts(sort=False)
        out = vc.index.to_frame(index=False)
        out["n"] = vc.to_numpy(dtype=np.int64)
        return out

    bcnt = grouped_aggregate(
        docs.map_batches(bigram_partial, batch_format="pandas"),
        ["w1", "w2"],
        [("c_ab", "n", "sum")],
    )
    # the bigram total is the corpus token count minus one per >=1-token
    # doc; count both scalars in one cheap pass of narrow partials
    totals = docs.map_batches(
        lambda df: pd.DataFrame(
            {
                "toks": [int(df[text_col].str.count(r"\S+").sum())],
                "bigs": [int((df[text_col].str.count(r"\S+")
                              .clip(lower=1) - 1).sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    t_total = float(totals["toks"].sum())
    b_total = float(totals["bigs"].sum())

    ucnt = word_counts(docs, text_col=text_col)

    def survivors(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("c_ab"), pa.scalar(min_count, pa.int64()))
        return t.filter(keep)

    surv = bcnt.map_batches(survivors, batch_format="pyarrow")
    j1 = shuffle_hash_join(surv, ucnt, on="w1", right_on="word")

    def keep1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "c_ab": pa.array([], pa.int64()), "c_a": pa.array([], pa.int64())}
            )
        return pa.table(
            {"w1": t.column("w1"), "w2": t.column("w2"),
             "c_ab": pc.cast(t.column("c_ab"), pa.int64()),
             "c_a": pc.cast(t.column("n"), pa.int64())}
        )

    j2 = shuffle_hash_join(
        j1.map_batches(keep1, batch_format="pyarrow"), ucnt,
        on="w2", right_on="word",
    )

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
             "c_ab": pa.array([], pa.int64()), "score_e6": pa.array([], pa.int64())}
        )
        if t.num_rows == 0 or "n" not in t.column_names:
            return empty
        c_ab = np.asarray(t.column("c_ab"), dtype=np.float64)
        c_a = np.asarray(t.column("c_a"), dtype=np.float64)
        c_b = np.asarray(t.column("n"), dtype=np.float64)
        # float op order mirrors the SQL oracle exactly:
        # ln((c_ab*T*T) / (B*c_a*c_b))
        pmi = np.log((c_ab * t_total * t_total) / (b_total * c_a * c_b))
        e6 = np.floor(pmi * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {"w1": t.column("w1"), "w2": t.column("w2"),
             "c_ab": pc.cast(t.column("c_ab"), pa.int64()),
             "score_e6": pa.array(e6, pa.int64())}
        )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["score_e6", "w1", "w2"], ascending=[False, True, True]
        ).head(top_k)

    scored = j2.map_batches(score, batch_format="pyarrow")
    partial = scored.map_batches(topk, batch_format="pandas")
    return partial.repartition(1).map_batches(topk, batch_format="pandas")


def lm_quality_buckets(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 1 << 20,
    qs: Sequence[float] = (1 / 3, 2 / 3),
    labels: Sequence[str] = ("tail", "middle", "head"),
) -> ray.data.Dataset:
    """CCNet-style LM-quality bucketing: score every document with the
    corpus unigram LM (``unigram_logprob_scores``), then label each doc
    ``head`` / ``middle`` / ``tail`` by equi-depth tertiles of the score
    — the standard pre-training split that keeps only the most fluent
    slice of a crawl (CCNet trains on *head*, audits *middle*, drops
    *tail*).  Higher mean log-probability = lower perplexity = better,
    so the TOP tertile is ``head``.

    Cross-engine determinism: scores are quantized to e4 integers
    (the ``doc_lm_scores`` contract) BEFORE bucketing, so the boundary
    comparison is integer-exact in both engines; boundaries come from
    ``discrete_quantiles`` (tie-safe counting quantiles, matching
    DuckDB ``quantile_disc``), and assignment is the same value-
    threshold rule as ``equi_depth_buckets`` (``#{boundaries < v}``) —
    deterministic under ties, unlike NTILE.

    Scale contract: one LM-scoring pass (broadcast vocab, bounded by
    ``max_vocab``); the quantized score table (two int64 columns) is
    materialized once and scanned twice (boundary counting + map-only
    assignment); boundary state on the driver is O(len(qs)).  Docs with
    no tokens score 0.0 (the ``unigram_logprob_scores`` convention) and
    so land in the top bucket — filter empties upstream if that is not
    wanted.
    """
    from .relational import discrete_quantiles

    scored = unigram_logprob_scores(
        docs, text_col=text_col, id_col=id_col, max_vocab=max_vocab
    )

    def quant(t: pa.Table) -> pa.Table:
        # repo-wide e-quantization convention: floor(x*k + 0.5), i.e.
        # round-half-up — matches floor(x*10000+0.5) in the paired SQL
        # (np.round is half-to-even and diverges on exact .5 boundaries)
        v = np.floor(
            t.column("mean_lp").to_numpy(zero_copy_only=False) * 1e4 + 0.5
        ).astype(np.int64)
        return pa.table(
            {id_col: t.column(id_col), "mean_lp_e4": pa.array(v, pa.int64())}
        )

    e4 = scored.map_batches(quant, batch_format="pyarrow").materialize()
    qt = discrete_quantiles(e4, "mean_lp_e4", list(qs))
    bounds = np.sort(
        np.asarray([r["value"] for r in qt.to_pylist()], dtype=np.int64)
    )
    if len(bounds) != len(labels) - 1:
        raise ValueError("need len(labels) == len(qs) + 1")
    lab = np.asarray(list(labels), dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], t.schema.field(id_col).type),
                    "mean_lp_e4": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.string()),
                }
            )
        v = t.column("mean_lp_e4").to_numpy()
        b = (v[:, None] > bounds[None, :]).sum(axis=1)
        return t.append_column("bucket", pa.array(lab[b], pa.string()))

    return e4.map_batches(assign, batch_format="pyarrow")


def dsir_importance_weights(
    docs: ray.data.Dataset,
    target: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 1 << 20,
) -> ray.data.Dataset:
    """DSIR-style data-selection importance weights (the unigram-LM
    variant of Xie et al. 2023): score every candidate document by the
    mean per-token log-likelihood RATIO between a small ``target``
    corpus (the domain you want more of) and the full ``docs`` source
    corpus — ``weight = avg_t [ ln p_target(t) − ln p_source(t) ]``.
    Positive = looks more like the target than like the crawl; feed the
    output to ``equi_depth_buckets`` / ``select_by_token_budget`` /
    ``hash_sample`` for the actual selection step.

    Both LMs are corpus word-count aggregates with the
    ``unigram_logprob_scores`` conventions: vocab bounded distributed
    (``_bounded_vocab``, count-desc/word-asc cut), totals stay FULL
    corpus token counts, out-of-vocab floors at ``ln(0.5 / total)``
    per side.  Weights are e4-quantized for cross-engine hash
    stability.

    Scale contract: two count aggregates (vocab-partial exchange), two
    bounded broadcast tables via ``ray.put``, one vectorized map-only
    scoring pass (explode → two Series.map lookups → groupby-mean) —
    the target side is small by definition (a benchmark / curated set),
    and neither LM table can exceed ``max_vocab`` on any heap.
    """
    import math

    import ray as _ray

    def _lm(corpus: ray.data.Dataset) -> tuple[pd.Series, float]:
        counts_ds = word_counts(corpus, text_col=text_col).materialize()
        total = float(counts_ds.sum("n"))
        counts = _bounded_vocab(counts_ds, value_col="n", max_vocab=max_vocab)
        table = pd.Series(
            np.log(counts["n"].to_numpy(dtype=np.float64) / total),
            index=counts["word"].astype(str),
        )
        return table, math.log(0.5 / total)

    src_ref = _ray.put(_lm(docs))
    tgt_ref = _ray.put(_lm(target))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        s_tbl, s_floor = _ray.get(src_ref)
        t_tbl, t_floor = _ray.get(tgt_ref)
        toks = df[text_col].str.findall(r"\S+").reset_index(drop=True)
        flat = toks.explode().dropna()
        w_tok = flat.map(t_tbl).fillna(t_floor) - flat.map(s_tbl).fillna(s_floor)
        mean_w = w_tok.groupby(level=0).mean().reindex(
            range(len(df)), fill_value=0.0
        )
        e4 = np.floor(mean_w.to_numpy() * 1e4 + 0.5).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "weight_e4": e4})

    return docs.map_batches(score, batch_format="pandas")


def search_all_terms(
    docs: ray.data.Dataset,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Boolean AND search: documents whose whitespace-token set contains
    EVERY query term (the retrieval-side consumer of the
    ``inverted_index`` convention — same ``\\S+`` tokenizer).

    Because a document is one row, term membership is decidable inside
    the row's own block: explode tokens, filter to the O(|terms|) query
    set, count distinct matched terms per doc, keep == len(terms).
    Map-ONLY — no exchange; at 100 TB this is a full scan (as any
    cold-index search is) whose network cost is zero.
    """
    want = list(dict.fromkeys(terms))
    n_want = len(want)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].str.findall(r"\S+")
        ex = toks.explode().dropna()
        ex = ex[ex.isin(want)]
        pairs = pd.DataFrame(
            {id_col: df[id_col].to_numpy()[ex.index], "t": ex.to_numpy(dtype=object)}
        ).drop_duplicates()
        hit = pairs.groupby(id_col, sort=False).size()
        keep = hit[hit == n_want].index.to_numpy()
        out = df[df[id_col].isin(keep)]
        return out[[id_col]]

    return docs.map_batches(f, batch_format="pandas")


def _utf8_byte_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array → (N, Lmax) uint8 matrix (0-padded) + byte
    lengths, built entirely from the array's offset/data buffers — no
    per-row Python objects.  Byte-level rows: identical to character
    level for ASCII, which is all the matcher contracts (documented on
    ``fuzzy_nearest_match``)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if arr.type == pa.large_string():
        arr = arr.cast(pa.string())
    offs = np.frombuffer(arr.buffers()[1], np.int32, len(arr) + 1, arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    lmax = int(lens.max()) if len(lens) else 0
    idx = offs[:-1, None].astype(np.int64) + np.arange(max(lmax, 1))[None, :]
    valid = idx < offs[1:, None]
    mat = np.where(valid, data[np.minimum(idx, len(data) - 1)], 0).astype(np.uint8)
    return mat, lens


def _levenshtein_to_word(mat: np.ndarray, lens: np.ndarray, word: bytes) -> np.ndarray:
    """Edit distance from every row of the byte matrix to ``word``,
    vectorized over rows: the classic DP iterated over (word char ×
    column) scalar steps with all N candidates advanced per step —
    O(|word|·Lmax) numpy ops regardless of N, which is the axis that
    grows."""
    n, lmax = mat.shape
    m = len(word)
    w = np.frombuffer(word, np.uint8)
    prev = np.tile(np.arange(lmax + 1, dtype=np.int32), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, m + 1):
        cur[:, 0] = i
        sub_base = prev[:, :-1] + (mat != w[i - 1])  # (n, lmax)
        dele = prev[:, 1:] + 1
        for j in range(1, lmax + 1):
            cur[:, j] = np.minimum(
                np.minimum(dele[:, j - 1], cur[:, j - 1] + 1), sub_base[:, j - 1]
            )
        prev, cur = cur, prev
    return prev[np.arange(n), lens].astype(np.int64)


def fuzzy_nearest_match(
    ds: ray.data.Dataset,
    col: str,
    vocab: Sequence[str],
    *,
    key_cols: Sequence[str],
    out_word: str = "match_word",
    out_dist: str = "dist",
) -> ray.data.Dataset:
    """For every row, the vocabulary entry at minimum Levenshtein edit
    distance from ``col`` (ties → lexicographically smallest word) —
    the canonical-form / spell-normalization join.

    Map-ONLY: the vocabulary is tiny and closes over the batch fn (an
    entity-resolution run with a big vocabulary would broadcast it with
    ``ray.put`` and block on vocab buckets instead); each batch runs the
    byte-level DP vectorized across all rows per (word, position) step.
    ASCII contract: distances are byte-level, which equals DuckDB's
    character-level ``levenshtein`` for ASCII data.
    """
    words = sorted(dict.fromkeys(vocab))  # sorted → argmin picks lexicographic min
    wbytes = [w.encode() for w in words]
    warr = pa.array(words, pa.string())

    def f(batch: pa.Table) -> pa.Table:
        mat, lens = _utf8_byte_matrix(batch.column(col))
        dists = np.stack([_levenshtein_to_word(mat, lens, wb) for wb in wbytes])
        best = np.argmin(dists, axis=0)
        out = {k: batch.column(k) for k in key_cols}
        out[out_word] = warr.take(pa.array(best, pa.int64()))
        out[out_dist] = pa.array(dists[best, np.arange(mat.shape[0])], pa.int64())
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def bpe_train(
    docs: ray.data.Dataset,
    *,
    num_merges: int = 50,
    text_col: str = "text",
    min_count: int = 2,
    max_vocab: int = 1 << 18,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016, the
    GPT-2 tokenizer family's core loop): learn ``num_merges`` merges
    from the corpus word-frequency table.

    The distributed part is the part that scales with the corpus: ONE
    vocab-sized exchange (``word_counts``'s map-side value_counts
    partials) bounded by ``_bounded_vocab``.  The merge loop itself
    runs on that BOUNDED word-frequency table on the driver — that is
    the textbook algorithm (BPE trains on type counts, not the token
    stream), so driver work is O(max_vocab · num_merges) regardless of
    corpus size.  Ties break by (count desc, pair lexicographic) for
    determinism.
    """
    vocab = _bounded_vocab(
        word_counts(docs, text_col=text_col),
        value_col="n",
        min_count=min_count,
        max_vocab=max_vocab,
    )
    words = [tuple(w) + ("</w>",) for w in vocab["word"].astype(str)]
    counts = vocab["n"].to_numpy().astype(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in zip(words, counts):
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words = []
        for sym in words:
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    return merges


def bpe_token_counts(
    docs: ray.data.Dataset,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Apply trained BPE merges and count tokens per document: merges
    broadcast ONCE via ``ray.put``; each map task encodes its batch
    with a per-batch unique-word cache (Zipf makes the cache hit rate
    ~word-frequency mass, so the per-word merge loop runs per TYPE,
    not per token).  Map-only — zero exchanges.
    """
    ranks_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    def encode_word(w: str, ranks: dict) -> int:
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return len(sym)

    def f(df):
        import pandas as pd

        ranks = ray.get(ranks_ref)
        cache: dict[str, int] = {}

        def doc_tokens(text: str) -> int:
            total = 0
            for w in text.split():
                n = cache.get(w)
                if n is None:
                    n = encode_word(w, ranks)
                    cache[w] = n
                total += n
            return total

        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_bpe_tokens": df[text_col].map(doc_tokens).astype(np.int64),
            }
        )

    return docs.map_batches(f, batch_format="pandas")


def cdc_chunks(
    docs: ray.data.Dataset,
    *,
    k: int = 8,
    mask_bits: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Content-defined chunking (the Rabin/FastCDC family, the storage
    side of dedup): a chunk boundary falls wherever the k-gram rolling
    hash is ≡ 0 mod 2^mask_bits (expected chunk ≈ 2^mask_bits chars),
    so identical passages chunk identically regardless of their byte
    offset — the property that makes chunk-level dedup survive
    insertions, unlike fixed-size blocks.

    Map-only and fully vectorized: per batch the existing
    ``kgram_hashes`` lane machinery marks boundaries, a cumsum assigns
    every character its chunk, and ``np.add.at`` folds per-chunk
    signatures.  Output per chunk: (doc_id, chunk_idx, start_pos
    [1-based], chunk_len, cpsum) — the (len, codepoint-sum) signature
    is what downstream chunk-level dedup groups on, and is exactly
    SQL-expressible for the oracle.
    """
    from ..functions.text import flat_codepoints, kgram_hashes

    mask = np.uint64((1 << mask_bits) - 1)

    def f(df):
        import pandas as pd

        texts = df[text_col]
        codes, doc_of = flat_codepoints(texts)
        n_chars = len(codes)
        if n_chars == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    "chunk_idx": pd.Series([], dtype=np.int64),
                    "start_pos": pd.Series([], dtype=np.int64),
                    "chunk_len": pd.Series([], dtype=np.int64),
                    "cpsum": pd.Series([], dtype=np.int64),
                }
            )
        lens = texts.fillna("").str.len().to_numpy(np.int64)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        is_b = np.zeros(n_chars, dtype=bool)
        is_b[doc_start[lens > 0]] = True  # every non-empty doc starts a chunk
        h, dix, pos = kgram_hashes(texts, k=k)
        hit = ((h & mask) == 0) & (pos > 0)
        is_b[doc_start[dix[hit]] + pos[hit]] = True
        chunk_of = np.cumsum(is_b) - 1
        starts = np.flatnonzero(is_b)
        n_chunks = len(starts)
        ends = np.concatenate([starts[1:], [n_chars]])
        cpsum = np.zeros(n_chunks, dtype=np.int64)
        np.add.at(cpsum, chunk_of, codes.astype(np.int64))
        cdoc = doc_of[starts]
        start_pos = starts - doc_start[cdoc] + 1  # 1-based, SQL mirror
        first_chunk = np.zeros(n_chunks, dtype=np.int64)
        # chunk_idx within doc: arange minus each doc's first chunk index
        uniq, first = np.unique(cdoc, return_index=True)
        base = np.zeros(n_chunks, dtype=np.int64)
        base[first] = np.arange(n_chunks, dtype=np.int64)[first]
        base = np.maximum.accumulate(base)
        chunk_idx = np.arange(n_chunks, dtype=np.int64) - base
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[cdoc],
                "chunk_idx": chunk_idx,
                "start_pos": start_pos,
                "chunk_len": ends - starts,
                "cpsum": cpsum,
            }
        )

    return docs.map_batches(f, batch_format="pandas")


GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "be", "that", "have", "with")


def gopher_quality_filter(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> ray.data.Dataset:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A1.1)
    as one map-only pass: word-count bounds, mean-word-length bounds,
    symbol-to-word ratio ('#' and '…'), fraction of words containing
    an alphabetic character, and "≥ 2 distinct stopwords present".
    (The line-level bullet/ellipsis rules don't apply to the corpus's
    single-line documents and are omitted.)

    Emits per doc the quantized metrics plus ``keep`` (int64 0/1) so
    downstream curation can either filter or inspect the rule firing.

    Scale contract: no shuffle, no row loop — Arrow
    ``utf8_split_whitespace`` + flat-word kernels segment-reduced back
    to docs via ``np.add.reduceat`` on the list offsets; stopword
    presence is a 10-bit mask OR-reduced per doc.
    """
    stop_list = list(GOPHER_STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column(id_col)
        if n == 0:
            return pa.table(
                {
                    id_col: ids,
                    "n_words": pa.array([], pa.int64()),
                    "mean_word_len_e4": pa.array([], pa.int64()),
                    "symbol_ratio_e4": pa.array([], pa.int64()),
                    "alpha_frac_e4": pa.array([], pa.int64()),
                    "stop_hits": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        text = pc.cast(batch.column(text_col), pa.string())
        words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
        words = pa.chunked_array([words]).combine_chunks()
        if isinstance(words, pa.ChunkedArray):
            words = words.chunk(0)
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = words.flatten()
        starts = offsets[:-1] - offsets[0]
        ends = offsets[1:] - offsets[0]
        n_words = (ends - starts).astype(np.int64)

        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        is_alpha = (
            pc.match_substring_regex(flat, "[A-Za-z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        flat_np = np.asarray(flat.to_pandas(), dtype=object)

        def seg_sum(v: np.ndarray) -> np.ndarray:
            # exact segment sums via prefix sums — zero-length segments
            # (empty docs) fall out as 0 with no reduceat edge cases
            c = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
            return c[ends] - c[starts]

        sum_len = seg_sum(wlen)
        sum_alpha = seg_sum(is_alpha)
        stop_hits = np.zeros(n, dtype=np.int64)
        for w in stop_list:
            stop_hits += (seg_sum((flat_np == w).astype(np.int64)) > 0).astype(np.int64)

        n_hash = pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
        n_ell = pc.count_substring(text, "\u2026").to_numpy(zero_copy_only=False)
        safe_w = np.maximum(n_words, 1).astype(np.float64)

        def e4(v: np.ndarray) -> np.ndarray:
            # repo-wide quantization convention: floor(x*1e4 + 0.5)
            return np.floor(v * 1e4 + 0.5).astype(np.int64)

        mean_len_e4 = e4(sum_len / safe_w)
        sym_ratio_e4 = e4((n_hash + n_ell).astype(np.float64) / safe_w)
        alpha_frac_e4 = e4(sum_alpha / safe_w)

        # compare on the QUANTIZED values so the keep flag is decided on
        # exactly the numbers any external engine (the DuckDB oracle)
        # recomputes — no float-boundary divergence
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_len_e4 >= int(min_mean_word_len * 1e4))
            & (mean_len_e4 <= int(max_mean_word_len * 1e4))
            & (sym_ratio_e4 <= int(max_symbol_ratio * 1e4))
            & (alpha_frac_e4 >= int(min_alpha_word_frac * 1e4))
            & (stop_hits >= min_stopword_hits)
        ).astype(np.int64)

        return pa.table(
            {
                id_col: ids,
                "n_words": pa.array(n_words),
                "mean_word_len_e4": pa.array(mean_len_e4),
                "symbol_ratio_e4": pa.array(sym_ratio_e4),
                "alpha_frac_e4": pa.array(alpha_frac_e4),
                "stop_hits": pa.array(stop_hits),
                "keep": pa.array(keep),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
