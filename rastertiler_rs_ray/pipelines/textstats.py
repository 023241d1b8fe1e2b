"""Text-analysis Dataset stages over a documents table.

Thin Ray Data wrappers around the vectorized kernels in
``functions/text.py`` — each is one ``map_batches`` pass appending
columns (no shuffle, no row loop).  ``TextAnnotator`` is the
actor-pool form holding the compiled regex machinery once per actor
(§2.3 stateful-stage pattern); the plain functions are stateless
task-based stages for cheap kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
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


def unigram_logprob_scores(
    docs: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-doc mean unigram log-probability (LM-perplexity-style quality
    score): pass 1 builds corpus word counts (map-side partials — the
    "training" aggregate), the tiny logprob table broadcasts once via
    ray.put, pass 2 scores each doc vectorized.  The classic two-pass
    broadcast-state shape of model-based quality filtering at 10^12
    docs: the model state is aggregate-sized, never the corpus.
    """
    import math

    import ray as _ray

    counts = word_counts(docs, text_col=text_col).to_pandas()
    total = float(counts["n"].sum())
    table = pd.Series(
        np.log(counts["n"].to_numpy(dtype=np.float64) / total),
        index=counts["word"].astype(str),
    )
    oov = math.log(0.5 / total)  # unseen-word floor (absent when self-scoring)
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
