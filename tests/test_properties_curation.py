"""Property-based tests for the curation text kernels (no Ray — the
vectorized batch internals vs naive per-document references)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from rastertiler_rs_ray.pipelines.curation import (
    _flat_tokens,
    _ngram_strings,
    _repetition_arrays,
)

words = st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff", "tok"])
docs = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(docs, st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_ngram_strings_match_naive(texts, n):
    flat, pos, lens = _flat_tokens(pd.Series(texts))
    grams, gpos = _ngram_strings(flat, pos, n)
    got = list(zip(gpos.tolist(), grams.tolist()))
    expected = []
    for d, t in enumerate(texts):
        toks = t.split()
        for i in range(len(toks) - n + 1):
            expected.append((d, " ".join(toks[i : i + n])))
    assert got == expected
    assert lens.tolist() == [len(t.split()) for t in texts]


@given(docs)
@settings(max_examples=150, deadline=None)
def test_repetition_arrays_match_naive(texts):
    arrs = _repetition_arrays(pd.Series(texts))
    for d, t in enumerate(texts):
        toks = t.split()
        nt = len(toks)
        assert arrs["n_tokens"][d] == nt
        if nt == 0:
            assert arrs["distinct_frac_e4"][d] == 0
            assert arrs["top_token_frac_e4"][d] == 0
            assert arrs["top_bigram_frac_e4"][d] == 0
            continue
        counts = pd.Series(toks).value_counts()
        assert arrs["distinct_frac_e4"][d] == 10000 * len(counts) // nt
        assert arrs["top_token_frac_e4"][d] == 10000 * counts.max() // nt
        bigrams = [" ".join(toks[i : i + 2]) for i in range(nt - 1)]
        if not bigrams:
            assert arrs["top_bigram_frac_e4"][d] == 0
        else:
            bmax = pd.Series(bigrams).value_counts().max()
            assert arrs["top_bigram_frac_e4"][d] == 10000 * bmax // len(bigrams)


@given(docs)
@settings(max_examples=100, deadline=None)
def test_flat_tokens_positions_cover_every_token(texts):
    flat, pos, lens = _flat_tokens(pd.Series(texts))
    assert len(flat) == len(pos) == lens.sum()
    # tokens of doc d are exactly its split, in order
    for d, t in enumerate(texts):
        assert flat[pos == d].tolist() == t.split()
