"""Vectorized text-analysis kernels for the training-data pipeline ops.

All functions take a pandas Series / numpy array of strings and return
numpy arrays — they run inside ``map_batches`` on whole columns at once
(pandas C string ops + numpy), never a Python loop over rows in the hot
path.  Stages that need compiled state (regexes, n-gram tables) are
actor classes in ``pipelines/textstats.py`` holding it in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# BPE-ish word/number/punct splitter (GPT-2 style, ASCII simplification)
TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_WS_RE = re.compile(r"\s+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been on for with as at by it "
    "this that from not have has had but they you we he she i".split()
)

# tiny per-language stopword/character profiles for the n-gram heuristic
LANG_PROFILES = {
    "en": frozenset("the and of to in is that it for was with he as on are".split()),
    "de": frozenset("der die und das ist nicht ein zu den von mit sich auf für".split()),
    "fr": frozenset("le la les de et des un une est que pour dans qui pas sur".split()),
    "es": frozenset("el la los las de y que en un una es no por con para se".split()),
    "it": frozenset("il la di e che un una per non sono con del le si più".split()),
}


def whitespace_token_count(texts: pd.Series) -> np.ndarray:
    """Tokens = maximal non-whitespace runs.  Empty/blank → 0."""
    s = texts.fillna("").str.strip()
    n = s.str.count(r"\S+").to_numpy()
    return n.astype(np.int64)


def bpe_ish_token_count(texts: pd.Series) -> np.ndarray:
    """Count of TOKEN_RE matches (letter runs / digit runs / single punct)."""
    return texts.fillna("").str.count(TOKEN_RE).to_numpy().astype(np.int64)


def char_class_ratios(texts: pd.Series):
    """(alpha_ratio, digit_ratio, punct_ratio, space_ratio) per doc, in [0,1].

    Ratios over total length; empty string → 0 for all.
    """
    s = texts.fillna("")
    total = s.str.len().to_numpy().astype(np.float64)
    safe = np.maximum(total, 1.0)
    alpha = s.str.count(r"[A-Za-z]").to_numpy() / safe
    digit = s.str.count(r"[0-9]").to_numpy() / safe
    punct = s.str.count(r"[^\w\s]").to_numpy() / safe
    space = s.str.count(r"\s").to_numpy() / safe
    return alpha, digit, punct, space


def stopword_ratio(texts: pd.Series, stopwords: frozenset[str] = STOPWORDS) -> np.ndarray:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    pattern = r"(?i)\b(?:" + "|".join(sorted(stopwords)) + r")\b"
    s = texts.fillna("")
    hits = s.str.count(pattern).to_numpy().astype(np.float64)
    toks = np.maximum(whitespace_token_count(texts).astype(np.float64), 1.0)
    return hits / toks


def quality_score(texts: pd.Series) -> np.ndarray:
    """Heuristic document quality ∈ [0,1]: length band + alpha ratio +
    stopword presence − punctuation excess.  Deterministic, vectorized."""
    n = texts.fillna("").str.len().to_numpy().astype(np.float64)
    alpha, _digit, punct, _space = char_class_ratios(texts)
    sw = stopword_ratio(texts)
    length_term = np.clip(n / 200.0, 0.0, 1.0)  # saturates at 200 chars
    score = 0.35 * length_term + 0.35 * alpha + 0.2 * np.clip(sw * 3, 0, 1) + 0.1 * (
        1.0 - np.clip(punct * 4, 0, 1)
    )
    return np.clip(score, 0.0, 1.0)


def language_id(texts: pd.Series) -> np.ndarray:
    """Stopword-profile language guess over LANG_PROFILES; 'und' if no hits.

    One vectorized regex count per language (5 passes total), argmax.
    """
    s = texts.fillna("").str.lower()
    scores = np.zeros((len(LANG_PROFILES), len(s)), dtype=np.float64)
    langs = list(LANG_PROFILES)
    for i, lang in enumerate(langs):
        pattern = r"\b(?:" + "|".join(sorted(LANG_PROFILES[lang])) + r")\b"
        scores[i] = s.str.count(pattern).to_numpy()
    best = np.argmax(scores, axis=0)
    hit = scores.max(axis=0) > 0
    out = np.array(langs, dtype=object)[best]
    out[~hit] = "und"
    return out


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


def fnv1a_bytes(data: bytes) -> int:
    """FNV-1a 64-bit over bytes (pure python, small inputs / tests)."""
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def doc_fingerprint(texts: pd.Series) -> np.ndarray:
    """64-bit rolling-hash fingerprint per document (FNV-1a over UTF-8).

    Vectorized via a single encoded buffer + per-doc offsets: the FNV
    recurrence is inherently serial per doc, but docs are processed with
    numpy over a padded 2-D byte matrix (chunked to bound memory).
    """
    s = texts.fillna("")
    encoded = s.str.encode("utf-8")
    lens = encoded.str.len().to_numpy()
    n = len(s)
    out = np.full(n, int(_FP_OFF), dtype=np.uint64)
    if n == 0:
        return out
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return out
    # padded byte matrix; pad value 0 is skipped by masking
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    flat = np.frombuffer(b"".join(encoded.tolist()), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    cols = np.arange(maxlen)
    mask = cols[None, :] < lens[:, None]
    idx = starts[:, None] + cols[None, :]
    buf[mask] = flat[np.minimum(idx, len(flat) - 1)[mask]]
    # serial over columns (≤ maxlen iterations), vectorized over docs
    with np.errstate(over="ignore"):
        for c in range(maxlen):
            live = mask[:, c]
            out[live] = (out[live] ^ buf[live, c].astype(np.uint64)) * _FP_BASE
    return out


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of FNV-hashed k-char shingles of a lowercased document."""
    t = _WS_RE.sub(" ", text.lower()).strip()
    if len(t) < k:
        return {fnv1a_bytes(t.encode())} if t else set()
    b = t.encode()
    # vectorized shingle hashing: polynomial rolling hash over a strided view
    arr = np.frombuffer(b, dtype=np.uint8)
    if len(arr) < k:
        return {fnv1a_bytes(b)}
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    h = np.full(len(windows), int(_FP_OFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in range(k):
            h = (h ^ windows[:, c].astype(np.uint64)) * _FP_BASE
    return set(h.tolist())


def word_ngrams(text: str, n: int = 3) -> set[int]:
    """Set of hashed word n-grams (for Jaccard dedup)."""
    words = _WS_RE.split(text.lower().strip())
    words = [w for w in words if w]
    if len(words) < n:
        return {fnv1a_bytes(" ".join(words).encode())} if words else set()
    return {fnv1a_bytes(" ".join(words[i : i + n]).encode()) for i in range(len(words) - n + 1)}


# ---------------------------------------------------------------------------
# packed character n-grams — shared kernel for the trained language-ID
# classifier and the winnowing fingerprinter.  A batch's texts are encoded
# ONCE to a flat uint32 codepoint array (utf-32-le: one lane per codepoint,
# exactly Python's str indexing semantics, so positions line up with SQL
# substr()); n-grams are sliding windows over that flat array with windows
# crossing a document boundary masked out.  No Python loop over rows.
# ---------------------------------------------------------------------------


def flat_codepoints(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(codes, doc_of): flat uint32 codepoints of all texts concatenated,
    and the document index owning each lane."""
    s = texts.fillna("")
    joined = "".join(s.tolist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = s.str.len().to_numpy(dtype=np.int64)
    doc_of = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    return codes, doc_of


def packed_char_ngrams(
    texts: pd.Series, n: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(grams, doc_idx, pos): every within-document character ``n``-gram,
    packed into one uint64 (21 bits per codepoint — covers all of Unicode;
    n ≤ 3), the batch-local row index of its document, and its 0-based
    character start position.  Bijective with the substring, and packed
    FIRST-codepoint-high so uint64 numeric order equals codepoint-
    lexicographic string order (= DuckDB's binary UTF-8 collation) — the
    SQL oracle's deterministic tie-breaks then agree with the engine's.
    """
    assert 1 <= n <= 3, "packing budget is 3 codepoints x 21 bits"
    codes, doc_of = flat_codepoints(texts)
    if len(codes) < n:
        e = np.empty(0, dtype=np.uint64)
        i = np.empty(0, dtype=np.int64)
        return e, i, i.copy()
    win = np.lib.stride_tricks.sliding_window_view(codes, n)
    grams = np.zeros(len(win), dtype=np.uint64)
    for j in range(n):
        grams = grams | (win[:, j].astype(np.uint64) << np.uint64(21 * (n - 1 - j)))
    valid = doc_of[: len(grams)] == doc_of[n - 1 :]
    doc_idx = doc_of[: len(grams)][valid]
    starts = np.concatenate([[0], np.cumsum(np.bincount(doc_of, minlength=int(doc_of[-1]) + 1 if len(doc_of) else 0))[:-1]]) if len(doc_of) else np.empty(0, np.int64)
    gpos = np.arange(len(grams), dtype=np.int64)[valid]
    pos = gpos - starts[doc_idx]
    return grams[valid], doc_idx, pos


# polynomial k-gram hash parameters shared with the SQL oracle: each term
# is (codepoint * B^j mod 2^32), summed, mod 2^32 — every intermediate fits
# a BIGINT exactly, so DuckDB reproduces the engine bit-for-bit.
KGRAM_HASH_BASE = 1000003
KGRAM_HASH_MOD = 1 << 32


def kgram_hash_powers(k: int) -> np.ndarray:
    """B^j mod 2^32 for j = 0..k-1 (uint64)."""
    out = np.empty(k, dtype=np.uint64)
    p = 1
    for j in range(k):
        out[j] = p
        p = (p * KGRAM_HASH_BASE) % KGRAM_HASH_MOD
    return out


def kgram_hashes(
    texts: pd.Series, k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hashes, doc_idx, pos): polynomial hash of every within-document
    character ``k``-gram: sum_j (code[p+j] * B^j mod 2^32) mod 2^32.

    Exact-integer throughout (codepoint < 2^21, power < 2^32 → each
    product < 2^53; the k-term sum of mod-reduced terms < k*2^32), so the
    same arithmetic is expressible in SQL BIGINTs for the oracle.
    """
    codes, doc_of = flat_codepoints(texts)
    if len(codes) < k:
        e = np.empty(0, dtype=np.uint64)
        i = np.empty(0, dtype=np.int64)
        return e, i, i.copy()
    win = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint64)
    powers = kgram_hash_powers(k)
    mod = np.uint64(KGRAM_HASH_MOD - 1)  # 2^32-1 bitmask == % 2^32
    terms = (win * powers[None, :]) & mod
    h = terms.sum(axis=1) & mod
    valid = doc_of[: len(h)] == doc_of[k - 1 :]
    doc_idx = doc_of[: len(h)][valid]
    starts = np.concatenate([[0], np.cumsum(np.bincount(doc_of, minlength=int(doc_of[-1]) + 1 if len(doc_of) else 0))[:-1]]) if len(doc_of) else np.empty(0, np.int64)
    gpos = np.arange(len(h), dtype=np.int64)[valid]
    pos = gpos - starts[doc_idx]
    return h[valid], doc_idx, pos
