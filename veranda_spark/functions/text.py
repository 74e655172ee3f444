"""Text-analysis column builders for document pipelines.

Training-data operators over a `documents(doc_id, text, lang, source,
n_chars)` table: token counting, language-ID heuristic, quality scoring,
fingerprinting, shingling and sketch primitives (MinHash/SimHash).

Everything that can be a JVM-side Column expression is one (oracle-
reproducible in ANSI SQL); only the sketches use pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# a compact multi-language stopword table for the n-gram language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "une", "dans", "que"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "por", "una", "para"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (quality-scoring feature)."""
    stripped = F.regexp_replace(text, r"[^\p{Punct}]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_hits(text: Column, lang: str = "en") -> Column:
    """Distinct stopwords of ``lang`` present in the text (set semantics —
    identical in Spark array_intersect and DuckDB list_intersect)."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens(F.lower(text)), words))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    (ties broken by fixed language order en>de>fr>es; 'und' = unknown)."""
    scores = [(lang, stopword_hits(text, lang)) for lang in STOPWORDS]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, score in reversed(list(scores)):
        out = F.when(score == best_score, F.lit(lang)).otherwise(out)
    return F.when(best_score <= 0, F.lit("und")).otherwise(out)


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + low punctuation + stopword
    presence (the classic pretraining-filter trio)."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_hits(text) >= 2, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def normalize_text(text: Column) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip non-alnum,
    squeeze whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (md5 is
    bit-identical across Spark and DuckDB, so dedup is oracle-checkable)."""
    return F.md5(normalize_text(text))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Array of word n-gram strings (shingles) — built-in array ops only:
    slide an index sequence over the token array."""
    toks = tokens(normalize_text(text))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


# ---- sketches (pandas UDFs; no SQL analog — self-consistency tested) -------

MINHASH_PERMS = 64
_MERSENNE = (1 << 61) - 1


def _hash_tokens(arr: list[str]) -> np.ndarray:
    # stable 64-bit FNV-1a per token (pure python, vectorized over doc)
    out = np.empty(len(arr), dtype=np.uint64)
    for i, tok in enumerate(arr):
        h = np.uint64(14695981039346656037)
        for b in tok.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
        out[i] = h
    return out


def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_signature(shingles: pd.Series) -> pd.Series:
    """MinHash signature (64 perms) of a shingle array column."""
    a, b = _perm_params(MINHASH_PERMS)
    out = []
    for sh in shingles:
        if sh is None or len(sh) == 0:
            out.append([0] * MINHASH_PERMS)
            continue
        hv = _hash_tokens(list(sh)) % np.uint64(_MERSENNE)
        # sig_j = min_i (a_j * h_i + b_j mod p)
        m = (np.outer(a, hv) + b[:, None]) % np.uint64(_MERSENNE)
        out.append([int(x) for x in m.min(axis=1).astype(np.int64)])
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def simhash64(shingles: pd.Series) -> pd.Series:
    """64-bit SimHash of a shingle array column."""
    out = np.zeros(len(shingles), dtype=np.int64)
    bits = np.arange(64, dtype=np.uint64)
    for i, sh in enumerate(shingles):
        if sh is None or len(sh) == 0:
            continue
        hv = _hash_tokens(list(sh))
        votes = np.where(((hv[:, None] >> bits) & np.uint64(1)).astype(bool), 1, -1).sum(axis=0)
        val = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                val |= np.uint64(1) << np.uint64(b)
        out[i] = val.astype(np.int64)
    return pd.Series(out)


def hamming64(a: Column, b: Column) -> Column:
    """Bit count of XOR — SimHash distance (bit_count is built-in)."""
    return F.bit_count(a.bitwiseXOR(b))
