"""Vectorized word-shingle key extraction — the shared kernel behind
the cross-source overlap matrix, n-gram novelty scoring and the
Heaps-law vocabulary curve.

The naive form loops Python-side over documents and calls md5 once
per gram — ~1M hash calls at sf0.1 and the textbook hot-path
anti-pattern at 100 TB.  Here the whole batch flattens once, gram
windows come from shifted slices of the flat word array (a window is
valid iff its first and last word share a row), the window strings
concatenate as numpy object-array ops, and gram identity is TWO
independently-keyed 64-bit siphashes (``pd.util.hash_array`` with
fixed 16-byte keys — deterministic across processes, unlike Python's
salted ``hash``).  128 identity bits keep accidental gram collisions
out of reach (~2⁻⁶⁴ per pair even at 10¹² distinct grams); the hashes
are engine-internal only — every DuckDB oracle compares raw gram
strings, so the scheme never has to match SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_K1 = "tjce-shingle-k1!"  # 16 bytes, pinned (cross-process identity)
_K2 = "tjce-shingle-k2!"


def shingle_occurrences(
    texts: pd.Series, n: int = 8, nb: int = 64
) -> pd.DataFrame:
    """Every n-word window of every text, vectorized: returns one row
    per OCCURRENCE with columns ``row`` (position of the text inside
    the input batch), ``k1``/``k2`` (the two int64 identity halves)
    and ``kb`` (``nb``-way digest bucket, ``nb`` a power of two —
    gram-volume exchanges must size it from input bytes via
    ``exchange.buckets_for_bytes``; a gram's every occurrence lands in
    one bucket for ANY nb since kb derives from k1 alone).  Texts
    shorter than n words contribute nothing.  Callers aggregate:
    distinct-per-doc, counts per (gram, attribute), etc."""
    toks = texts.str.split(" ")
    lens = toks.str.len().to_numpy(np.int64)
    total = int(lens.sum())
    empty = pd.DataFrame({
        "row": pd.Series([], dtype="int64"),
        "k1": pd.Series([], dtype="int64"),
        "k2": pd.Series([], dtype="int64"),
        "kb": pd.Series([], dtype="int64"),
    })
    if total < n:
        return empty
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    row = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    # a window starting at i is valid iff word i+n-1 exists and lives
    # in the same row — one vectorized compare over the shifted rows
    ok = row[: total - n + 1] == row[n - 1:]
    starts = np.flatnonzero(ok)
    if not len(starts):
        return empty
    gram = flat[starts].copy()
    for k in range(1, n):
        gram = gram + " "
        gram = gram + flat[starts + k]
    k1 = pd.util.hash_array(gram, hash_key=_K1, categorize=False) \
        .view(np.int64)
    k2 = pd.util.hash_array(gram, hash_key=_K2, categorize=False) \
        .view(np.int64)
    return pd.DataFrame({
        "row": row[starts],
        "k1": k1,
        "k2": k2,
        "kb": k1 & np.int64(nb - 1),
    })
