"""Deduplication operators over the ``documents`` / ``embeddings``
tables — exact, n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup.

Reference analog: the crawl's exact seen-set dedup (D1,
schemas/entity_mapping_crawler.py:219-223) generalized to the
training-data near-dup family.

Scale design (100 TB):
- exact dedup = hash key per batch → ``groupby(key)`` keeping the min
  id; the shuffle carries only (key, id) pairs, never the text.
- MinHash signatures are computed batch-local (numpy, vectorized over
  perms); the LSH band explosion is a ``flat_map`` and candidate
  generation is a per-band-bucket ``groupby`` — the only all-to-all
  moves (band_key, doc_id) pairs, ~b×8 bytes/doc.
- verification (exact Jaccard on candidates) broadcasts the shingle
  sets via ``ray.put`` at test scale; at 100 TB it becomes a
  hash-partition join of candidate ids back to shingles, bounded by
  the candidate count (≪ n²).
- the all-pairs ``dedup_ngram_jaccard`` query is the verification
  kernel demonstrated on a full small table for the DuckDB oracle —
  at scale it only ever runs on LSH candidates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from crawler_tjce_ray.pipelines.relational import _nb_rows
from crawler_tjce_ray.pipelines.textops import normalize_text_series

# ---------------------------------------------------------------------------
# shared shingle / hashing helpers (vectorized)
# ---------------------------------------------------------------------------

NGRAM = 3
_M61 = (1 << 61) - 1  # Mersenne prime modulus for the MinHash perms


def ngram_set(tokens: list[str], n: int = NGRAM) -> set[str]:
    """Word n-gram shingles; for docs shorter than n, one padded gram —
    mirrors the oracle's coalesce('') padding exactly."""
    if len(tokens) <= n - 1:
        padded = tokens + [""] * (n - len(tokens))
        return {" ".join(padded)}
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def gram_hashes(grams: set[str]) -> np.ndarray:
    """Stable 64-bit hashes of shingles (first 8 bytes of md5 —
    deterministic across processes, unlike Python's ``hash``)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )


def _read_docs(sf_dir: str, columns):
    from crawler_tjce_ray.pipelines.textops import _read_docs as rd_docs

    return rd_docs(sf_dir, columns)


# ---------------------------------------------------------------------------
# exact dedup: hash-partition by content key, keep min doc_id
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact dedup: md5 of normalized text, keep min doc_id per key.

    Combiner recipe (SURVEY §2.7): each batch pre-reduces to its own
    (dkey, min id) pairs — the text never leaves the map stage, only
    16-byte keys + ids — and the final min-merge runs over the already
    per-batch-deduped pairs.  At 10^10 keys the final merge is a
    hash-partition ``groupby`` writing partitioned output; here the
    result is driver-sized by definition (the driver compares it)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        norm = normalize_text_series(df["text"])
        part = pd.DataFrame({
            "dkey": [hashlib.md5(x.encode()).hexdigest() for x in norm],
            "doc_id": df["doc_id"].astype("int64"),
        })
        return part.groupby("dkey", as_index=False)["doc_id"].min()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("dkey", as_index=False)["doc_id"].min()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("dkey").reset_index(drop=True)


SQL_DEDUP_EXACT = r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS dkey,
       MIN(doc_id) AS doc_id
FROM documents GROUP BY dkey ORDER BY dkey
"""


def q_dup_rate_by_source(sf_dir: str):
    """Dedup diagnostics for mixture design: per source, how many docs
    have an exact duplicate ANYWHERE in the corpus (same normalized-
    text key, cross-source included) and the resulting dup rate.

    One digest-bucket shuffle carrying (16-byte md5 as two int64
    columns, source) per doc — a bucket holds every row of a key, so
    the global count ≥ 2 test is exact in-bucket and only additive
    per-(bucket, source) counters come back; per-source totals reduce
    from a column-pruned read of ``source`` alone.  Text never
    shuffles."""
    nb = _nb_rows(sf_dir, 'documents')  # row-carrying exchange
    ds = _read_docs(sf_dir, ["text", "source"])

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        norm = normalize_text_series(df["text"])
        digs = np.frombuffer(
            b"".join(hashlib.md5(x.encode()).digest() for x in norm),
            dtype=np.uint64,
        ).reshape(-1, 2) if len(norm) else np.empty((0, 2), np.uint64)
        out = pd.DataFrame({
            "k1": digs[:, 0].view(np.int64),
            "k2": digs[:, 1].view(np.int64),
            "source": df["source"].astype(object),
        })
        out["kb"] = out["k1"].to_numpy(np.int64) & np.int64(nb - 1)
        return out

    def dup_counts(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby(["k1", "k2"])["k1"].transform("size")
        dup = g.loc[n.to_numpy() >= 2]
        if dup.empty:  # typed empty — Ray drops columns of bare empties
            return pd.DataFrame({
                "source": pd.Series([], dtype="string"),
                "n_dup": pd.Series([], dtype="int64"),
            })
        out = dup.groupby("source", as_index=False).agg(
            n_dup=("source", "size")
        )
        out["source"] = out["source"].astype("string")
        out["n_dup"] = out["n_dup"].astype("int64")
        return out

    keys = ds.map_batches(key_rows, batch_format="pandas")
    dup_parts = (
        keys.groupby("kb")
        .map_groups(dup_counts, batch_format="pandas")
        .to_pandas()
    )
    if "source" not in dup_parts.columns:  # a dup-free corpus yields
        # all-empty blocks and Ray's to_pandas drops their schema
        dup_parts = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_dup": pd.Series([], dtype="int64"),
        })
    dup = dup_parts.groupby("source", as_index=False)["n_dup"].sum()
    totals = (
        _read_docs(sf_dir, ["source"])  # pruned: the text column never
        # leaves storage for the totals pass
        .map_batches(
            lambda df: df.groupby("source", as_index=False)
            .agg(n_docs=("source", "size")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source", as_index=False)["n_docs"].sum()
    )
    out = totals.merge(dup, on="source", how="left")
    out["n_dup_docs"] = out["n_dup"].fillna(0).astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["dup_rate"] = out["n_dup_docs"].to_numpy(np.float64) \
        / out["n_docs"].to_numpy(np.float64)
    out = out[["source", "n_docs", "n_dup_docs", "dup_rate"]]
    return out.sort_values("source").reset_index(drop=True)


SQL_DUP_RATE_BY_SOURCE = r"""
WITH k AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS dkey
  FROM documents
), c AS (SELECT dkey, COUNT(*) AS n FROM k GROUP BY dkey)
SELECT k.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (c.n >= 2) AS BIGINT) AS n_dup_docs,
       CAST(COUNT(*) FILTER (c.n >= 2) AS DOUBLE) / COUNT(*) AS dup_rate
FROM k JOIN c USING (dkey) GROUP BY k.source ORDER BY k.source
"""


_XS_GRAM = 8  # words per shingle (cross-source overlap matrix)


def q_cross_source_dup_matrix(sf_dir: str):
    """WHO copies from WHOM: for every unordered source pair, the
    number of distinct word-8-gram shingles occurring in BOTH sources
    (diagonal: shingles occurring ≥2 times within the one source) —
    the mixture-design follow-up to ``dup_rate_by_source``, which only
    says how much each source duplicates, not against which peers.
    Shingle-level because this corpus has no whole-document exact
    dups; 8-grams are the usual contamination unit (Lee et al. use
    50-token windows at web scale; the constant is a dial).

    Same digest-bucket shuffle family as ``dup_rate_by_source`` (every
    occurrence of a shingle key lands in one bucket, so pair
    membership is decided exactly in-bucket): batches emit per-(key,
    source) partial COUNTS — not positions, so the shuffle volume is
    #distinct-(gram, source)-per-batch, text never rides — then each
    bucket sums counts and self-merges on the 128-bit key; the merge
    fan-out is bounded by #sources-per-key (≤ #sources), not corpus
    size.  The driver folds O(buckets × sources²) additive rows."""
    nb = _nb_rows(sf_dir, 'documents')  # row-carrying exchange
    ds = _read_docs(sf_dir, ["text", "source"])

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial counts per (gram-key, source) — grams and
        # their 128-bit identities come from the shared vectorized
        # kernel (functions/shingles.py), no per-gram Python hashing
        from crawler_tjce_ray.functions.shingles import shingle_occurrences

        occ = shingle_occurrences(df["text"], _XS_GRAM)
        if occ.empty:  # typed empty — Ray drops columns of bare empties
            return pd.DataFrame({
                "k1": pd.Series([], dtype="int64"),
                "k2": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype=object),
                "c": pd.Series([], dtype="int64"),
                "kb": pd.Series([], dtype="int64"),
            })
        occ["source"] = df["source"].to_numpy(object)[occ["row"].to_numpy()]
        out = occ.groupby(["k1", "k2", "source"], as_index=False).size() \
            .rename(columns={"size": "c"})
        out["c"] = out["c"].astype("int64")
        out["kb"] = out["k1"].to_numpy(np.int64) & np.int64(nb - 1)
        return out

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        ks = g.groupby(["k1", "k2", "source"], as_index=False).agg(
            c=("c", "sum"))
        m = ks.merge(ks, on=["k1", "k2"], suffixes=("_a", "_b"))
        keep = (m["source_a"] < m["source_b"]) | (
            (m["source_a"] == m["source_b"]) & (m["c_a"] >= 2))
        p = m.loc[keep]
        if p.empty:  # typed empty — Ray drops columns of bare empties
            return pd.DataFrame({
                "source_a": pd.Series([], dtype="string"),
                "source_b": pd.Series([], dtype="string"),
                "n_keys": pd.Series([], dtype="int64"),
            })
        out = p.groupby(["source_a", "source_b"], as_index=False).agg(
            n_keys=("k1", "size"))
        out["source_a"] = out["source_a"].astype("string")
        out["source_b"] = out["source_b"].astype("string")
        out["n_keys"] = out["n_keys"].astype("int64")
        return out

    parts = (
        ds.map_batches(key_rows, batch_format="pandas")
        .groupby("kb")
        .map_groups(pair_counts, batch_format="pandas")
        .to_pandas()
    )
    if "source_a" not in parts.columns:
        parts = pd.DataFrame({
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_keys": pd.Series([], dtype="int64"),
        })
    out = parts.groupby(["source_a", "source_b"], as_index=False)[
        "n_keys"].sum()
    out["n_keys"] = out["n_keys"].astype("int64")
    # object dtype like the DuckDB oracle frame (driver hash is
    # dtype-sensitive; pandas StringDtype would diverge)
    out["source_a"] = out["source_a"].astype(object)
    out["source_b"] = out["source_b"].astype(object)
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


SQL_CROSS_SOURCE_DUP_MATRIX = """
WITH w AS (
  SELECT source, string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT source, array_to_string(ws[i:i+7], ' ') AS gram
  FROM (SELECT source, ws, unnest(range(1, greatest(len(ws) - 6, 1))) AS i
        FROM w)
), ks AS (
  SELECT gram, source, COUNT(*) AS c FROM g GROUP BY gram, source
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM ks a JOIN ks b ON a.gram = b.gram
WHERE a.source < b.source OR (a.source = b.source AND a.c >= 2)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# all-pairs n-gram Jaccard (the verification kernel, oracle-checked)
# ---------------------------------------------------------------------------

JACCARD_TAU = 0.5

# q_dedup_ngram_jaccard materializes the documents table driver-side
# to build its broadcast shingle index and is O(n²) by design (it is
# the LSH pipeline's *verifier*, exercised exhaustively only at oracle
# scale).  Refuse to run it as a standalone query past this many docs
# — the scale path is q_dedup_minhash_lsh.
NGRAM_JACCARD_MAX_DOCS = 50_000


def _jaccard_pairs_against(
    batch_ids: np.ndarray, all_ids: np.ndarray, sizes: np.ndarray,
    gid: np.ndarray, gkey: np.ndarray, tau: float,
) -> pd.DataFrame:
    """Pairs (a, b) with a in ``batch_ids``, a < b, exact hashed-gram
    Jaccard ≥ τ — fully vectorized: one gram-key self-merge counts
    every shared gram (pairs sharing none never materialize), sizes
    resolve by searchsorted.  Emitting only a-in-batch ∧ a < b makes
    each global pair come out of exactly ONE batch (the one holding
    the smaller id).  Replaces the per-pair Python set-intersection
    loop (the r4 bench's hottest driver kernel: 4.5M set ops at
    sf0.1)."""
    keep = np.isin(gid, batch_ids)
    left = pd.DataFrame({"a": gid[keep], "g": gkey[keep]})
    right = pd.DataFrame({"b": gid, "g": gkey})
    m = left.merge(right, on="g")
    m = m.loc[m["a"].to_numpy() < m["b"].to_numpy()]
    if m.empty:
        return _pairs_empty()
    cnt = m.groupby(["a", "b"], as_index=False).size()
    sa = sizes[np.searchsorted(all_ids, cnt["a"].to_numpy(np.int64))]
    sb = sizes[np.searchsorted(all_ids, cnt["b"].to_numpy(np.int64))]
    inter = cnt["size"].to_numpy(np.int64)
    jac = inter / (sa + sb - inter)
    out = pd.DataFrame({
        "doc_a": cnt["a"].to_numpy(np.int64),
        "doc_b": cnt["b"].to_numpy(np.int64),
        "jaccard": jac,
    })
    return out.loc[out["jaccard"] >= tau]


def q_dedup_ngram_jaccard(sf_dir: str):
    """All-pairs word-3-gram Jaccard ≥ τ.  Each batch compares its docs
    against a ``ray.put``-broadcast shingle index (one object-store copy
    per node, read zero-copy by every task — never re-shipped per
    batch).  O(n²) by construction: this is the *verifier* the LSH
    pipeline calls on candidates only; the oracle checks it exhaustively
    at small n.  Jaccard is an exact int division → bit-identical to
    DuckDB."""
    import ray

    # cheap guard probe: count a doc_id-only projection (parquet
    # metadata / one thin column) instead of a full-table pass
    n_docs = _read_docs(sf_dir, ["doc_id"]).count()
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    if n_docs > NGRAM_JACCARD_MAX_DOCS:
        raise ValueError(
            f"q_dedup_ngram_jaccard is the O(n²) small-n verifier and "
            f"refuses {n_docs} docs (limit {NGRAM_JACCARD_MAX_DOCS}); "
            f"use q_dedup_minhash_lsh, which calls this kernel on LSH "
            f"candidates only"
        )
    # small-side index: ids + distinct gram-hash rows, broadcast once.
    # Tokens split on a LITERAL space — identical to the oracle's
    # string_split(text,' ') even on irregular whitespace; hashed
    # grams equal textual grams absent 64-bit collisions (the same
    # equivalence the LSH verify tiers rely on, pinned by tests).
    idx_df = docs.to_pandas().sort_values("doc_id")
    all_ids = idx_df["doc_id"].to_numpy(np.int64)
    ghs = batch_gram_hashes(idx_df["text"].tolist(), sep=" ")
    sizes = np.fromiter((len(g) for g in ghs), np.int64, count=len(ghs))
    gid = np.repeat(all_ids, sizes)
    gkey = (np.concatenate(ghs).view(np.int64)
            if len(ghs) else np.empty(0, np.int64))
    ref = ray.put((all_ids, sizes, gid, gkey))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_b, sizes_b, gid_b, gkey_b = ray.get(ref)
        return _jaccard_pairs_against(
            df["doc_id"].to_numpy(np.int64), ids_b, sizes_b,
            gid_b, gkey_b, JACCARD_TAU,
        )

    out = docs.select_columns(["doc_id"]).map_batches(
        pairs, batch_format="pandas"
    ).to_pandas()
    if "doc_a" not in out.columns:
        # every batch emitted zero pairs: Ray's to_pandas falls back to
        # the upstream schema, losing the mapped columns
        return _pairs_empty()
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


SQL_DEDUP_NGRAM_JACCARD = """
WITH toks AS (
  SELECT doc_id, string_split(text,' ') AS ws FROM documents
), grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(1, length(ws)-2)),
             i -> ws[i] || ' ' || coalesce(ws[i+1],'') || ' ' ||
                  coalesce(ws[i+2],''))) AS gs
  FROM toks)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(length(list_intersect(a.gs,b.gs)) AS DOUBLE) /
       (length(a.gs)+length(b.gs)-length(list_intersect(a.gs,b.gs)))
         AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(length(list_intersect(a.gs,b.gs)) AS DOUBLE) /
      (length(a.gs)+length(b.gs)-length(list_intersect(a.gs,b.gs))) >= 0.5
ORDER BY doc_a, doc_b
"""

# the MinHash+LSH output contract: the exact all-pairs self-join at
# τ = 0.8 (same gram construction; LSH recall at this τ is 1 up to a
# ~5e-8/pair band-miss probability, deterministic per fixed seed)
SQL_DEDUP_MINHASH_LSH = """
WITH toks AS (
  SELECT doc_id, string_split(text,' ') AS ws FROM documents
), grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(1, length(ws)-2)),
             i -> ws[i] || ' ' || coalesce(ws[i+1],'') || ' ' ||
                  coalesce(ws[i+2],''))) AS gs
  FROM toks)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(length(list_intersect(a.gs,b.gs)) AS DOUBLE) /
       (length(a.gs)+length(b.gs)-length(list_intersect(a.gs,b.gs)))
         AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(length(list_intersect(a.gs,b.gs)) AS DOUBLE) /
      (length(a.gs)+length(b.gs)-length(list_intersect(a.gs,b.gs))) >= 0.8
ORDER BY doc_a, doc_b
"""

# The exact τ=0.8 oracle above relies on LSH recall being exactly 1.
# That holds deterministically on the PINNED fixed-seed corpora (the
# /root/testdata sf dirs — verified externally at sf0.01 in round 4),
# but an arbitrary new corpus can legitimately miss a qualifying pair
# (~5e-8/pair band-miss probability), failing a raw-equality gate
# despite correct code.  Harnesses comparing on a NON-pinned corpus
# must fall back to the recall-bounded check: engine pairs ⊆ oracle
# pairs (LSH never emits false positives — every candidate is
# exact-verified) and recall ≥ MINHASH_MIN_RECALL.
# tests/test_oracle_parity.py consumes these markers.
RECALL_BOUNDED_ORACLES = frozenset({"dedup_minhash_lsh"})
MINHASH_PINNED_SF_DIRS = frozenset({
    "/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
})
MINHASH_MIN_RECALL = 0.999


def minhash_oracle_is_exact(sf_dir: str) -> bool:
    """True when raw equality against SQL_DEDUP_MINHASH_LSH is the
    right gate (pinned fixed-seed corpus); False → use the
    recall-bounded subset check instead."""
    import os

    return os.path.normpath(os.path.abspath(sf_dir)) in MINHASH_PINNED_SF_DIRS


# ---------------------------------------------------------------------------
# MinHash + LSH (shingle → minhash → band → bucket groupby → verify)
# ---------------------------------------------------------------------------

N_PERM = 128
LSH_BANDS = 32  # r = 4 rows/band → s-curve threshold ≈ 0.42
MINHASH_TAU = 0.8
_M31 = np.uint64((1 << 31) - 1)  # Mersenne 2^31-1: a·x + b < 2^63, no overflow

_rng = np.random.RandomState(0xC0FFEE)
_PERM_A = _rng.randint(1, 1 << 31, size=N_PERM).astype(np.uint64)
_PERM_B = _rng.randint(0, 1 << 31, size=N_PERM).astype(np.uint64)


def minhash_signature(gh: np.ndarray) -> np.ndarray:
    """(a·x + b) mod 2³¹-1 over all perms at once — one
    (|grams| × 128) vectorized uint64 pass, no Python loop.  Shingle
    hashes are reduced to 31 bits so the modmul never overflows."""
    if len(gh) == 0:
        return np.full(N_PERM, int(_M31), dtype=np.uint64)
    x = (gh >> np.uint64(33)) & _M31
    vals = (x[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) % _M31
    return vals.min(axis=0)


def batch_minhash_signatures(gram_lists: list[np.ndarray]) -> np.ndarray:
    """(n_docs × N_PERM) signature matrix for a whole batch in ONE
    segment-reduced pass: the per-doc gram arrays concatenate once,
    the perm transform runs on the flat array in perm-blocks (bounding
    scratch to |grams|×32×8 B), and ``np.minimum.reduceat`` collapses
    each doc's segment — no per-doc Python dispatch (identical values
    to per-doc ``minhash_signature``; pinned by tests).  Empty docs
    keep the all-sentinel signature."""
    n = len(gram_lists)
    sigs = np.full((n, N_PERM), int(_M31), dtype=np.uint64)
    if n == 0:
        return sigs
    lens = np.fromiter((len(g) for g in gram_lists), np.int64, count=n)
    nz = np.nonzero(lens)[0]
    if len(nz) == 0:
        return sigs
    flat = np.concatenate([gram_lists[i] for i in nz])
    x = (flat >> np.uint64(33)) & _M31
    starts = np.zeros(len(nz), np.int64)
    starts[1:] = np.cumsum(lens[nz])[:-1]
    blk = 32
    for p0 in range(0, N_PERM, blk):
        vals = (x[:, None] * _PERM_A[None, p0:p0 + blk]
                + _PERM_B[None, p0:p0 + blk]) % _M31
        sigs[nz[:, None], np.arange(p0, p0 + blk)[None, :]] = \
            np.minimum.reduceat(vals, starts, axis=0)
    return sigs


_GRAM_P = np.uint64(1099511628211)
# P² mod 2^64 precomputed in exact int arithmetic: computing it as
# _GRAM_P * _GRAM_P at call time raised a RuntimeWarning per batch
# (the wraparound itself is intentional — it IS the rolling hash)
_GRAM_P2 = np.uint64((int(_GRAM_P) ** 2) % (1 << 64))

# siphash of the empty token — the pad value for docs shorter than
# NGRAM, mirroring the oracle's coalesce(ws[i+k],'') padding (so
# string_split('',' ') == [''] and [' '] == ['',''] both reduce to
# the padded gram of three empty tokens, exactly like ngram_set)
_EMPTY_TOKEN_HASH = int(pd.util.hash_array(np.array([""], dtype=object))[0])


def _tokens_arrow(texts, sep: str | None) -> tuple[np.ndarray, np.ndarray]:
    """(lens, flat object tokens) for an Arrow string array — the
    zero-copy sibling of the Python ``t.split(sep)`` loop.  Literal
    ``sep`` maps 1:1 onto ``pc.split_pattern``; ``sep=None`` maps onto
    ``utf8_split_whitespace`` minus the leading/trailing empty tokens
    Arrow keeps but ``str.split()`` drops (interior runs already
    collapse identically, incl. unicode whitespace; equality pinned in
    tests/test_dedup_similarity.py)."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    parts = (pc.split_pattern(arr, sep) if sep is not None
             else pc.utf8_split_whitespace(arr))
    lens = pc.list_value_length(parts).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(parts).to_pandas().to_numpy(dtype=object)
    if sep is None and len(flat):
        empty = np.array([t == "" for t in flat], dtype=bool)
        if empty.any():
            doc_of = np.repeat(np.arange(len(lens)), lens)
            lens = lens - np.bincount(
                doc_of[empty], minlength=len(lens)).astype(np.int64)
            flat = flat[~empty]
    return lens, flat


def batch_gram_hashes(texts, sep: str | None = None) -> list[np.ndarray]:
    """Vectorized 3-gram hashes for a whole batch of documents.

    One ``pd.util.hash_array`` call (C siphash, process-stable) hashes
    every token of the batch at once; per-doc 3-gram hashes are a
    rolling polynomial combine of the token-hash array — no per-gram
    Python hashing (the md5-per-shingle loop was the minhash hot
    spot).  ``sep=" "`` splits on a LITERAL space — the oracle's
    ``string_split(text,' ')`` semantics — while the default ``None``
    collapses whitespace runs (simhash keeps the default).

    ``texts`` may be a pyarrow (Chunked)Array — the zero-copy fast
    path for ``batch_format="pyarrow"`` stages: tokenization runs as
    one Arrow split kernel instead of a Python ``t.split()`` loop over
    materialized strs (the r4 ``tokens_flat`` discipline)."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        lens, flat = _tokens_arrow(texts, sep)
    else:
        token_lists = [t.split(sep) for t in texts]
        lens = np.array([len(x) for x in token_lists], dtype=np.int64)
        flat = np.empty(int(lens.sum()), dtype=object)
        pos = 0
        for toks in token_lists:
            flat[pos : pos + len(toks)] = toks
            pos += len(toks)
    total = int(lens.sum())
    if total == 0:
        # 0-token docs (sep=None on all-whitespace text) still carry
        # ngram_set's single padded gram — batch composition must
        # never change a doc's grams
        acc = 0
        for _ in range(NGRAM):
            acc = (acc * int(_GRAM_P) + _EMPTY_TOKEN_HASH) % (1 << 64)
        return [np.array([acc], dtype=np.uint64) for _ in range(len(lens))]
    th = pd.util.hash_array(flat)  # uint64, deterministic key
    out: list[np.ndarray] = []
    pos = 0
    p2 = _GRAM_P2
    for n in lens:
        n = int(n)
        h = th[pos : pos + n]
        pos += n
        if n < NGRAM:  # mirror ngram_set's single padded gram
            hs = [int(v) for v in h] + [_EMPTY_TOKEN_HASH] * (NGRAM - n)
            acc = 0
            for k in range(NGRAM):  # exact mod-2^64 wraparound
                acc = (acc * int(_GRAM_P) + hs[k]) % (1 << 64)
            out.append(np.array([acc], dtype=np.uint64))
            continue
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            g = h[: n - 2] * p2 + h[1 : n - 1] * _GRAM_P + h[2:]
        out.append(np.unique(g))
    return out


MINHASH_BROADCAST_MAX_DOCS = 200_000

_VCOLS = ["k", "db", "side", "doc_b", "s_a", "gkey"]


def _vempty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _VCOLS})


def _pairs_empty() -> pd.DataFrame:
    return pd.DataFrame({
        "doc_a": pd.Series([], dtype="int64"),
        "doc_b": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64"),
    })


def _verify_pairs_bucketed(docs, pairs, cand_ids: np.ndarray, tau: float,
                           nb: int | None = None):
    """Exact-Jaccard verification of candidate pairs with ZERO driver
    text state — the scale tier for dup-heavy corpora where candidate
    docs ≈ corpus and a broadcast shingle dict would OOM the driver.

    Same union discipline as ``q_dedup_jaccard_prefix``'s big tier:
    two 64-bucket shuffles (key = doc_a, then doc_b), identical
    all-int64 schemas on both union sides.  Gram sets travel as
    distinct uint64 3-gram hashes (``batch_gram_hashes``); per-doc set
    sizes are recounted in-bucket from the gram rows themselves, so
    pairs need no precomputed size payload.  The only driver-held
    state is the candidate-id array (8 B/doc) used to semi-join the
    gram scan.

    Jaccard here is over hashed distinct grams; it equals the textual
    3-gram Jaccard of the broadcast tier absent 64-bit collisions
    (tests force both tiers on the same corpus and require identical
    output).

    Gram rows are corpus-scale (row-carrying exchange), so the caller
    passes a size-derived fan-out ``nb``; the default keeps the 64
    floor."""
    import ray

    if nb is None:
        nb = 64
    ids_ref = ray.put(np.sort(np.asarray(cand_ids, dtype=np.int64)))

    def gram_rows(t: pa.Table) -> pd.DataFrame:
        ids = ray.get(ids_ref)
        doc_all = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(doc_all, ids)
        if not keep.any():
            return _vempty()
        sub = t.filter(pa.array(keep))
        ghs = batch_gram_hashes(sub["text"], sep=" ")
        doc = sub["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        reps = np.fromiter((len(g) for g in ghs), dtype=np.int64, count=len(ghs))
        k = np.repeat(doc, reps)
        gk = np.concatenate(ghs).view(np.int64)
        return pd.DataFrame({
            "k": k, "db": k & np.int64(nb - 1), "side": np.int64(1),
            "doc_b": np.int64(-1), "s_a": np.int64(-1), "gkey": gk,
        })[_VCOLS]

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        k = df["doc_a"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "db": k & np.int64(nb - 1), "side": np.int64(0),
            "doc_b": df["doc_b"].to_numpy(np.int64),
            "s_a": np.int64(-1), "gkey": np.int64(0),
        })[_VCOLS]

    def explode_a(g: pd.DataFrame) -> pd.DataFrame:
        gr = g.loc[g["side"] == 1, ["k", "gkey"]]
        # cross-band duplicate pairs all land in doc_a's bucket: this
        # drop_duplicates is the global pair dedup
        p = g.loc[g["side"] == 0, ["k", "doc_b"]].drop_duplicates()
        if p.empty or gr.empty:
            return _vempty()
        s_a = gr.groupby("k").size()
        m = p.merge(gr, on="k")  # one row per (pair, gram-of-A)
        k = m["doc_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k, "db": k & np.int64(nb - 1), "side": np.int64(0),
            "doc_b": m["k"].to_numpy(np.int64),  # carries doc_a now
            "s_a": s_a.reindex(m["k"]).to_numpy(np.int64),
            "gkey": m["gkey"].to_numpy(np.int64),
        })[_VCOLS]

    def verify_b(g: pd.DataFrame) -> pd.DataFrame:
        gr = g.loc[g["side"] == 1, ["k", "gkey"]]
        p = g.loc[g["side"] == 0]
        if p.empty or gr.empty:
            return _pairs_empty()
        m = p.merge(gr, on=["k", "gkey"])  # grams in A∩B
        if m.empty:
            return _pairs_empty()
        s_b = gr.groupby("k").size()
        agg = m.groupby(["doc_b", "k", "s_a"], as_index=False).agg(
            inter=("gkey", "size")
        )
        inter = agg["inter"].to_numpy(np.int64)
        sa = agg["s_a"].to_numpy(np.int64)
        sb = s_b.reindex(agg["k"]).to_numpy(np.int64)
        jac = inter / (sa + sb - inter)
        out = pd.DataFrame({
            "doc_a": agg["doc_b"].to_numpy(np.int64),
            "doc_b": agg["k"].to_numpy(np.int64),
            "jaccard": jac,
        })
        return out.loc[out["jaccard"] >= tau]

    cand_grams = docs.map_batches(gram_rows, batch_format="pyarrow").materialize()
    # materialize between the two sort-shuffles: chaining them in one
    # lazy plan ran >2x slower (see the triangle_count note)
    exploded = (
        pairs.map_batches(tag_pairs, batch_format="pandas")
        .union(cand_grams)
        .groupby("db")
        .map_groups(explode_a, batch_format="pandas")
        .materialize()
    )
    out = (
        exploded.union(cand_grams)
        .groupby("db")
        .map_groups(verify_b, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _pairs_empty()
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_dedup_minhash_lsh(sf_dir: str):
    """MinHash(128)+LSH(32×4) near-dup pairs, verified with exact
    3-gram Jaccard ≥ 0.8.  Stages: signature map → band flat_map →
    per-bucket groupby (carries (band, hash, id) triples) → candidate
    pair dedup → exact-Jaccard verify.  The verify stage is two-tier:
    ≤ ``MINHASH_BROADCAST_MAX_DOCS`` candidate docs broadcast one
    shingle index via ``ray.put``; above it (dup-heavy corpora where
    candidates ≈ corpus) verification runs fully in-bucket via
    ``_verify_pairs_bucketed`` with no driver text state.
    Oracle-backed: the candidate generation isn't SQL-expressible, but
    the OUTPUT contract is — every emitted pair carries exact
    3-gram Jaccard ≥ τ, and at τ = 0.8 the 32×4 band s-curve misses a
    qualifying pair with probability (1−0.8⁴)³² ≈ 5·10⁻⁸, so on the
    fixed-seed test corpora LSH recall is exactly 1 and the output
    EQUALS the all-pairs τ=0.8 self-join (``SQL_DEDUP_MINHASH_LSH``,
    the ngram-Jaccard oracle body at τ=0.8).  Equality at both sf
    levels is deterministic (fixed permutation seed); the recall
    property vs brute force is additionally pinned in
    tests/test_dedup_similarity.py."""
    import ray
    import ray.data as rd

    from crawler_tjce_ray.pipelines import exchange

    # banding exchange fan-out: signature rows are corpus-scale
    # (LSH_BANDS rows/doc), so the per-band groups sub-bucket on the
    # band hash's low bits.  The SIZE-DERIVED value is the TOTAL group
    # budget (same per-task-payload discipline as every kb exchange);
    # splitting it across the bands keeps the small-corpus group count
    # near the band count (sub-bucketing only widens when the data
    # does — at the 64 floor this is 2 sub-buckets/band)
    nb_band = exchange.band_subbuckets(
        exchange.buckets_for_bytes(
            exchange.table_bytes(sf_dir, "documents")), LSH_BANDS)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def signatures(t: pa.Table) -> pd.DataFrame:
        # fully vectorized: one segment-reduced signature matrix, then
        # a rolling-polynomial band hash over the r rows of every band
        # of every doc at once — zero per-doc/per-band Python.  Band
        # bucket identity only needs equal-rows ⇒ equal-hash (true for
        # the polynomial); a cross-tuple collision merely adds a
        # candidate that exact verification discards.  Arrow batches:
        # tokenization runs as one Arrow split kernel, never a pandas
        # text-column materialization (r5 combiner conversion).
        gram_lists = batch_gram_hashes(t["text"], sep=" ")
        sigs = batch_minhash_signatures(gram_lists)
        n = len(gram_lists)
        r = N_PERM // LSH_BANDS
        bands3 = sigs.reshape(n, LSH_BANDS, r)
        bh = bands3[:, :, 0].copy()
        with np.errstate(over="ignore"):  # wraparound IS the hash
            for k in range(1, r):
                bh = bh * _GRAM_P + bands3[:, :, k]
        bh64 = bh.reshape(-1).view(np.int64)
        band_idx = np.tile(np.arange(LSH_BANDS, dtype=np.int64), n)
        return pd.DataFrame({
            # composite exchange key: (band, low bhash bits) — equal
            # band hashes always co-locate, but one group holds
            # corpus/(bands·nb_band) signature rows instead of the
            # whole corpus's slice for that band index
            "bb": band_idx * np.int64(nb_band)
            + (bh64 & np.int64(nb_band - 1)),
            "bhash": bh64,
            "doc_id": np.repeat(
                t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                LSH_BANDS),
        })

    banded = docs.map_batches(signatures, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One (band, sub-bucket)'s buckets → candidate pairs, fully
        vectorized: a self-merge on the band hash (bucket sizes are
        tiny by the s-curve, so the join is near-linear).  Grouping on
        bare (band, bhash) would make ~|corpus|×b one-row groups and
        per-group dispatch would dwarf the work; the coarse composite
        key keeps groups chunky while still co-locating every copy of
        a band hash."""
        m = g[["bhash", "doc_id"]].drop_duplicates()
        j = m.merge(m, on="bhash", suffixes=("_a", "_b"))
        j = j[j["doc_id_a"] < j["doc_id_b"]]
        return j.rename(
            columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b"}
        )[["doc_a", "doc_b"]].drop_duplicates()

    # materialize the (small) pair table once: the id scan below and
    # the tier that follows both consume it — without this the whole
    # signature+banding plan would execute twice
    cands = banded.groupby("bb").map_groups(
        band_pairs, batch_format="pandas"
    ).materialize()

    # distinct candidate doc ids: the ids-only driver collection both
    # tiers need (8 B/doc; the texts themselves never come back)
    id_parts = cands.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": np.unique(np.concatenate([
                df["doc_a"].to_numpy(np.int64),
                df["doc_b"].to_numpy(np.int64),
            ])) if len(df) else np.empty(0, dtype=np.int64)
        }),
        batch_format="pandas",
    ).to_pandas()
    cand_ids_arr = np.unique(id_parts["doc_id"].to_numpy(np.int64))
    if len(cand_ids_arr) == 0:
        return _pairs_empty()

    if len(cand_ids_arr) > MINHASH_BROADCAST_MAX_DOCS:
        # scale tier: in-bucket verification, zero driver text state;
        # gram rows are corpus-scale so the fan-out sizes from input
        from crawler_tjce_ray.pipelines import exchange

        nb = exchange.buckets_for_bytes(
            exchange.table_bytes(sf_dir, "documents"))
        return _verify_pairs_bucketed(docs, cands, cand_ids_arr, MINHASH_TAU,
                                      nb=nb)

    # broadcast tier: candidate docs ≪ corpus after LSH — build the
    # shingle index once, ship via ray.put, verify pair batches in
    # parallel against it
    cand_df = cands.to_pandas().drop_duplicates()  # pairs table ≪ corpus
    cand_ids = set(cand_ids_arr.tolist())
    idx_df = docs.map_batches(
        lambda df: df[df["doc_id"].isin(cand_ids)], batch_format="pandas"
    ).to_pandas()
    # sorted-unique uint64 gram arrays (same digests the scale tier
    # verifies with; equals textual Jaccard absent 64-bit collisions)
    idx_grams = batch_gram_hashes(idx_df["text"].tolist(), sep=" ")
    grams_by_id = {
        int(i): g for i, g in zip(idx_df["doc_id"], idx_grams)
    }
    ref = ray.put(grams_by_id)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        gid = ray.get(ref)
        das = df["doc_a"].to_numpy(np.int64)
        dbs = df["doc_b"].to_numpy(np.int64)
        rows = []
        for a, b in zip(das, dbs):
            ga, gb = gid[int(a)], gid[int(b)]
            # C merge-intersection of sorted-unique arrays — the only
            # per-pair work left, bounded by the candidate list
            inter = int(np.intersect1d(ga, gb, assume_unique=True).size)
            jac = inter / (len(ga) + len(gb) - inter)
            if jac >= MINHASH_TAU:
                rows.append((int(a), int(b), jac))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])

    out = (
        rd.from_pandas(cand_df.reset_index(drop=True))
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        return _pairs_empty()
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash (64-bit) with band blocking
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16-bit bands; hamming ≤ 3 ⇒ ≥1 identical band
SIMHASH_MAX_HAMMING = 3


def simhash64(gh: np.ndarray) -> np.uint64:
    """Charikar simhash over shingle hashes — vectorized bit-count."""
    if len(gh) == 0:
        return np.uint64(0)
    bits = (gh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.sum(axis=0) * 2 > len(gh)
    out = np.uint64(0)
    for k in np.nonzero(votes)[0]:
        out |= np.uint64(1) << np.uint64(k)
    return out


def batch_simhash64(gram_lists: list[np.ndarray]) -> np.ndarray:
    """Charikar simhash for a whole batch in one segment-reduced pass:
    the per-doc gram arrays concatenate once, bit votes accumulate via
    ``np.add.reduceat`` in 16-bit blocks (bounding scratch to
    |grams|×16×8 B), and the majority test packs back to uint64 —
    bit-identical to per-doc ``simhash64`` (pinned by test), empty
    docs keep the 0 signature."""
    n = len(gram_lists)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(g) for g in gram_lists), np.int64, count=n)
    nz = np.nonzero(lens)[0]
    if len(nz) == 0:
        return out
    flat = np.concatenate([gram_lists[i] for i in nz])
    starts = np.zeros(len(nz), np.int64)
    starts[1:] = np.cumsum(lens[nz])[:-1]
    sig = np.zeros(len(nz), dtype=np.uint64)
    blk = 16
    for b0 in range(0, 64, blk):
        shifts = np.arange(b0, b0 + blk, dtype=np.uint64)
        bits = (flat[:, None] >> shifts[None, :]) & np.uint64(1)
        sums = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
        votes = sums * 2 > lens[nz][:, None]
        sig |= (votes.astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64)
    out[nz] = sig
    return out


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming ≤ 3) via 4×16-bit band blocking:
    pigeonhole guarantees every qualifying pair shares ≥1 band, so the
    only shuffle is the per-band ``groupby`` on 16-bit keys.  Non-SQL →
    rows-only; kernel pinned in tests/test_dedup.py."""
    from crawler_tjce_ray.pipelines import exchange

    # signature rows are corpus-scale (SIMHASH_BANDS rows/doc): the
    # per-band groups sub-bucket on the 16-bit band key's low bits
    # (equal keys always co-locate); the size-derived value is the
    # TOTAL group budget, split across the bands
    nb_band = exchange.band_subbuckets(
        exchange.buckets_for_bytes(
            exchange.table_bytes(sf_dir, "documents")), SIMHASH_BANDS)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def sigs(t: pa.Table) -> pd.DataFrame:
        # fully vectorized: batch signatures + a (docs × bands) shift
        # matrix for the band keys; sim64 keeps ALL 64 bits via an
        # int64 reinterpret (bit 63 must participate in the hamming
        # distance); Arrow batches — split kernel, no pandas text copy
        gram_lists = batch_gram_hashes(t["text"])
        h = batch_simhash64(gram_lists)
        n = len(h)
        shifts = (np.uint64(16) * np.arange(SIMHASH_BANDS, dtype=np.uint64))
        bkeys = ((h[:, None] >> shifts[None, :]) & np.uint64(0xFFFF))
        bk64 = bkeys.reshape(-1).astype(np.int64)
        band_idx = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
        return pd.DataFrame({
            "bb": band_idx * np.int64(nb_band)
            + (bk64 & np.int64(nb_band - 1)),
            "bkey": bk64,
            "doc_id": np.repeat(
                t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                SIMHASH_BANDS),
            "sim64": np.repeat(h.view(np.int64), SIMHASH_BANDS),
        })

    banded = docs.map_batches(sigs, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One (band, sub-bucket) group: bucket pair-gen via self-merge
        on the 16-bit band key; hamming distance computed vectorized
        (XOR → byte view → unpackbits popcount)."""
        m = g[["bkey", "doc_id", "sim64"]].drop_duplicates("doc_id")
        j = m.merge(m, on="bkey", suffixes=("_a", "_b"))
        j = j[j["doc_id_a"] < j["doc_id_b"]]
        if j.empty:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "hamming": []}
            ).astype("int64")
        xor = np.bitwise_xor(
            j["sim64_a"].to_numpy(dtype=np.int64).view(np.uint64),
            j["sim64_b"].to_numpy(dtype=np.int64).view(np.uint64),
        )
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(j), 8), axis=1).sum(axis=1)
        keep = ham <= SIMHASH_MAX_HAMMING
        return pd.DataFrame({
            "doc_a": j["doc_id_a"].to_numpy()[keep],
            "doc_b": j["doc_id_b"].to_numpy()[keep],
            "hamming": ham[keep].astype("int64"),
        })

    out = (
        banded.groupby("bb")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if "doc_a" not in out.columns:
        return pd.DataFrame({
            c: pd.Series([], dtype="int64")
            for c in ("doc_a", "doc_b", "hamming")
        })
    out = out.drop_duplicates(["doc_a", "doc_b"])
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding-cosine nearest neighbor within label blocks (oracle-checked)
# ---------------------------------------------------------------------------

def q_dedup_embedding_nn(sf_dir: str):
    """Embedding near-dup probe: for every vector, its max-cosine
    neighbor within its label block (the blocked-dedup recipe — at
    scale the block key comes from IVF/LSH bucketing, cf.
    similarity.q_ann_ivf_topk).  Per-group numpy matmul in float64;
    group sizes are bounded by the block key.  Cosine rounded to 6dp
    on both sides."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def nn_in_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        np.fill_diagonal(sims, -np.inf)
        # argmax with vec_id-ascending tie-break (rows sorted by vec_id)
        nn_idx = sims.argmax(axis=1)
        return pd.DataFrame({
            "vec_id": g["vec_id"].astype("int64"),
            "nn_vec_id": g["vec_id"].to_numpy()[nn_idx].astype("int64"),
            "cosine": np.round(sims[np.arange(len(g)), nn_idx], 6),
        })

    out = (
        ds.groupby("label")
        .map_groups(nn_in_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("vec_id").reset_index(drop=True)


SQL_DEDUP_EMBEDDING_NN = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT vec_id, nn_vec_id, cosine FROM (
  SELECT a.vec_id, b.vec_id AS nn_vec_id,
         round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.emb, b.emb) DESC,
                    b.vec_id) AS rn
  FROM e a JOIN e b
    ON a.label = b.label AND a.vec_id <> b.vec_id) t
WHERE rn = 1 ORDER BY vec_id
"""


# driver-state ceiling (BASELINE.md table): the pair frame is 16 B/pair
# but the union-find dict is ~100 B/entry → ~2.3 GB at the ceiling;
# q_dedup_clusters_distributed is the zero-driver-state fallback
UNIONFIND_MAX_DRIVER_PAIRS = 20_000_000


def _cluster_label_ref(sf_dir: str):
    """Union-find over the (small) near-dup pair list with min-root
    union, broadcast as sorted parallel int64 arrays: the per-batch
    label join is a ``searchsorted`` — pure int64 end to end
    (``Series.map(dict)`` detours through float64 on misses, which
    silently rounds ids above 2^53).  Shared by the cluster-assignment
    and canonical-survivor queries."""
    import ray

    pairs = _dup_pairs(sf_dir)
    if len(pairs) > UNIONFIND_MAX_DRIVER_PAIRS:
        raise ValueError(
            f"driver union-find got {len(pairs)} near-dup pairs, over "
            f"the documented {UNIONFIND_MAX_DRIVER_PAIRS:,} ceiling "
            f"(BASELINE.md driver-state table); use "
            f"q_dedup_clusters_distributed (min-label propagation + "
            f"pointer jumping, zero driver pair state) past this size")
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # min-root union => cluster_id is the component min doc_id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    label = {x: find(x) for x in list(parent)}
    lk = np.fromiter(label.keys(), dtype=np.int64, count=len(label))
    lv = np.fromiter(label.values(), dtype=np.int64, count=len(label))
    o = np.argsort(lk)
    return ray.put((lk[o], lv[o]))


def _assign_cluster_ids(ids: np.ndarray, keys: np.ndarray,
                        vals: np.ndarray) -> np.ndarray:
    """Vectorized label lookup: unlabeled docs are their own cluster."""
    out = ids.copy()
    if len(keys):
        pos = np.searchsorted(keys, ids)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        hit = keys[pos_c] == ids
        out[hit] = vals[pos_c[hit]]
    return out


def q_dedup_clusters(sf_dir: str):
    """Near-dup cluster assignment: connected components over the
    3-gram-Jaccard duplicate pairs; every doc gets the min doc_id of
    its component as ``cluster_id`` (the canonical keep-one-per-cluster
    step after candidate generation).

    Scale shape: the EDGE list (near-dup pairs) is orders of magnitude
    smaller than the corpus — it is the output of the LSH candidate
    path — so the union-find runs on the driver over edges only, and
    the per-doc cluster assignment is a broadcast-map ``map_batches``
    over the corpus (docs never shuffle).  For edge lists beyond driver
    memory the same converges as iterated min-label propagation
    (groupby-min per round); the oracle is an exact recursive-CTE
    transitive closure.

    Pair source: the exact all-pairs verifier up to its small-n limit
    (what the oracle expresses); past it, the LSH candidate path — the
    standalone query stays runnable at corpus scale with approximate
    (τ=0.8 verified) edges."""
    import ray

    label_ref = _cluster_label_ref(sf_dir)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        keys, vals = ray.get(label_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "cluster_id": _assign_cluster_ids(ids, keys, vals),
        })

    out = (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(assign, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# shared transitive-closure prefix: exact 3-gram-Jaccard dup pairs →
# recursive-CTE connected components (consumed by the cluster and
# canonical-survivor oracles)
_SQL_CC_BODY = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(text,' ') AS ws FROM documents
), grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(1, length(ws)-2)),
             i -> ws[i] || ' ' || coalesce(ws[i+1],'') || ' ' ||
                  coalesce(ws[i+2],''))) AS gs
  FROM toks
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
  WHERE CAST(length(list_intersect(a.gs,b.gs)) AS DOUBLE) /
        (length(a.gs)+length(b.gs)-length(list_intersect(a.gs,b.gs)))
          >= {JACCARD_TAU}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), cc(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, cc.comp FROM cc JOIN edges e ON e.b = cc.id
  WHERE cc.comp < e.a
)"""

SQL_DEDUP_CLUSTERS = _SQL_CC_BODY + """
SELECT id AS doc_id, MIN(comp) AS cluster_id FROM cc GROUP BY id ORDER BY doc_id
"""


def q_dedup_canonical(sf_dir: str):
    """Survivorship after near-dup clustering: every doc maps to its
    cluster's CANONICAL doc — longest text wins, ties to the smallest
    doc_id (the keep-best policy real curation applies, vs the min-id
    placeholder ``dedup_clusters`` reports).

    Scale recipe: docs pick up their component label from the
    broadcast union-find arrays inside ``map_batches`` and ride ONE
    64-way cluster-bucket exchange (a cluster lives wholly in its
    bucket, so the in-bucket winner is the global winner); the
    in-bucket pick is a vectorized sort + ``drop_duplicates`` +
    ``searchsorted`` map-back — no per-cluster Python dispatch, and
    the driver never sees texts or labels."""
    nb = _nb_rows(sf_dir, 'documents')  # row-carrying exchange
    import ray

    label_ref = _cluster_label_ref(sf_dir)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        keys, vals = ray.get(label_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        cid = _assign_cluster_ids(ids, keys, vals)
        return pd.DataFrame({
            "doc_id": ids,
            "cluster_id": cid,
            "n_chars": df["n_chars"].to_numpy(dtype=np.int64),
            "kb": cid % nb,
        })

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["cluster_id", "n_chars", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        canon = d.drop_duplicates("cluster_id")
        ck = canon["cluster_id"].to_numpy(np.int64)
        cv = canon["doc_id"].to_numpy(np.int64)
        pos = np.searchsorted(ck, g["cluster_id"].to_numpy(np.int64))
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "canonical_id": cv[pos],
        })

    out = (
        _read_docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(assign, batch_format="pandas")
        .groupby("kb")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["canonical_id"] = out["canonical_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DEDUP_CANONICAL = _SQL_CC_BODY + """
, lab AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM cc GROUP BY id)
, j AS (SELECT l.doc_id, l.cluster_id, d.n_chars
        FROM lab l JOIN documents d ON d.doc_id = l.doc_id)
, canon AS (
  SELECT cluster_id, doc_id AS canonical_id FROM (
    SELECT cluster_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM j) t WHERE rn = 1
)
SELECT j.doc_id, c.canonical_id
FROM j JOIN canon c ON c.cluster_id = j.cluster_id
ORDER BY j.doc_id
"""


def cluster_labels_distributed(sf_dir: str, pairs,
                               max_rounds: int = 64):
    """Distributed min-label propagation with pointer jumping:
    connected components where labels, edges and messages all live as
    Datasets bucketed on ``node % nb`` (size-derived, never per-node groups).

    Per round:

    1. *edge step* — bucket-local join of edges with their source
       node's label emits ``(neighbor, label)`` messages; bucket-local
       min per node becomes the new label;
    2. *shortcut step* (pointer jumping) — every node asks its label's
       owner for THAT node's label (``label[label[node]]``), squaring
       pointer depth so a path graph converges in O(log diameter)
       rounds rather than O(diameter).

    Labels decrease monotonically to the component min; the fixed
    point is detected with a cheap ``sum(label)`` aggregate.  Raises
    ``RuntimeError`` if ``max_rounds`` is exhausted before convergence
    — silent partial labels would be wrong data.

    ``pairs`` may be a pandas DataFrame (small candidate lists) or a
    Dataset with ``doc_a``/``doc_b`` columns; the bidirectional edge
    expansion runs inside ``map_batches`` either way."""
    nb = _nb_rows(sf_dir, 'documents')  # row-carrying exchange
    import ray.data as rd

    docs = _read_docs(sf_dir, ["doc_id"])

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame({"node": ids, "label": ids, "nbr": np.int64(-1),
                             "kind": np.int64(0), "kb": ids % nb})

    labels = docs.map_batches(init_labels, batch_format="pandas")
    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            out = labels.to_pandas()[["node", "label"]]
            return out.rename(columns={"node": "doc_id", "label": "cluster_id"})
        pairs = rd.from_pandas(pairs.reset_index(drop=True))

    def both_directions(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].astype("int64")
        b = df["doc_b"].astype("int64")
        out = pd.DataFrame({
            "node": pd.concat([a, b], ignore_index=True),
            "label": np.int64(-1),
            "nbr": pd.concat([b, a], ignore_index=True),
            "kind": np.int64(1),
        })
        out["kb"] = out["node"] % nb
        return out

    edges = pairs.map_batches(both_directions, batch_format="pandas")

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0][["node", "label"]]
        ed = g[g["kind"] == 1][["node", "nbr"]]
        msgs = ed.merge(lab, on="node")[["nbr", "label"]].rename(
            columns={"nbr": "node"}
        )
        out = pd.concat([lab, msgs], ignore_index=True)
        out["kb"] = out["node"] % nb
        return out

    def shortcut(g: pd.DataFrame) -> pd.DataFrame:
        # kind 0 = label-owner state; kind 2 = "what is YOUR label"
        # queries addressed to the requester's current label
        lab = g[g["kind"] == 0][["node", "label"]]
        q = g[g["kind"] == 2][["node", "nbr"]]  # node = queried label owner
        ans = q.merge(lab, on="node")[["nbr", "label"]].rename(
            columns={"nbr": "node"}
        )
        out = pd.concat([lab, ans], ignore_index=True)
        out["kb"] = out["node"] % nb
        return out

    def make_queries(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["kind"] == 0]
        q = pd.DataFrame({
            "node": lab["label"],          # addressed to the label owner
            "label": np.int64(-1),
            "nbr": lab["node"],            # requester
            "kind": np.int64(2),
        })
        q["kb"] = q["node"] % nb
        return pd.concat([lab, q], ignore_index=True)

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["label"].min()
        out["nbr"] = np.int64(-1)
        out["kind"] = np.int64(0)
        out["kb"] = out["node"] % nb
        return out

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # edge step
        msgs = labels.union(edges).groupby("kb").map_groups(
            propagate, batch_format="pandas"
        )
        labels = msgs.groupby("kb").map_groups(reduce_min, batch_format="pandas")
        # pointer-jumping step
        with_q = labels.map_batches(make_queries, batch_format="pandas")
        shortcuts = with_q.groupby("kb").map_groups(
            shortcut, batch_format="pandas"
        )
        labels = shortcuts.groupby("kb").map_groups(
            reduce_min, batch_format="pandas"
        ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # fixed point (labels only decrease)
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds; "
            f"raise max_rounds (components deeper than 2^rounds exist)"
        )
    out = labels.to_pandas()[["node", "label"]]
    return out.rename(columns={"node": "doc_id", "label": "cluster_id"})


_DUP_PAIRS_CACHE: dict[tuple, pd.DataFrame] = {}


def _dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Shared pair source for cluster assignment: exact all-pairs up to
    the guard, the LSH candidate path past it.

    Memoized per (sf_dir, documents mtime): three queries (cluster
    assignment, distributed labels, canonical survivorship) consume the
    same small pair table, and pair generation dominates their cost.
    The cached value is a driver-side pandas frame (no object-store
    refs), so it stays valid across ``ray.init`` cycles — unlike the
    Dataset caches, no session key is needed."""
    from crawler_tjce_ray.sources.docs import documents_mtime

    key = (sf_dir, documents_mtime(sf_dir))
    if key not in _DUP_PAIRS_CACHE:
        try:
            pairs = q_dedup_ngram_jaccard(sf_dir)[["doc_a", "doc_b"]]
        except ValueError:
            pairs = q_dedup_minhash_lsh(sf_dir)[["doc_a", "doc_b"]]
        for old in [k for k in _DUP_PAIRS_CACHE if k[0] == sf_dir]:
            _DUP_PAIRS_CACHE.pop(old, None)
        _DUP_PAIRS_CACHE[key] = pairs
    return _DUP_PAIRS_CACHE[key]


def q_dedup_clusters_distributed(sf_dir: str):
    """Same result as ``q_dedup_clusters`` computed by the distributed
    label-propagation path (shares the exact-pairs oracle)."""
    out = cluster_labels_distributed(sf_dir, _dup_pairs(sf_dir))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_paragraphs(sf_dir: str):
    """Paragraph-level exact dedup across the corpus: each distinct
    paragraph (newline-delimited) survives only at its GLOBAL first
    occurrence — ordered by (doc_id, position) — and every document
    reassembles from its surviving paragraphs (docs left empty drop).
    The classic boilerplate-paragraph removal pass of a webtext
    pipeline.

    Fully distributed, zero driver state: (1) explode paragraphs with
    positions; (2) ONE shuffle on 64 paragraph-hash buckets — every
    occurrence of a paragraph lands in the same bucket, so the winner
    (min (doc_id, position)) is decided in-bucket with a vectorized
    sort + drop_duplicates, no join; (3) ONE shuffle on 64 doc-id
    buckets to reassemble each document's survivors in order."""
    nb = _nb_rows(sf_dir, 'documents')  # row-carrying exchange
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "para": df["text"].str.split("\n"),
        }).explode("para", ignore_index=True)
        ex["i"] = (ex.groupby("doc_id").cumcount() + 1).astype("int64")
        # deterministic cross-process hash (pandas siphash, fixed key)
        ex["kb"] = (
            pd.util.hash_array(ex["para"].to_numpy(object)) % nb
        ).astype("int64")
        return ex

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["para", "doc_id", "i"], kind="mergesort")
        return g.drop_duplicates("para")[["doc_id", "i", "para"]]

    def bucket_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["db"] = (df["doc_id"] % nb).astype("int64")
        return df

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "i"], kind="mergesort")
        gg = g.groupby("doc_id")
        out = pd.DataFrame({
            "n_kept": gg["para"].size().astype("int64"),
            "text_deduped": gg["para"].agg("\n".join),
        }).reset_index()
        return out[["doc_id", "n_kept", "text_deduped"]]

    out = (
        docs.map_batches(explode, batch_format="pandas")
        .groupby("kb")
        .map_groups(keep_first, batch_format="pandas")
        .map_batches(bucket_doc, batch_format="pandas")
        .groupby("db")
        .map_groups(reassemble, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DEDUP_PARAGRAPHS = """
WITH s AS (
  SELECT doc_id, string_split(text, chr(10)) AS ps FROM documents
), p AS (
  SELECT doc_id, i, ps[i] AS para
  FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i FROM s)
), r AS (
  SELECT doc_id, i, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn
  FROM p
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       string_agg(para, chr(10) ORDER BY i) AS text_deduped
FROM r WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# exact Jaccard self-join via prefix filtering (PPJoin-style)
# ---------------------------------------------------------------------------

# verification tier cut: at or below this many candidate DOCS the
# semi-joined gram table is collected and verified in one vectorized
# merge (candidate-bounded — not corpus-bounded); above it the same
# exploded merge runs as two distributed union-shuffles
JACCARD_PREFIX_BROADCAST_MAX_DOCS = 200_000

# Count-Min sketch for the global gram-rarity order: D rows × W int64
# counters (4 × 2^20 × 8 B ≈ 34 MB merged) — FIXED driver/broadcast
# state at any corpus size.  Multiplicative hashes over the gram digest.
_CMS_D, _CMS_W_LOG2 = 4, 20
_CMS_W = 1 << _CMS_W_LOG2
_CMS_MULTS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
     0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)

# tau as an exact rational (float -> exact binary fraction) for the
# integer prune bounds below
_TAU_P, _TAU_Q = JACCARD_TAU.as_integer_ratio()


def _ceil_tau_mul(n: np.ndarray) -> np.ndarray:
    """Exact ⌈τ·n⌉ for integer n — integer arithmetic over the unique
    values (Python ints, so τ's full 53-bit numerator cannot overflow
    like a float or int64 product would).  np.ceil(TAU * n) in float
    over-estimates the exact bound for some τ (verified at τ=0.8,
    n=63: 29 vs 28), which would silently drop true boundary pairs."""
    u, inv = np.unique(n, return_inverse=True)
    vals = np.array(
        [-((-_TAU_P * int(x)) // _TAU_Q) for x in u], dtype=np.int64
    )
    return vals[inv]


def _alpha_overlap(total: np.ndarray) -> np.ndarray:
    """Exact minimum intersection ⌈τ/(1+τ)·(s_a+s_b)⌉ = ⌈P·s/(P+Q)⌉
    for J ≥ τ, MINUS one unit of slack: the final verification
    compares a correctly-rounded float ratio against τ, which can
    admit pairs whose exact ratio sits half an ulp below τ — the
    slack guarantees the prune never disagrees with that final test,
    at the cost of a few extra candidates."""
    u, inv = np.unique(total, return_inverse=True)
    vals = np.array(
        [-((-_TAU_P * int(x)) // (_TAU_P + _TAU_Q)) for x in u],
        dtype=np.int64,
    )
    return vals[inv] - 1


def _cms_cells(h: np.ndarray) -> np.ndarray:
    """(D, n) counter indices for gram digests ``h`` (vectorized
    multiplicative hashing; wraparound multiply is intentional)."""
    with np.errstate(over="ignore"):
        prod = h[None, :] * _CMS_MULTS[:, None]
    return (prod >> np.uint64(64 - _CMS_W_LOG2)).astype(np.int64)


def q_dedup_jaccard_prefix(sf_dir: str):
    """Exact all-pairs word-3-gram Jaccard ≥ τ WITHOUT the O(n²)
    broadcast: prefix filtering (the PPJoin principle, public
    literature).  Same output as ``q_dedup_ngram_jaccard`` — this is
    the scale path for the exact join.

    Why it works: order grams by global rarity (estimated document
    frequency, digest tie-break).  If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉,
    so the rarity-prefix of length |S| − ⌈τ·|S|⌉ + 1 of each set must
    share a gram with its partner's prefix — only docs sharing a
    *prefix* gram ever become candidates, and a size filter
    (τ·max ≤ min) prunes further before exact verification.  The
    lemma needs ANY globally consistent total order; exact df only
    tunes candidate count.  So instead of a gram-keyed df shuffle the
    order comes from a Count-Min sketch: one map pass builds per-batch
    (D×W) partials, the driver stream-merges them (holding one ~34 MB
    partial at a time — fixed at any corpus size) and broadcasts the
    merged sketch once; the estimated-df
    order is then computed BATCH-LOCALLY — same sketch everywhere →
    same global order.

    Distributed plan (shuffles carry 8-byte digests, never text):
    map (CMS partials) → map (grams + in-batch prefix selection) →
    the plan's ONLY all-to-all: a gram-bucket groupby pairing docs
    that share a prefix gram (size-filtered).  Verification is
    candidate-bounded on both tiers: below
    ``JACCARD_PREFIX_BROADCAST_MAX_DOCS`` candidate docs, the
    semi-joined gram table is counted in pure numpy driver-side;
    above it, the same exploded merge runs as two aligned-schema
    union-shuffles (the ``q_asof_join`` recipe — every column a
    scalar int64, sentinel-filled): bucket by doc_a to attach A's
    grams, re-bucket by doc_b to inner-merge against B's grams; the
    per-pair match count IS the exact intersection.

    The gram/prefix exchanges are corpus-scale (row-carrying), so
    their fan-out sizes from the documents bytes
    (``exchange.buckets_for_bytes``)."""
    import ray

    from crawler_tjce_ray.pipelines import exchange

    nb = exchange.buckets_for_bytes(exchange.table_bytes(sf_dir, "documents"))

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    # pass 1: per-batch CMS partials → driver sum → broadcast once
    # (grams via the vectorized batch kernel — one token-hash pass per
    # batch instead of an md5 per shingle; digest domain is shared
    # with doc_gram_rows below, which is all consistency the rarity
    # order needs)
    def cms_partial(t: pa.Table) -> pd.DataFrame:
        sk = np.zeros((_CMS_D, _CMS_W), np.int64)
        for h in batch_gram_hashes(t["text"], sep=" "):
            idx = _cms_cells(h)
            for d in range(_CMS_D):
                np.add.at(sk[d], idx[d], 1)
        return pd.DataFrame({"sk": [sk.tobytes()]})

    # streaming merge: iter_batches holds ONE partial + the merged
    # sketch at a time (a to_pandas() here would concatenate every
    # ~34 MB partial on the driver — linear in corpus size)
    merged = np.zeros((_CMS_D, _CMS_W), np.int64)
    for b in ds.map_batches(cms_partial, batch_format="pyarrow") \
               .iter_batches(batch_size=None, batch_format="pandas"):
        for blob in b["sk"]:
            merged += np.frombuffer(blob, np.int64).reshape(_CMS_D, _CMS_W)
    sk_ref = ray.put(merged)

    # pass 2: gram rows + BATCH-LOCAL prefix selection (docs are
    # batch-local; the broadcast sketch makes the order global)
    def doc_gram_rows(t: pa.Table) -> pd.DataFrame:
        sk = ray.get(sk_ref)
        ghs = batch_gram_hashes(t["text"], sep=" ")
        ids, gks, sizes, pfx, pos = [], [], [], [], []
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for i, h in zip(doc_ids, ghs):
            est = sk[np.arange(_CMS_D)[:, None], _cms_cells(h)].min(axis=0)
            order = np.lexsort((h, est))  # rarity first, digest tie-break
            # exact-integer ⌈τ·s⌉ plus one slack gram (see _alpha_overlap
            # for why the float final test needs the unit of slack)
            ct = -((-_TAU_P * len(h)) // _TAU_Q)
            plen = min(len(h), len(h) - int(ct) + 2)
            mask = np.zeros(len(h), bool)
            mask[order[:max(plen, 1)]] = True
            rank = np.empty(len(h), np.int64)
            rank[order] = np.arange(len(h), dtype=np.int64)
            ids.append(np.full(len(h), int(i), dtype=np.int64))
            gks.append(h)
            sizes.append(np.full(len(h), len(h), dtype=np.int64))
            pfx.append(mask)
            pos.append(rank)
        out = pd.DataFrame({
            "doc_id": np.concatenate(ids) if ids else np.array([], np.int64),
            "gkey": np.concatenate(gks) if gks else np.array([], np.uint64),
            "s": np.concatenate(sizes) if sizes else np.array([], np.int64),
            "pfx": np.concatenate(pfx) if pfx else np.array([], bool),
            "p": np.concatenate(pos) if pos else np.array([], np.int64),
        })
        out["gb"] = (out["gkey"] & np.uint64(nb - 1)).astype(np.int64)
        return out

    pairs = ds.map_batches(doc_gram_rows, batch_format="pyarrow").materialize()

    # candidate pairs: docs sharing a prefix gram, size-compatible —
    # the ONLY shuffle, carrying prefix rows only (~half the grams)
    def cands_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="gkey", suffixes=("_a", "_b"))
        m = m.loc[m["doc_id_a"] < m["doc_id_b"]]
        mn = np.minimum(m["s_a"].to_numpy(), m["s_b"].to_numpy())
        mx = np.maximum(m["s_a"].to_numpy(), m["s_b"].to_numpy())
        m = m.loc[mn >= _ceil_tau_mul(mx) - 1]  # -1: float-test slack
        # PPJoin positional filter (public literature): with a shared
        # prefix gram at rarity-ranks (p_a, p_b), the intersection is
        # ≤ 1 + min(s_a − p_a − 1, s_b − p_b − 1) — everything common
        # sits at or after the shared gram in BOTH rarity orders.  A
        # true pair's rarest common gram occurrence always passes, so
        # dropping rows below the exact-integer overlap bound
        # (_alpha_overlap, slack included) loses nothing and prunes
        # same-sized corpora hard (only early-prefix matches survive).
        ub = 1 + np.minimum(m["s_a"] - m["p_a"] - 1, m["s_b"] - m["p_b"] - 1)
        alpha = _alpha_overlap(
            m["s_a"].to_numpy(np.int64) + m["s_b"].to_numpy(np.int64)
        )
        m = m.loc[ub.to_numpy() >= alpha]
        return m[["doc_id_a", "doc_id_b", "s_a", "s_b"]].drop_duplicates(
            ["doc_id_a", "doc_id_b"]
        )

    # pair dedup (same pair found via several shared prefix grams in
    # different gb buckets) happens where the pairs land anyway — the
    # driver compares the result, so candidates are driver-sized by
    # contract; at unattended scale this is one more bucket groupby
    cand_ids_df = (
        pairs.map_batches(
            lambda df: df.loc[df["pfx"], ["gkey", "doc_id", "s", "p", "gb"]],
            batch_format="pandas",
        )
        .groupby("gb")
        .map_groups(cands_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["doc_id_a", "doc_id_b"])
    )

    # 4) semi-join the gram table down to candidate docs (broadcast the
    #    candidate id set once — candidate-bounded, not corpus-bounded)
    if cand_ids_df.empty:
        return pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        })
    cand_doc_ids = np.unique(
        np.concatenate([
            cand_ids_df["doc_id_a"].to_numpy(np.int64),
            cand_ids_df["doc_id_b"].to_numpy(np.int64),
        ])
    )
    ids_ref = ray.put(cand_doc_ids)

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(df["doc_id"].to_numpy(np.int64), ray.get(ids_ref))
        out = df.loc[keep, ["doc_id", "gkey"]].copy()
        out["db"] = exchange.kb_numpy(out["doc_id"].to_numpy(np.int64), nb)
        return out

    def _finish(agg: pd.DataFrame) -> pd.DataFrame:
        inter = agg["inter"].to_numpy(np.int64)
        jac = inter / (
            agg["s_a"].to_numpy(np.int64) + agg["s_b"].to_numpy(np.int64) - inter
        )
        out = pd.DataFrame({
            "doc_a": agg.iloc[:, 0].to_numpy(np.int64),
            "doc_b": agg.iloc[:, 1].to_numpy(np.int64),
            "jaccard": jac,
        })
        out = out.loc[out["jaccard"] >= JACCARD_TAU]
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    if len(cand_doc_ids) <= JACCARD_PREFIX_BROADCAST_MAX_DOCS:
        # small-candidate tier: the semi-joined gram table reduces to a
        # compact sorted index (doc slices + dense (doc, gram) member
        # keys) that broadcasts ONCE via ray.put; pair batches then
        # verify IN PARALLEL — each batch explodes its pairs over A's
        # grams with arithmetic indexing, membership-probes B via
        # searchsorted on the broadcast member array, and bincounts
        # hits per pair.  No DataFrame merge, no driver-side probe
        # loop: the Σ|A|-per-pair work distributes across the pool.
        grams = pairs.map_batches(semi, batch_format="pandas").to_pandas()
        g_doc = grams["doc_id"].to_numpy(np.int64)
        order = np.argsort(g_doc, kind="stable")
        g_doc = g_doc[order]
        ug = np.unique(grams["gkey"].to_numpy(np.uint64))
        g_gidx = np.searchsorted(
            ug, grams["gkey"].to_numpy(np.uint64)[order]
        ).astype(np.int64)
        # per-candidate-doc slice [start, start+cnt) into the sorted arrays
        start = np.searchsorted(g_doc, cand_doc_ids)
        end = np.searchsorted(g_doc, cand_doc_ids, side="right")
        cnt = end - start
        # dense combined key: doc-rank * |grams| + gram-rank (fits int64
        # under the guard: 2e5 docs × ~1e7 distinct grams < 2^63)
        member = np.sort(
            np.searchsorted(cand_doc_ids, g_doc) * len(ug) + g_gidx
        )
        idx_ref = ray.put((cand_doc_ids, start, cnt, g_gidx, member, len(ug)))

        def verify_batch(df: pd.DataFrame) -> pd.DataFrame:
            ids, st, ct, gix, mem, nug = ray.get(idx_ref)
            da = np.searchsorted(ids, df["doc_id_a"].to_numpy(np.int64))
            db_ = np.searchsorted(ids, df["doc_id_b"].to_numpy(np.int64))
            reps = ct[da]
            total = int(reps.sum())
            pair_of = np.repeat(np.arange(len(df)), reps)
            within = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            probe = db_[pair_of] * nug + gix[np.repeat(st[da], reps) + within]
            loc = np.searchsorted(mem, probe)
            hit = (loc < len(mem)) & (
                mem[np.minimum(loc, len(mem) - 1)] == probe
            )
            inter = np.bincount(pair_of[hit], minlength=len(df))
            out = pd.DataFrame({
                "doc_id_a": df["doc_id_a"].to_numpy(np.int64),
                "doc_id_b": df["doc_id_b"].to_numpy(np.int64),
                "s_a": df["s_a"].to_numpy(np.int64),
                "s_b": df["s_b"].to_numpy(np.int64),
                "inter": inter,
            })
            return out.loc[out["inter"] > 0]

        nblocks = max(8, min(32, int(ray.available_resources().get("CPU", 8))))
        bounds = np.linspace(0, len(cand_ids_df), nblocks + 1, dtype=np.int64)
        chunks = [
            cand_ids_df.iloc[lo:hi]
            for lo, hi in zip(bounds, bounds[1:])
            if hi > lo
        ]
        agg = (
            ray.data.from_pandas(chunks)
            .map_batches(verify_batch, batch_format="pandas")
            .to_pandas()
        )
        return _finish(agg[["doc_id_a", "doc_id_b", "s_a", "s_b", "inter"]])

    cands = ray.data.from_pandas(cand_ids_df)
    cand_grams = pairs.map_batches(semi, batch_format="pandas").materialize()

    # 5) exact |A∩B| without list columns: explode each pair against
    #    A's grams in a doc_a-bucket union, inner-merge against B's
    #    grams in a doc_b-bucket union, count matches per pair.  Both
    #    unions use IDENTICAL all-int64 schemas (sentinel-filled), the
    #    same discipline as q_asof_join.  gkey travels as the int64
    #    bit-view of the uint64 digest (equality- and bucket-preserving).
    COLS = ["k", "db", "side", "doc_b", "s_a", "s_b", "gkey"]

    def tag_pairs_a(df: pd.DataFrame) -> pd.DataFrame:
        k = df["doc_id_a"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k,
            "db": k & np.int64(nb - 1),
            "side": np.int64(0),
            "doc_b": df["doc_id_b"].to_numpy(np.int64),
            "s_a": df["s_a"].to_numpy(np.int64),
            "s_b": df["s_b"].to_numpy(np.int64),
            "gkey": np.int64(0),
        })[COLS]

    def tag_grams(df: pd.DataFrame) -> pd.DataFrame:
        k = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({
            "k": k,
            "db": k & np.int64(nb - 1),
            "side": np.int64(1),
            "doc_b": np.int64(-1),
            "s_a": np.int64(-1),
            "s_b": np.int64(-1),
            "gkey": df["gkey"].to_numpy(np.uint64).view(np.int64),
        })[COLS]

    def explode_a(g: pd.DataFrame) -> pd.DataFrame:
        p = g.loc[g["side"] == 0, ["k", "doc_b", "s_a", "s_b"]]
        gr = g.loc[g["side"] == 1, ["k", "gkey"]]
        if p.empty or gr.empty:
            return pd.DataFrame({
                "k": pd.Series([], dtype="int64"),
                "db": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "s_a": pd.Series([], dtype="int64"),
                "s_b": pd.Series([], dtype="int64"),
                "gkey": pd.Series([], dtype="int64"),
            })[COLS]
        m = p.merge(gr, on="k")  # one row per (pair, gram-of-A)
        out = pd.DataFrame({
            # re-keyed by doc_b for the second bucket shuffle
            "k": m["doc_b"].to_numpy(np.int64),
            "db": m["doc_b"].to_numpy(np.int64) & np.int64(nb - 1),
            "side": np.int64(0),
            "doc_b": m["k"].to_numpy(np.int64),  # carries doc_a now
            "s_a": m["s_a"].to_numpy(np.int64),
            "s_b": m["s_b"].to_numpy(np.int64),
            "gkey": m["gkey"].to_numpy(np.int64),
        })
        return out[COLS]

    exploded = (
        cands.map_batches(tag_pairs_a, batch_format="pandas")
        .union(cand_grams.map_batches(tag_grams, batch_format="pandas"))
        .groupby("db")
        .map_groups(explode_a, batch_format="pandas")
        .materialize()
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # side 0: (k=doc_b, doc_b=doc_a, gram-of-A); side 1: B's grams.
        # A match on (k, gkey) means the gram is in A∩B; the per-pair
        # match count is the exact intersection (grams are distinct
        # per doc by construction).
        p = g.loc[g["side"] == 0]
        gr = g.loc[g["side"] == 1, ["k", "gkey"]]
        if p.empty or gr.empty:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            })
        m = p.merge(gr, on=["k", "gkey"])
        if m.empty:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            })
        agg = (
            m.groupby(["doc_b", "k", "s_a", "s_b"], as_index=False)
            .agg(inter=("gkey", "size"))
        )
        inter = agg["inter"].to_numpy(np.int64)
        jac = inter / (
            agg["s_a"].to_numpy(np.int64) + agg["s_b"].to_numpy(np.int64) - inter
        )
        out = pd.DataFrame({
            "doc_a": agg["doc_b"].to_numpy(np.int64),
            "doc_b": agg["k"].to_numpy(np.int64),
            "jaccard": jac,
        })
        return out.loc[out["jaccard"] >= JACCARD_TAU]

    out = (
        exploded.union(cand_grams.map_batches(tag_grams, batch_format="pandas"))
        .groupby("db")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact substring-dedup CLEANING (remove cross-doc duplicated spans)
# ---------------------------------------------------------------------------

SUBSTR_N = 8  # words per duplicated window (the Lee et al. unit)


def q_dedup_substring_clean(sf_dir: str):
    """The REMOVAL form of substring dedup ("Deduplicating Training
    Data Makes Language Models Better", Lee et al. 2022, public): drop
    every word covered by a ``SUBSTR_N``-word window whose exact
    content also appears in at least one OTHER document, and emit the
    cleaned text.

    Distributed plan (two bucket shuffles, both digest-keyed):
    (1) every window position becomes a (doc, pos, rolling-digest) row;
    the gram-bucket shuffle holds ALL rows of a digest, so the
    cross-doc test (distinct-doc count ≥ 2) is exact in-bucket and
    only duplicated positions come out.  (2) the doc-bucket shuffle
    unions those dup starts with the docs table (aligned schemas, the
    ``q_hash_join_big`` recipe — text rides this ONE shuffle, which is
    unavoidable: the output IS transformed text); inside a bucket each
    doc's coverage mask is a diff-array cumsum over its dup starts and
    the kept words reassemble in order.  Driver state: none beyond the
    streamed result.  Both exchanges carry row-level data (window rows
    ∝ corpus words; the doc-bucket hop carries text), so their
    fan-outs size from the documents bytes
    (``exchange.buckets_for_bytes``; the gram hop gets 4× the doc hop
    because each word fans out into ~1 window row)."""
    from crawler_tjce_ray.pipelines import exchange
    from crawler_tjce_ray.pipelines.textops import _read_docs as rd

    dbytes = exchange.table_bytes(sf_dir, "documents")
    nb_doc = exchange.buckets_for_bytes(dbytes)
    nb_gram = exchange.buckets_for_bytes(dbytes * 4 if dbytes else None)

    ds = rd(sf_dir, ["doc_id", "text"])
    def window_rows(df: pd.DataFrame) -> pd.DataFrame:
        # window digests without per-window Python: hash every token
        # of the batch once (process-stable C siphash, the
        # batch_gram_hashes discipline), then each doc's n_win window
        # keys fall out of SUBSTR_N Horner slice ops over its token
        # hashes (digest identity is global because the token hash is;
        # collisions are the same 64-bit exposure the old truncated
        # md5 carried)
        token_lists = [t.split(" ") for t in df["text"]]
        total = sum(len(x) for x in token_lists)
        th = np.empty(0, np.uint64)
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for toks in token_lists:
                flat[pos:pos + len(toks)] = toks
                pos += len(toks)
            th = pd.util.hash_array(flat)
        ids, poss, gks = [], [], []
        pos = 0
        for i, toks in zip(df["doc_id"], token_lists):
            n = len(toks)
            h = th[pos:pos + n]
            pos += n
            if n < SUBSTR_N:
                continue
            n_win = n - SUBSTR_N + 1
            digs = np.zeros(n_win, np.uint64)
            with np.errstate(over="ignore"):  # wraparound IS the hash
                for k in range(SUBSTR_N):
                    digs = digs * _GRAM_P + h[k:k + n_win]
            ids.append(np.full(n_win, int(i), np.int64))
            poss.append(np.arange(n_win, dtype=np.int64))
            gks.append(digs)
        out = pd.DataFrame({
            "doc_id": np.concatenate(ids) if ids else np.array([], np.int64),
            "pos": np.concatenate(poss) if poss else np.array([], np.int64),
            "gkey": np.concatenate(gks) if gks else np.array([], np.uint64),
        })
        out["gb"] = (out["gkey"] & np.uint64(nb_gram - 1)).astype(np.int64)
        return out

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("gkey")["doc_id"].transform("nunique")
        out = g.loc[nd.to_numpy() >= 2, ["doc_id", "pos"]].copy()
        out["db"] = exchange.kb_numpy(out["doc_id"].to_numpy(np.int64), nb_doc)
        return out

    dups = (
        ds.map_batches(window_rows, batch_format="pandas")
        .groupby("gb")
        .map_groups(dup_positions, batch_format="pandas")
    )

    # aligned-schema union for the doc-bucket join (text rides once)
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "db": exchange.kb_numpy(df["doc_id"].to_numpy(np.int64), nb_doc),
            "side": np.int64(0),
            "pos": np.int64(-1),
            "text": df["text"].astype(object),
        })

    def tag_dups(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "db": df["db"].astype("int64"),
            "side": np.int64(1),
            "pos": df["pos"].astype("int64"),
            "text": "",
        })

    def clean_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = g.loc[g["side"] == 0, ["doc_id", "text"]]
        starts = g.loc[g["side"] == 1].groupby("doc_id")["pos"].apply(np.sort)
        rows = []
        for i, t in zip(docs["doc_id"], docs["text"]):
            ws = t.split(" ")
            st = starts.get(i)
            if st is None:
                rows.append((int(i), len(ws), 0, t))
                continue
            diff = np.zeros(len(ws) + 1, np.int64)
            np.add.at(diff, st, 1)
            np.add.at(diff, np.minimum(st + SUBSTR_N, len(ws)), -1)
            covered = np.cumsum(diff[:-1]) > 0
            kept = [w for w, c in zip(ws, covered) if not c]
            rows.append((int(i), len(ws), int(covered.sum()), " ".join(kept)))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_words", "n_removed", "clean_text",
        ])

    import ray.data  # noqa: F401 (dataset union below)

    out = (
        ds.map_batches(tag_docs, batch_format="pandas")
        .union(dups.map_batches(tag_dups, batch_format="pandas"))
        .groupby("db")
        .map_groups(clean_bucket, batch_format="pandas")
        .to_pandas()
        .astype({"doc_id": "int64", "n_words": "int64", "n_removed": "int64"})
    )
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DEDUP_SUBSTRING_CLEAN = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), win AS (
  SELECT doc_id, r.i,
         array_to_string(ws[r.i:r.i + {SUBSTR_N - 1}], ' ') AS g
  FROM t, LATERAL (SELECT unnest(range(1, len(ws) - {SUBSTR_N - 2})) AS i) r
  WHERE len(ws) >= {SUBSTR_N}
), shared AS (
  SELECT g FROM win GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
), covered AS (
  SELECT DISTINCT w.doc_id, w.i + o.o AS j
  FROM win w, (SELECT unnest(range(0, {SUBSTR_N})) AS o) o
  WHERE w.g IN (SELECT g FROM shared)
), posns AS (
  SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS j FROM t
), keptw AS (
  SELECT p.doc_id, p.j, p.ws[p.j] AS w
  FROM posns p LEFT JOIN covered c ON p.doc_id = c.doc_id AND p.j = c.j
  WHERE c.doc_id IS NULL
)
SELECT t.doc_id,
       CAST(len(t.ws) AS BIGINT) AS n_words,
       CAST(len(t.ws) - COALESCE(k.nk, 0) AS BIGINT) AS n_removed,
       COALESCE(k.ct, '') AS clean_text
FROM t LEFT JOIN (
  SELECT doc_id, COUNT(*) AS nk, string_agg(w, ' ' ORDER BY j) AS ct
  FROM keptw GROUP BY doc_id
) k USING (doc_id)
ORDER BY t.doc_id
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_canonical": q_dedup_canonical,
    "dedup_clusters_distributed": q_dedup_clusters_distributed,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_nn": q_dedup_embedding_nn,
    "dedup_substring_clean": q_dedup_substring_clean,
    "dup_rate_by_source": q_dup_rate_by_source,
    "cross_source_dup_matrix": q_cross_source_dup_matrix,
}

ORACLE_SQL = {
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_paragraphs": SQL_DEDUP_PARAGRAPHS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_canonical": SQL_DEDUP_CANONICAL,
    "dedup_clusters_distributed": SQL_DEDUP_CLUSTERS,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
    "dedup_jaccard_prefix": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_embedding_nn": SQL_DEDUP_EMBEDDING_NN,
    "dedup_substring_clean": SQL_DEDUP_SUBSTRING_CLEAN,
    "dup_rate_by_source": SQL_DUP_RATE_BY_SOURCE,
    "cross_source_dup_matrix": SQL_CROSS_SOURCE_DUP_MATRIX,
}
