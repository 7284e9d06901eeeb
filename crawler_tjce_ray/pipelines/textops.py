"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline side of the engine (language-ID, quality
scoring, token counting, fingerprinting).

Every stage is a stateless ``map_batches`` over zero-copy Arrow (or
pandas where the kernel needs it); per-doc work is vectorized
pyarrow.compute / numpy — no Python loop over rows in the hot path
except the per-row hash digests (C-implemented hashlib, O(bytes)).

Scale notes: all queries are embarrassingly parallel per-document maps
with a final small sort — no shuffle except the tiny confusion-matrix
groupby in ``lang_id_confusion``.  At 100 TB each stage streams block
by block; nothing materializes the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Both pyarrow.compute and DuckDB use RE2 — identical match semantics
# keeps the Ray result byte-identical to the oracle.
WS_TOKEN_RE = r"\S+"
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# Tiny function-word lists for the n-gram/stopword language heuristic
# (reference analog: the pt-BR-vs-US disambiguation heuristics of
# crawler/crawler.py:119-139 — dispatch on surface statistics).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "a", "in", "to", "is", "for", "with", "on"],
    "es": ["el", "la", "de", "que", "y", "los", "del", "las", "por", "una"],
    "fr": ["le", "la", "les", "des", "et", "une", "du", "dans", "est", "pour"],
    "de": ["der", "die", "und", "das", "von", "den", "mit", "ist", "ein", "im"],
}
EN_STOPWORDS = set(LANG_STOPWORDS["en"])


def _read_docs(sf_dir: str, columns):
    """Pruned read of the documents table, split into enough blocks to
    keep every CPU busy (the table ships as one parquet file — without
    ``override_num_blocks`` the whole corpus lands in a single block
    and every per-batch stage runs serially)."""
    import ray
    import ray.data as rd

    cpus = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns,
        override_num_blocks=max(8, min(32, cpus // 4)),
    )


# ---------------------------------------------------------------------------
# token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    """Token counting: whitespace tokens and a BPE-ish regex token
    count per document.  Pure vectorized RE2 kernels
    (``pc.count_substring_regex``) — zero-copy Arrow in, Arrow out."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_ws_tokens": pc.cast(
                pc.count_substring_regex(text, WS_TOKEN_RE), pa.int64()
            ),
            "n_re_tokens": pc.cast(
                pc.count_substring_regex(pc.utf8_lower(text), BPE_TOKEN_RE),
                pa.int64(),
            ),
        })

    out = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
            AS BIGINT) AS n_re_tokens
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def q_text_quality(sf_dir: str):
    """Quality scoring: length / mean-token-length / stopword-ratio
    per document plus a keep/drop flag.  All ratios are exact IEEE
    divisions of integer counts, so the doubles are bit-identical to
    the DuckDB oracle (no rounding needed)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        # literal-space split: DuckDB string_split(text,' ') keeps empty
        # tokens on irregular whitespace (and yields 1 token for '') —
        # pandas .str.split() without args would drop them and divide
        # by zero on empty docs
        toks = df["text"].str.split(" ")
        n_tokens = toks.str.len().astype("int64")
        n_alpha = (
            df["text"].str.replace(r"\s", "", regex=True).str.len().astype("int64")
        )
        stop_hits = toks.map(
            lambda ts: sum(1 for w in ts if w in EN_STOPWORDS)
        ).astype("int64")
        out = pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_chars": df["text"].str.len().astype("int64"),
            "n_tokens": n_tokens,
            "mean_token_len": n_alpha / n_tokens,
            "stopword_ratio": stop_hits / n_tokens,
        })
        out["quality_ok"] = (
            (out["n_tokens"] >= 20) & (out["stopword_ratio"] >= 0.02)
        ).astype("int64")
        return out

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_EN_SQL_LIST = ",".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

SQL_TEXT_QUALITY = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(string_split(text,' ')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text,'\s','','g')) AS BIGINT) AS n_alpha,
         CAST(length(list_filter(string_split(text,' '),
              x -> x IN ({_EN_SQL_LIST}))) AS BIGINT) AS stop_hits
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_alpha AS DOUBLE)/n_tokens AS mean_token_len,
       CAST(stop_hits AS DOUBLE)/n_tokens AS stopword_ratio,
       CAST(n_tokens >= 20 AND CAST(stop_hits AS DOUBLE)/n_tokens >= 0.02
            AS BIGINT) AS quality_ok
FROM t ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# language identification (stopword-vote heuristic) + confusion matrix
# ---------------------------------------------------------------------------

def q_lang_id_confusion(sf_dir: str):
    """Language-ID by stopword vote (n-gram heuristic family), then a
    confusion matrix against the labeled ``lang`` column.  The per-doc
    predict is a stateless map; the groupby key-space is |langs|² — the
    shuffle moves only pre-reduced partials."""
    from ray.data.aggregate import Count

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    order = ["en", "es", "fr", "de"]  # deterministic tie-break priority
    stop_sets = {k: set(v) for k, v in LANG_STOPWORDS.items()}

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for ts in df["text"].str.split(" "):  # oracle-identical split
            hits = {k: sum(1 for w in ts if w in s) for k, s in stop_sets.items()}
            best = max(order, key=lambda k: (hits[k], -order.index(k)))
            preds.append(best if hits[best] > 0 else "unk")
        return pd.DataFrame({"lang": df["lang"], "lang_pred": preds})

    out = (
        ds.map_batches(predict, batch_format="pandas")
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def _hits_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"length(list_filter(string_split(text,' '), x -> x IN ({words})))"
        f" AS h_{lang}"
    )


SQL_LANG_ID_CONFUSION = f"""
WITH h AS (
  SELECT lang, {_hits_sql('en')}, {_hits_sql('es')}, {_hits_sql('fr')},
         {_hits_sql('de')}
  FROM documents),
p AS (
  SELECT lang,
         CASE
           WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de AND h_en > 0
             THEN 'en'
           WHEN h_es >= h_fr AND h_es >= h_de AND h_es > 0 THEN 'es'
           WHEN h_fr >= h_de AND h_fr > 0 THEN 'fr'
           WHEN h_de > 0 THEN 'de'
           ELSE 'unk'
         END AS lang_pred
  FROM h)
SELECT lang, lang_pred, COUNT(*) AS n FROM p
GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def normalize_text_series(s: pd.Series) -> pd.Series:
    """lower → trim → collapse whitespace (the dedup/fingerprint
    canonical form; analog of the reference's slugify normalization,
    schemas/entity_mapping.py:7-28)."""
    return (
        s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    )


def q_doc_fingerprint(sf_dir: str):
    """Exact document fingerprint: md5 of the normalized text.  The
    digest loop is C-level hashlib over the normalized bytes."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        norm = normalize_text_series(df["text"])
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fp": [hashlib.md5(x.encode()).hexdigest() for x in norm],
        })

    out = ds.map_batches(fp, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling-hash; Schleimer et al. 2003) — non-SQL
# ---------------------------------------------------------------------------

_WINNOW_K = 5  # k-gram size (tokens)
_WINNOW_W = 4  # window size
_HASH_P = np.uint64(1099511628211)  # FNV-ish multiplier


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes (FNV-1a), vectorization-ready."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = np.uint64(14695981039346656037)
        for b in tok.encode():
            h = np.uint64((int(h) ^ b) * 1099511628211 % (1 << 64))
        out[i] = h
    return out


def winnow_doc(tokens: list[str]) -> np.ndarray:
    """Winnowing: rolling polynomial hash over k-grams, min per sliding
    window, de-duplicated positions — the classic local fingerprint."""
    th = token_hashes(tokens)
    n = len(th)
    if n < _WINNOW_K:
        return np.unique(th) if n else np.empty(0, dtype=np.uint64)
    # polynomial rolling hash of k-grams, fully vectorized
    powers = np.array(
        [int(_HASH_P) ** i % (1 << 64) for i in range(_WINNOW_K)][::-1],
        dtype=np.uint64,
    )
    m = n - _WINNOW_K + 1
    idx = np.arange(m)[:, None] + np.arange(_WINNOW_K)[None, :]
    grams = (th[idx] * powers[None, :]).sum(axis=1, dtype=np.uint64)
    if m <= _WINNOW_W:
        return np.unique(grams[[int(np.argmin(grams))]])
    widx = np.arange(m - _WINNOW_W + 1)[:, None] + np.arange(_WINNOW_W)[None, :]
    windows = grams[widx]
    picks = widx[np.arange(len(widx)), windows.argmin(axis=1)]
    return np.unique(grams[np.unique(picks)])


def q_winnow_fingerprint(sf_dir: str):
    """Winnowing fingerprints per doc: count + xor-fold of the selected
    hashes (stable summary the driver can hash).  Non-SQL (rolling-hash
    windows aren't DuckDB-expressible) → rows-only check; kernel
    correctness is pinned by tests/test_textops.py."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sel = winnow_doc(text.split())
            fold = np.uint64(0)
            for h in sel:
                fold ^= h
            rows.append((doc_id, len(sel), int(fold % np.uint64(1 << 63))))
        return pd.DataFrame(
            rows, columns=["doc_id", "n_fingerprints", "fp_fold"]
        ).astype({"n_fingerprints": "int64", "fp_fold": "int64"})

    out = ds.map_batches(fp, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES = {
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "lang_id_confusion": q_lang_id_confusion,
    "doc_fingerprint": q_doc_fingerprint,
    "winnow_fingerprint": q_winnow_fingerprint,
}

ORACLE_SQL = {
    "token_count": SQL_TOKEN_COUNT,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id_confusion": SQL_LANG_ID_CONFUSION,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
}
