"""Tokenizer-parity on adversarial whitespace: the Ray text pipelines
must match their DuckDB oracles on empty documents, double spaces,
tabs, and leading/trailing whitespace — pandas' default .str.split()
drops empty tokens where string_split(text,' ') keeps them (and
divides by zero on '')."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DIRTY_TEXTS = [
    "",                       # empty doc: string_split('',' ') == ['']
    " ",                      # single space: two empty tokens
    "a  b",                   # double space: empty middle token
    "the  fast\tdog",         # tab inside a token (not a ' ' separator)
    "  leading",
    "trailing  ",
    "tab-trailing\t",          # non-space boundary ws: trim() keeps it
    "\nnewline-leading",       # ditto — python strip() would diverge
    "the of and a normal doc with several the tokens",
]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_sf")
    t = pa.table({
        "doc_id": list(range(len(DIRTY_TEXTS))),
        "text": DIRTY_TEXTS,
        "lang": ["en"] * len(DIRTY_TEXTS),
        "source": ["s0"] * len(DIRTY_TEXTS),
        "n_chars": [len(x) for x in DIRTY_TEXTS],
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _oracle(dirty_sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{dirty_sf}/documents.parquet'"
    )
    return con


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", [
    "text_quality", "lang_id_confusion", "token_count", "doc_fingerprint",
    "dedup_exact", "dedup_ngram_jaccard",
])
def test_dirty_whitespace_matches_oracle(name, dirty_sf):
    from crawler_tjce_ray.pipelines.registry import build_oracle_sql, build_queries

    q = build_queries()[name]
    sql = build_oracle_sql()[name]
    mine = q(dirty_sf)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    ref = _oracle(dirty_sf).execute(sql).df()
    a = mine[sorted(mine.columns)].reset_index(drop=True)
    b = ref[sorted(ref.columns)].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
