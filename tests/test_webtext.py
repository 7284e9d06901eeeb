"""Unit pins for the webtext curation operators beyond the oracle
parity suite: the discrete-quantile rule, planted contamination, and
the PII kernels on hand-built edge cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from crawler_tjce_ray.pipelines.webtext import (
    DECON_MOD,
    DECON_N,
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    _doc_ngrams,
    _quantile_disc,
)


@pytest.mark.parametrize("q", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
@pytest.mark.parametrize(
    "values",
    [
        [7],
        [1, 2],
        [5, 5, 5, 5],
        [1, 1, 2, 3, 3, 3, 9],
        list(range(100)),
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
    ],
)
def test_quantile_disc_matches_duckdb(values, q):
    """The histogram-based quantile must reproduce DuckDB's
    quantile_disc exactly, including duplicate-heavy multisets."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in values)
        + ") v(x)"
    )
    want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
    hist = (
        pd.Series(values).value_counts().rename_axis("value").reset_index(name="n")
    )
    assert _quantile_disc(hist, q) == want


def test_doc_ngrams_window_and_dedup():
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b c d e f",          # two 5-grams
            "x y z",                # too short -> none
            "a b a b a b a b a b",  # repeated: distinct grams only
        ],
    })
    g = _doc_ngrams(df, DECON_N)
    by_doc = g.groupby("doc_id")["ng"].apply(list).to_dict()
    assert by_doc[1] == ["a b c d e", "b c d e f"]
    assert 2 not in by_doc
    # 10 words -> 6 positions but only 2 distinct 5-grams
    assert sorted(by_doc[3]) == ["a b a b a", "b a b a b"]


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    """A corpus doc sharing an exact 5-gram with a benchmark doc is
    flagged; unrelated docs are not."""
    from crawler_tjce_ray.pipelines.webtext import q_decontaminate

    bench_id = DECON_MOD * 3  # % DECON_MOD == 0 -> benchmark member
    shared = "the quick brown fox jumps"
    docs = pd.DataFrame({
        "doc_id": [bench_id, 1, 2],
        "text": [
            f"prefix {shared} suffix words here",
            f"copied verbatim {shared} into this doc",
            "completely different content with no overlap at all",
        ],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [10, 10, 10],
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = q_decontaminate(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_shared"] >= 1
    assert out.loc[2, "contaminated"] == 0 and out.loc[2, "n_shared"] == 0
    assert bench_id not in out.index  # benchmark rows are excluded


def test_pii_regexes_arrow_kernels():
    """The RE2 patterns hit emails/IPs/phones and leave look-alikes
    alone — counted and replaced identically."""
    text = pa.array([
        "mail bob.smith+x@example.co.uk now",
        "server at 192.168.0.1 and 10.0.0.255.",
        "call +555-1234-5678 or 555 123 4567",
        "versions 1.2.3 and v10.20 are not IPs; a@b no TLD",
    ])
    assert pc.count_substring_regex(text, EMAIL_RE).to_pylist() == [1, 0, 0, 0]
    assert pc.count_substring_regex(text, IPV4_RE).to_pylist() == [0, 2, 0, 0]
    assert pc.count_substring_regex(text, PHONE_RE).to_pylist() == [0, 0, 2, 0]
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    assert red[0].as_py() == "mail <EMAIL> now"
    # 1.2.3 must survive the IPv4 scrub (three octets only)
    red2 = pc.replace_substring_regex(text, IPV4_RE, "<IP>")
    assert red2[3].as_py() == text[3].as_py()


def test_repetition_stats_hand_case(ray_session, tmp_path):
    from crawler_tjce_ray.pipelines.webtext import q_repetition_stats

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aa\nbb\naa\ncc", "unique\nlines\nonly"],
        "lang": ["en", "en"],
        "source": ["t", "t"],
        "n_chars": [11, 17],
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = q_repetition_stats(str(tmp_path)).set_index("doc_id")
    # doc 1: 4 lines, 3 distinct; dup chars = 2*2 of total 8
    assert out.loc[1, "n_lines"] == 4
    assert out.loc[1, "dup_line_frac"] == pytest.approx(0.25)
    assert out.loc[1, "dup_char_frac"] == pytest.approx(4 / 8)
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[2, "dup_char_frac"] == 0.0


def test_bigram_logprob_short_docs(tmp_path):
    """Docs with < 2 tokens have no bigrams: n_bigrams 0, score 0.0 —
    the left-join fillna branch, checked against the oracle."""
    import duckdb
    import pandas as pd

    from crawler_tjce_ray.pipelines.webtext import (
        SQL_BIGRAM_LOGPROB, q_bigram_logprob,
    )

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["", "single", "two words", "a b a b a"],
        "lang": ["en"] * 4,
        "source": ["t"] * 4,
        "n_chars": [0, 6, 9, 9],
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    mine = q_bigram_logprob(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    ref = con.execute(SQL_BIGRAM_LOGPROB).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), ref, check_dtype=False)
    assert mine.set_index("doc_id").loc[0, "n_bigrams"] == 0
    assert mine.set_index("doc_id").loc[1, "n_bigrams"] == 0
    assert mine.set_index("doc_id").loc[3, "n_bigrams"] == 4


class TestExplodeWordsArrowEquivalence:
    def test_matches_pandas_findall(self):
        """The RE2 complement-split tokenizer must equal the original
        findall(WORD_RE) semantics on edge shapes: empties, punctuation
        runs, unicode, leading/trailing separators, digit mixes."""
        import pandas as pd

        from crawler_tjce_ray.pipelines.webtext import WORD_RE, _explode_words

        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                "Hello, World!  42x y9",
                "",
                "---!!!---",
                "UPPER lower MiXeD",
                "café naïve — unicode, words",
                "  leading and trailing  ",
            ],
        })
        words = df["text"].str.lower().str.findall(WORD_RE)
        want = pd.DataFrame({"doc_id": df["doc_id"], "w": words}).explode(
            "w", ignore_index=True
        ).dropna(subset=["w"]).reset_index(drop=True)
        got = _explode_words(df).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"doc_id": "int64", "w": object}),
            want.astype({"doc_id": "int64", "w": object}))

    def test_empty_frame(self):
        import pandas as pd

        from crawler_tjce_ray.pipelines.webtext import _explode_words

        out = _explode_words(pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype=object),
        }))
        assert out.empty and list(out.columns) == ["doc_id", "w"]
