"""Branch coverage for the Gopher-rule and C4-filter queries on a
crafted corpus: the sf testdata documents are single-line word soup
with no terminal punctuation, so the keep/reassembly paths only fire
on documents built to trip each rule.  Both engines run on the same
temp parquet and must agree bit-for-bit."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines import webtext

GOOD_LINE = "the quick brown foxes and the lazy hounds of a farm in town."
GOOD_DOC = "\n".join([GOOD_LINE] * 5)
DOCS = [
    # keeper: 4 punctuated multi-word lines, stopwords, sane lengths
    (0, GOOD_DOC),
    # dropped doc-level: contains a brace
    (1, GOOD_DOC + " {"),
    # dropped doc-level: lorem ipsum marker
    (2, "Lorem Ipsum dolor sit amet.\n" + GOOD_DOC),
    # only 2 surviving lines -> c4 keep = 0
    (3, "\n".join([GOOD_LINE] * 2 + ["no punct line here"])),
    # javascript line dropped, still 3 good lines -> keep = 1
    (4, "\n".join([GOOD_LINE] * 3 + ["enable JavaScript to view this."])),
    # short line (< 3 words) dropped despite punctuation
    (5, "\n".join([GOOD_LINE] * 3 + ["ok."])),
    # gopher: too few words, bullet lines, ellipses, symbols
    (6, "- a.\n- b.\n- c.\nfoo..."),
    # gopher: no stopwords, all-numeric words
    (7, " ".join(["123 456"] * 40)),
    # empty text
    (8, ""),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("c4corpus")
    t = pa.table({
        "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
        "text": pa.array([s for _, s in DOCS], pa.string()),
        "lang": pa.array(["en"] * len(DOCS)),
        "source": pa.array(["unit"] * len(DOCS)),
        "n_chars": pa.array([len(s) for _, s in DOCS], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def oracle(corpus_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{corpus_dir}/documents.parquet'"
    )
    return con


@pytest.mark.usefixtures("ray_session")
def test_c4_filters_branches(corpus_dir, oracle):
    mine = webtext.q_c4_filters(corpus_dir).reset_index(drop=True)
    ref = oracle.execute(webtext.SQL_C4_FILTERS).df()
    # every branch is exercised: keeps, doc-level drops, line drops
    assert mine["keep"].tolist() == [1, 0, 0, 0, 1, 1, 0, 0, 0]
    assert mine.loc[0, "clean_text"] == GOOD_DOC
    assert mine.loc[4, "n_kept_lines"] == 3  # javascript line gone
    assert mine.loc[5, "n_kept_lines"] == 3  # short line gone
    assert mine.loc[8, "n_lines"] == 1 and mine.loc[8, "n_kept_lines"] == 0
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], ref[sorted(ref.columns)],
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_gopher_rules_branches(corpus_dir, oracle):
    mine = webtext.q_gopher_rules(corpus_dir).reset_index(drop=True)
    ref = oracle.execute(webtext.SQL_GOPHER_RULES).df()
    m = mine.set_index("doc_id")
    # doc 0 passes every rule
    assert m.loc[0, "keep"] == 1
    # doc 6: bullets + ellipsis + too few words
    assert m.loc[6, "keep"] == 0 and m.loc[6, "bullet_frac"] > 0.5
    assert m.loc[6, "ellipsis_frac"] > 0
    # doc 7: zero alphabetic words, zero stopword kinds
    assert m.loc[7, "alpha_word_frac"] == 0.0
    assert m.loc[7, "n_stop_kinds"] == 0 and m.loc[7, "keep"] == 0
    # doc 8: empty text -> all-zero signals, no NaNs anywhere
    assert m.loc[8, "n_words"] == 0 and m.loc[8, "mean_word_len"] == 0.0
    assert not mine.isna().any().any()
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], ref[sorted(ref.columns)],
        check_dtype=False,
    )
