"""Format-agnostic documents source: the registry's text queries must
produce IDENTICAL results whether the corpus arrives as Parquet, JSONL
or CSV (sources/docs.py resolution order)."""

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def mirrors(tmp_path_factory):
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    df = t.to_pandas()
    jd = tmp_path_factory.mktemp("docs_jsonl")
    df.to_json(str(jd / "documents.jsonl"), orient="records", lines=True)
    cd = tmp_path_factory.mktemp("docs_csv")
    df.to_csv(str(cd / "documents.csv"), index=False)
    return str(jd), str(cd)


@pytest.mark.usefixtures("ray_session")
def test_text_queries_identical_across_formats(mirrors):
    from crawler_tjce_ray.pipelines import textops, webtext

    jd, cd = mirrors
    for q in [textops.QUERIES["text_ttr"], webtext.QUERIES["ngram_novelty"]]:
        base = q("/root/testdata/sf0.001").reset_index(drop=True)
        for d in (jd, cd):
            got = q(d).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, base)


@pytest.mark.usefixtures("ray_session")
def test_missing_table_raises(tmp_path):
    from crawler_tjce_ray.sources.docs import read_documents

    with pytest.raises(FileNotFoundError):
        read_documents(str(tmp_path))


@pytest.mark.usefixtures("ray_session")
def test_dedup_and_growth_queries_on_jsonl(mirrors):
    """The auxiliary probes (row count, max doc_id, cache mtime) must
    also survive a parquet-less corpus."""
    from crawler_tjce_ray.pipelines import webtext

    jd, _cd = mirrors
    base = webtext.QUERIES["vocab_growth"]("/root/testdata/sf0.001")
    got = webtext.QUERIES["vocab_growth"](jd)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), base.reset_index(drop=True)
    )
