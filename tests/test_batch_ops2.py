"""Edge-case pins for the round-3 batch-12/13/14/15 operators: rank
ties at top-k cuts, degenerate groups, threshold ties, reciprocity on
a hand-built graph — the boundary semantics the sf data can't be
relied on to exercise."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines import graph, relational, sketches

from tests.test_batch_ops import _cmp, _events, _oracle, _write


@pytest.mark.usefixtures("ray_session")
def test_price_cv_tie_block_cut(tmp_path):
    # 25 parts share an identical price multiset (identical CV); the
    # top-20 cut lands inside the tie block and must resolve by
    # partkey ascending on both engines.  Part 99 has n=4 (< min 5)
    # and must be excluded entirely.
    pk, price = [], []
    for p in range(1, 26):
        pk += [p] * 5
        price += [100.0, 100.0, 200.0, 200.0, 300.0]
    pk += [99] * 4
    price += [1.0, 2.0, 3.0, 4.0]
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array(pk, pa.int64()),
        "l_extendedprice": pa.array(price, pa.float64()),
    }))
    out = relational.q_price_cv_topk(str(tmp_path))
    assert out["l_partkey"].tolist() == list(range(1, 21))
    _cmp(out, _oracle(tmp_path, "lineitem").execute(
        relational.ORACLE_SQL["price_cv_topk"]).df())


@pytest.mark.usefixtures("ray_session")
def test_top_paths_count_tie_order(tmp_path):
    # paths "x>y" and "y>x" tie at 2 users each; rank order falls back
    # to path ascending in both engines
    rows = []
    eid = 0
    for u, seq in [(1, "xy"), (2, "xy"), (3, "yx"), (4, "yx"), (5, "x")]:
        for i, t in enumerate(seq):
            rows.append((eid, pd.Timestamp("2024-01-01") +
                         pd.Timedelta(minutes=i), u, t, 0.0))
            eid += 1
    _write(tmp_path, "events", _events(rows))
    out = relational.q_top_paths(str(tmp_path))
    assert out["path"].tolist() == ["x>y", "y>x", "x"]
    assert out["n_users"].tolist() == [2, 2, 1]
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["top_paths"]).df())


@pytest.mark.usefixtures("ray_session")
def test_lorenz_all_equal_spend_single_decile(tmp_path):
    # every customer spends the same → all nine thresholds equal the
    # value, every customer lands in decile 1, cumulative share 1.0
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array(list(range(1, 13)), pa.int64()),
        "o_totalprice": pa.array([42.0] * 12, pa.float64()),
    }))
    out = sketches.q_lorenz_deciles(str(tmp_path))
    assert out["decile"].tolist() == [1]
    assert out["n_customers"].tolist() == [12]
    assert out.loc[0, "cum_share"] == pytest.approx(1.0)
    _cmp(out, _oracle(tmp_path, "orders").execute(
        sketches.ORACLE_SQL["lorenz_deciles"]).df())


@pytest.mark.usefixtures("ray_session")
def test_grouped_mad_constant_group(tmp_path):
    # type "c" is constant → MAD 0; type "v" = {1,2,9}: median 2,
    # deviations {1,0,7} → MAD 1
    rows = [
        (1, "2024-01-01 00:00:00", 1, "c", 5.0),
        (2, "2024-01-01 00:01:00", 1, "c", 5.0),
        (3, "2024-01-01 00:02:00", 1, "c", 5.0),
        (4, "2024-01-01 00:03:00", 2, "v", 1.0),
        (5, "2024-01-01 00:04:00", 2, "v", 2.0),
        (6, "2024-01-01 00:05:00", 2, "v", 9.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = sketches.q_grouped_mad_value(str(tmp_path))
    m = out.set_index("event_type")
    assert m.loc["c", "mad_value"] == 0.0
    assert m.loc["v", "median_value"] == 2.0
    assert m.loc["v", "mad_value"] == 1.0
    _cmp(out, _oracle(tmp_path, "events").execute(
        sketches.ORACLE_SQL["grouped_mad_value"]).df())


@pytest.mark.usefixtures("ray_session")
def test_edge_reciprocity_known_graph(tmp_path):
    # order 1 sequence [1,2,1] → edges 1→2 and 2→1 (reciprocal pair);
    # order 2 [3,4] → 3→4 one-way; order 3 [5,5] → self-loop, excluded
    ok = [1, 1, 1, 2, 2, 3, 3]
    ln = [1, 2, 3, 1, 2, 1, 2]
    pk = [1, 2, 1, 3, 4, 5, 5]
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_partkey": pa.array(pk, pa.int64()),
    }))
    out = graph.q_edge_reciprocity(str(tmp_path))
    assert out.loc[0, "n_edges"] == 3
    assert out.loc[0, "n_reciprocal"] == 2
    assert out.loc[0, "reciprocity"] == pytest.approx(round(2 / 3, 6))
    _cmp(out, _oracle(tmp_path, "lineitem").execute(
        graph.ORACLE_SQL["edge_reciprocity"]).df())


@pytest.mark.usefixtures("ray_session")
def test_vocab_growth_short_docs_excluded(tmp_path):
    # doc 10: 8 words (one gram); doc 20: same gram again (not new) +
    # a second distinct gram; doc 5: 3 words → no gram at all
    g1 = "w1 w2 w3 w4 w5 w6 w7 w8"
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([5, 10, 20], pa.int64()),
        "text": pa.array(["a b c", g1, g1 + " w9"]),
    }))
    from crawler_tjce_ray.pipelines import webtext

    res = webtext.q_vocab_growth(str(tmp_path))
    # mx = 20 → cutoffs 2,4,...,20; gram1 first at doc 10 (decile 5),
    # gram2 ("w2..w9") first at doc 20 (decile 10)
    assert res["vocab_size"].tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 1, 2]
    _cmp(res, _oracle(tmp_path, "documents").execute(
        webtext.ORACLE_SQL["vocab_growth"]).df())
