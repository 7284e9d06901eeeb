"""Edge-case pins for the round-3 batch-8/9/10 operators — the cases
the sf testdata cannot be relied on to produce:

- ``purchase_id_islands``: an id run crossing the ``>> 10`` range-
  bucket border (the driver's boundary stitch must merge it);
- ``timed_funnel``: a click landing EXACTLY on the 24 h deadline
  (inclusive) and one microsecond past it (excluded);
- ``big_spenders``: a customer sitting exactly at 2× the segment
  average (strict >, so excluded on both engines);
- ``event_dwell``: tied timestamps inside one user (order falls back
  to event_id on both engines);
- ``cohort_matrix``: events straddling a Sunday→Monday week border;
- ``concentration_stats`` / ``assoc_rules`` / ``segment_year_revenue``:
  crafted values checked against the DuckDB oracle, including a
  half-cent revenue term (the floor(x·100+0.5) snap must agree).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines import graph, relational


def _write(d, name, table):
    pq.write_table(table, str(d / f"{name}.parquet"))


def _oracle(d, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    return con


def _events(rows):
    ids, ts, users, types, vals = zip(*rows)
    return pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(pd.to_datetime(list(ts))),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(vals, pa.float64()),
    })


def _cmp(mine, ref):
    a = mine.reset_index(drop=True)[sorted(mine.columns)]
    b = ref.reset_index(drop=True)[sorted(ref.columns)]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_id_islands_stitch_across_range_border(tmp_path):
    # one run 1020..1030 crossing the 1024 bucket border, one run 5..6,
    # one singleton far away — the stitch must yield exactly 3 islands
    rows = [(i, "2024-01-01", 1, "purchase", 0.0)
            for i in [5, 6, *range(1020, 1031), 4000]]
    rows.append((7, "2024-01-01", 1, "click", 0.0))  # non-matching type
    _write(tmp_path, "events", _events(rows))
    out = relational.q_purchase_id_islands(str(tmp_path))
    assert out[["start_id", "end_id", "n_ids"]].values.tolist() == [
        [5, 6, 2], [1020, 1030, 11], [4000, 4000, 1]]
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["purchase_id_islands"]).df())


@pytest.mark.usefixtures("ray_session")
def test_timed_funnel_deadline_inclusive(tmp_path):
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    h24 = pd.Timedelta(hours=24)
    us = pd.Timedelta(microseconds=1)
    rows = [
        # user 1: click exactly at +24h (counts), purchase exactly at
        # click+24h (counts)
        (1, t0, 1, "signup", 0.0),
        (2, t0 + h24, 1, "click", 0.0),
        (3, t0 + h24 + h24, 1, "purchase", 0.0),
        # user 2: click one µs past the deadline (does not count)
        (4, t0, 2, "signup", 0.0),
        (5, t0 + h24 + us, 2, "click", 0.0),
        (6, t0 + h24 + us + us, 2, "purchase", 0.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = graph.q_timed_funnel(str(tmp_path))
    assert out["n_users"].tolist() == [2, 1, 1]
    _cmp(out, _oracle(tmp_path, "events").execute(
        graph.ORACLE_SQL["timed_funnel"]).df())


@pytest.mark.usefixtures("ray_session")
def test_event_dwell_tied_timestamps(tmp_path):
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (10, t0, 1, "click", 0.0),
        (11, t0, 1, "click", 0.0),  # tie: ordered by event_id
        (12, t0 + pd.Timedelta(seconds=5), 1, "click", 0.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = relational.q_event_dwell(str(tmp_path))
    assert out["dwell_us"].tolist() == [0, 5_000_000]
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["event_dwell"]).df())


@pytest.mark.usefixtures("ray_session")
def test_cohort_matrix_week_border(tmp_path):
    rows = [
        # user 1 first appears Sunday (cohort = Mon 2024-01-01's week),
        # returns the following Monday — week_age 1, not 0
        (1, "2024-01-07 23:59:59", 1, "click", 0.0),
        (2, "2024-01-08 00:00:00", 1, "click", 0.0),
        # user 2 lives entirely inside one week
        (3, "2024-01-02 00:00:00", 2, "click", 0.0),
        (4, "2024-01-06 00:00:00", 2, "click", 0.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = relational.q_cohort_matrix(str(tmp_path))
    got = {(str(r.cohort_week.date()), int(r.week_age)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["cohort_matrix"]).df())


@pytest.mark.usefixtures("ray_session")
def test_big_spenders_strict_threshold(tmp_path):
    # segment X: spends 10.00, 20.00, 60.00 (avg 30.00) — 60.00 is
    # exactly 2× the average and must be EXCLUDED (strict >); 61.00 in
    # segment Y (avg 21.00) clears its bar
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "c_mktsegment": pa.array(["X", "X", "X", "Y", "Y", "Y"]),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 60.0, 1.0, 61.0, 1.0],
                                 pa.float64()),
    }))
    out = relational.q_big_spenders(str(tmp_path))
    assert out["custkey"].tolist() == [5]
    _cmp(out, _oracle(tmp_path, "customer", "orders").execute(
        relational.ORACLE_SQL["big_spenders"]).df())


@pytest.mark.usefixtures("ray_session")
def test_concentration_gini_known_values(tmp_path):
    # four customers spending 1, 1, 3, 5 → sorted ranks 1..4,
    # Σr·x = 1 + 2 + 9 + 20 = 32, tot = 10, n = 4:
    # gini = (2·32 − 5·10) / (4·10) = 14/40 = 0.35; top-1% head is
    # ceil(4/100) = 1 customer → share 0.5
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 3.0, 5.0], pa.float64()),
    }))
    out = relational.q_concentration_stats(str(tmp_path))
    assert out.loc[0, "gini"] == pytest.approx(0.35)
    assert out.loc[0, "top1pct_share"] == pytest.approx(0.5)
    _cmp(out, _oracle(tmp_path, "orders").execute(
        relational.ORACLE_SQL["concentration_stats"]).df())


@pytest.mark.usefixtures("ray_session")
def test_assoc_rules_known_baskets(tmp_path):
    # baskets: {A,B} ×3, {A,C} ×1, {B} ×1 → pair (A,B) c=3 with
    # sup(A)=4, sup(B)=4, N=5: conf A→B = 3/4, lift = (3/4)/(4/5)
    ok, pk = [], []
    baskets = [[1, 2], [1, 2], [1, 2], [1, 3], [2]]
    for o, parts in enumerate(baskets):
        for p in parts:
            ok.append(o)
            pk.append(p)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    }))
    out = relational.q_assoc_rules(str(tmp_path))
    r = out.set_index(["p_from", "p_to"])
    assert r.loc[(1, 2), "pair_count"] == 3
    assert r.loc[(1, 2), "conf"] == pytest.approx(0.75)
    assert r.loc[(1, 2), "lift"] == pytest.approx(0.75 / 0.8)
    _cmp(out, _oracle(tmp_path, "lineitem").execute(
        relational.ORACLE_SQL["assoc_rules"]).df())


@pytest.mark.usefixtures("ray_session")
def test_segment_revenue_half_cent_snap(tmp_path):
    # 10.01 × 0.5 is 5.004999… in binary — the cent snap
    # floor(x·100 + 0.5) must agree across engines on half-cent terms
    # (the expectation below applies the identical IEEE ops, so any
    # engine deviating from the snap breaks the _cmp)
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_mktsegment": pa.array(["X"]),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([100], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(["2024-06-01"])),
    }))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([100, 100], pa.int64()),
        "l_extendedprice": pa.array([10.01, 10.03], pa.float64()),
        "l_discount": pa.array([0.5, 0.5], pa.float64()),
    }))
    out = relational.q_segment_year_revenue(str(tmp_path))
    exp = (np.floor(10.01 * 0.5 * 100 + 0.5)
           + np.floor(10.03 * 0.5 * 100 + 0.5)) / 100.0
    assert out.loc[0, "revenue"] == pytest.approx(exp)
    _cmp(out, _oracle(tmp_path, "customer", "orders", "lineitem").execute(
        relational.ORACLE_SQL["segment_year_revenue"]).df())


@pytest.mark.usefixtures("ray_session")
def test_drawdown_known_path(tmp_path):
    # user path 5 → 3 → 8 → 2: peak 8, max drawdown 6
    rows = [
        (1, "2024-01-01 00:00", 1, "click", 5.0),
        (2, "2024-01-01 00:01", 1, "click", 3.0),
        (3, "2024-01-01 00:02", 1, "click", 8.0),
        (4, "2024-01-01 00:03", 1, "click", 2.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = relational.q_drawdown_value_per_user(str(tmp_path))
    assert out.loc[0, "peak_value"] == 8.0
    assert out.loc[0, "max_drawdown"] == 6.0
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["drawdown_value_per_user"]).df())
