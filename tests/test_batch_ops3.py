"""Edge-case pins for the batch-16/17/19/20/21/22 operators: an ABC
tie-group straddling BOTH class boundaries, a single-week churn
corpus, single-order customers in the gap median, and orders with no
lineitems in the reconciliation."""

import pandas as pd
import pyarrow as pa
import pytest

from crawler_tjce_ray.pipelines import relational

from tests.test_batch_ops import _cmp, _events, _oracle, _write


@pytest.mark.usefixtures("ray_session")
def test_abc_equal_spends_straddle_both_boundaries(tmp_path):
    # ten equal customers: the single tie-group spans A (7), B (2)
    # and C (1) — the two-boundary walk must split it exactly like
    # the oracle's cum-before rule
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array(list(range(1, 11)), pa.int64()),
        "o_totalprice": pa.array([10.0] * 10, pa.float64()),
    }))
    out = relational.q_abc_classification(str(tmp_path))
    assert out["n_customers"].tolist() == [7, 2, 1]
    _cmp(out, _oracle(tmp_path, "orders").execute(
        relational.ORACLE_SQL["abc_classification"]).df())


@pytest.mark.usefixtures("ray_session")
def test_weekly_churn_single_week_is_empty(tmp_path):
    rows = [
        (1, "2024-01-02 10:00:00", 1, "click", 0.0),
        (2, "2024-01-03 10:00:00", 2, "click", 0.0),
    ]
    _write(tmp_path, "events", _events(rows))
    out = relational.q_weekly_churn(str(tmp_path))
    assert len(out) == 0
    _cmp(out, _oracle(tmp_path, "events").execute(
        relational.ORACLE_SQL["weekly_churn"]).df())


@pytest.mark.usefixtures("ray_session")
def test_median_gap_drops_single_order_customers(tmp_path):
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(
            ["2024-01-01", "2024-01-04", "2024-01-06", "2024-01-01"])),
    }))
    out = relational.q_median_order_gap(str(tmp_path))
    # customer 1: gaps [3, 2] → sorted [2, 3], ⌈2/2⌉ = 1st → 2;
    # customer 2 has one order and must drop
    assert out["o_custkey"].tolist() == [1]
    assert out["median_gap_days"].tolist() == [2]
    _cmp(out, _oracle(tmp_path, "orders").execute(
        relational.ORACLE_SQL["median_order_gap"]).df())


@pytest.mark.usefixtures("ray_session")
def test_reconciliation_orphan_order(tmp_path):
    # order 2 has NO lineitems: its lineitem side must COALESCE to 0
    # on both engines, showing up as a pure header-side delta
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderdate": pa.array(pd.to_datetime(["2024-03-01", "2024-03-02"])),
        "o_totalprice": pa.array([100.0, 50.0], pa.float64()),
    }))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([100.0], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
    }))
    out = relational.q_revenue_reconciliation(str(tmp_path))
    assert out.loc[0, "header_total"] == pytest.approx(150.0)
    assert out.loc[0, "lineitem_total"] == pytest.approx(100.0)
    assert out.loc[0, "delta"] == pytest.approx(50.0)
    _cmp(out, _oracle(tmp_path, "orders", "lineitem").execute(
        relational.ORACLE_SQL["revenue_reconciliation"]).df())
