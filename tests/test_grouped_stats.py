"""Degenerate-group coverage for the grouped moment/regression
queries: DuckDB returns NULL for skewness below n=3, kurtosis below
n=4, and any regression statistic at zero x-variance (and R² = 1.0 at
zero y-variance).  The sf testdata never produces such groups, so
this crafted lineitem pins the NULL rules on both engines."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines import relational

# flag -> (quantities, prices)
GROUPS = {
    "1": ([5.0], [10.0]),                      # n=1: everything NULL
    "2": ([1.0, 2.0], [2.0, 3.0]),             # n=2: skew/kurt NULL, regr defined
    "3": ([1.0, 2.0, 3.0], [2.0, 3.0, 5.0]),   # n=3: kurt NULL
    "C": ([4.0] * 5, [1.0, 3.0, 5.0, 7.0, 9.0]),  # const x: all NULL
    "Y": ([1.0, 2.0, 3.0, 4.0], [5.0] * 4),       # const y: r2 = 1.0
    "G": ([1.0, 2.0, 2.0, 3.0, 7.0, 9.0, 4.0],
          [2.0, 4.0, 5.0, 7.0, 15.0, 19.0, 9.0]),  # healthy group
}


@pytest.fixture(scope="module")
def lineitem_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("li_degenerate")
    flags, qty, price = [], [], []
    for f, (qs, ps) in GROUPS.items():
        flags += [f] * len(qs)
        qty += qs
        price += ps
    t = pa.table({
        "l_returnflag": pa.array(flags),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
    })
    pq.write_table(t, str(d / "lineitem.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def oracle(lineitem_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{lineitem_dir}/lineitem.parquet'"
    )
    return con


@pytest.mark.usefixtures("ray_session")
def test_qty_moments_degenerate_groups(lineitem_dir, oracle):
    mine = relational.q_qty_moments_by_flag(lineitem_dir)
    ref = oracle.execute(relational.ORACLE_SQL["qty_moments_by_flag"]).df()
    m = mine.set_index("l_returnflag")
    assert np.isnan(m.loc["1", "skew_qty"]) and np.isnan(m.loc["1", "kurt_qty"])
    assert np.isnan(m.loc["2", "skew_qty"])  # n=2
    assert m.loc["3", "skew_qty"] == 0.0 and np.isnan(m.loc["3", "kurt_qty"])
    assert np.isnan(m.loc["C", "skew_qty"]) and np.isnan(m.loc["C", "kurt_qty"])
    assert not np.isnan(m.loc["G", "skew_qty"])
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.usefixtures("ray_session")
def test_regr_degenerate_groups(lineitem_dir, oracle):
    mine = relational.q_regr_price_qty(lineitem_dir)
    ref = oracle.execute(relational.ORACLE_SQL["regr_price_qty"]).df()
    m = mine.set_index("l_returnflag")
    for c in ("slope", "intercept", "r2"):
        assert np.isnan(m.loc["1", c]) and np.isnan(m.loc["C", c])
    assert m.loc["2", "r2"] == 1.0          # perfect 2-point line
    assert m.loc["Y", "slope"] == 0.0 and m.loc["Y", "r2"] == 1.0
    assert not np.isnan(m.loc["G", "slope"])
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )
