"""HLL sketch properties: mergeability, error bound vs exact distinct,
determinism."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines.sketches import (
    hll_estimate, hll_registers,
)

SF_DIR = "/root/testdata/sf0.001"


class TestHLLKernel:
    def test_merge_equals_union(self):
        a = [f"u{i}" for i in range(500)]
        b = [f"u{i}" for i in range(300, 900)]
        ra, rb = hll_registers(a), hll_registers(b)
        merged = np.maximum(ra, rb)
        assert (merged == hll_registers(a + b)).all()

    def test_error_bound(self):
        for n in (100, 1000, 20000):
            est = hll_estimate(hll_registers([f"user-{i}" for i in range(n)]))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_deterministic(self):
        vals = [f"x{i}" for i in range(777)]
        assert hll_estimate(hll_registers(vals)) == hll_estimate(hll_registers(vals))


@pytest.mark.usefixtures("ray_session")
class TestSketchQueries:
    def test_approx_distinct_close_to_exact(self):
        from crawler_tjce_ray.pipelines.sketches import q_approx_distinct_users

        exact = (
            pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id"])
            .to_pandas()["user_id"].nunique()
        )
        est = q_approx_distinct_users(SF_DIR)["approx_distinct_users"].iloc[0]
        assert abs(est - exact) / exact < 0.05, (exact, est)

    def test_quantiles_match_numpy(self):
        from crawler_tjce_ray.pipelines.sketches import q_value_quantiles

        out = q_value_quantiles(SF_DIR)
        df = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        for _, row in out.iterrows():
            v = df[df["event_type"] == row["event_type"]]["value"].to_numpy()
            assert row["p50"] == pytest.approx(np.quantile(v, 0.5), abs=1e-6)
            assert row["p99"] == pytest.approx(np.quantile(v, 0.99), abs=1e-6)
