"""Degenerate-input agreement paths (ADVICE r3): zero-total Pareto,
no-converter quantiles, empty documents source, and the 32-bit
pair-packing guard — each is a path the sf testdata never exercises,
pinned here so the engine and oracle agree on the edge too."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestDegenerateOracleAgreement:
    def test_pareto_8020_zero_total(self, tmp_path):
        """All-zero spend: oracle's 5*cum >= 4*tot holds at rn=1, so
        k=1 and the share is NULL (0/0) — the engine must mirror that
        instead of counting the whole zero-spend tie group."""
        import duckdb

        from crawler_tjce_ray.pipelines.relational import (
            SQL_PARETO_8020, q_pareto_8020,
        )

        _write(tmp_path, "orders", pa.table({
            "o_custkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                [pd.Timestamp("2024-01-01")] * 3,
                pa.timestamp("us")),
            "o_totalprice": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }))
        got = q_pareto_8020(str(tmp_path))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{tmp_path}/orders.parquet')")
        want = con.execute(SQL_PARETO_8020).df()
        assert int(got["n_customers"][0]) == int(want["n_customers"][0]) == 3
        assert int(got["top_k_for_80pct"][0]) \
            == int(want["top_k_for_80pct"][0]) == 1
        assert math.isnan(got["top_k_share"][0])
        assert want["top_k_share"].isna().iloc[0]

    def test_time_to_convert_no_converters(self, tmp_path):
        """No signup→purchase pairs: the oracle's quantile_disc over an
        empty set is NULL, so the engine emits NaN, not 0.0."""
        from crawler_tjce_ray.pipelines.graph import q_time_to_convert

        _write(tmp_path, "events", pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
            "event_type": pa.array(["view", "view"], pa.string()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 2,
                           pa.timestamp("us")),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }))
        got = q_time_to_convert(str(tmp_path))
        assert int(got["n_converters"][0]) == 0
        assert math.isnan(got["median_s"][0])
        assert math.isnan(got["p90_s"][0])

    def test_documents_max_doc_id_empty_raises(self, tmp_path):
        """An empty non-parquet documents source raises a descriptive
        error instead of an opaque NaN-cast ValueError."""
        from crawler_tjce_ray.sources.docs import documents_max_doc_id

        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "text": pd.Series([], dtype="object"),
        })
        (tmp_path / "documents.jsonl").write_text(
            empty.to_json(orient="records", lines=True))
        with pytest.raises(ValueError, match="no rows"):
            documents_max_doc_id(str(tmp_path))

    def test_pair_packing_guard(self, tmp_path):
        """Partkeys at or above 2^32 must be rejected by the packed-pair
        kernels, not silently corrupted."""
        from crawler_tjce_ray.pipelines.relational import q_part_cooccurrence

        _write(tmp_path, "lineitem", pa.table({
            "l_orderkey": pa.array([1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 2], pa.int64()),
            "l_partkey": pa.array([5, 1 << 32], pa.int64()),
        }))
        with pytest.raises(Exception, match="32-bit packing range"):
            q_part_cooccurrence(str(tmp_path))
