"""Resumable bulk extraction: skip-finished shards, atomic partitions,
identical results after an interrupted run."""

import os
import shutil

import pytest

from crawler_tjce_ray.pipelines.resumable import (
    extract_records_resumable, read_records,
)
from crawler_tjce_ray.sources.pages import corpus_cache_dir


@pytest.mark.usefixtures("ray_session")
class TestResumable:
    def test_full_run_then_resume_skips_everything(self, tmp_path):
        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        out = str(tmp_path / "records")
        r1 = extract_records_resumable(pages, "precatorios", out)
        assert r1["shards_done"] == r1["shards_total"] > 0
        assert r1["rows"] > 0
        n1 = read_records(out).count()

        r2 = extract_records_resumable(pages, "precatorios", out)
        assert r2["shards_skipped"] == r2["shards_total"]
        assert r2["shards_done"] == 0 and r2["rows"] == 0
        assert read_records(out).count() == n1

    def test_interrupted_run_redoes_only_missing_shards(self, tmp_path):
        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        out = str(tmp_path / "records")
        full = extract_records_resumable(pages, "precatorios", out)
        n_full = read_records(out).count()

        # simulate a crash: wipe two shard partitions
        shard_dirs = sorted(
            d for d in os.listdir(out) if d.startswith("shard=")
        )[:2]
        for d in shard_dirs:
            shutil.rmtree(os.path.join(out, d))

        r = extract_records_resumable(pages, "precatorios", out)
        assert r["shards_done"] == 2
        assert r["shards_skipped"] == full["shards_total"] - 2
        assert read_records(out).count() == n_full


@pytest.mark.usefixtures("ray_session")
class TestResumableReviewRegressions:
    def test_nested_layout_same_basenames_no_collision(self, tmp_path):
        """Store-style layouts (bucket=K/part-0.parquet) must map to
        distinct shard dirs, not collide on the basename."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crawler_tjce_ray.dsr.synth import build_page_plan, generate_page

        corpus = tmp_path / "nested"
        plans = [p for p in build_page_plan(n_entities=4, total_pages=12, seed=42)
                 if p.kind == "precatorios"][:4]
        for i, plan in enumerate(plans):
            d = corpus / f"bucket={i}"
            d.mkdir(parents=True)
            pq.write_table(
                pa.Table.from_pylist([generate_page(plan, 10, 42)]),
                str(d / "part-0.parquet"),
            )
        out = str(tmp_path / "rec")
        r = extract_records_resumable(str(corpus), "precatorios", out)
        assert r["shards_total"] == 4 and r["shards_done"] == 4
        assert read_records(out).count() == 40  # all four shards' rows

    def test_marker_keyed_on_kind(self, tmp_path):
        """Reusing an out_dir with a different kind must re-extract,
        never serve stale records of the old kind."""
        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        out = str(tmp_path / "rec")
        r1 = extract_records_resumable(pages, "precatorios", out)
        assert r1["rows"] > 0
        r2 = extract_records_resumable(pages, "editais", out)
        assert r2["shards_skipped"] == 0  # nothing blindly reused
        recs = read_records(out).to_pandas()
        # only editais columns/rows remain visible
        assert "processo" not in recs.columns or len(recs) != r1["rows"]
