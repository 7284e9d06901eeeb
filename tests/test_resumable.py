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
