"""Robustness: cuckoo deletion, politeness-denied requeue (no URL is
ever lost), and corrupt-page tolerance in extraction."""

import json

import numpy as np
import pyarrow as pa
import pytest

from crawler_tjce_ray.state.cuckoo import CuckooFilter


class TestCuckooRemove:
    def test_remove_then_readd(self):
        f = CuckooFilter(10)
        keys = np.arange(1, 200, dtype=np.uint64) * np.uint64(2654435761)
        f.add(keys)
        assert f.contains(keys).all()
        removed = f.remove(keys[:50])
        assert removed == 50
        assert not f.contains(keys[:50]).any()
        assert f.contains(keys[50:]).all()
        f.add(keys[:50])
        assert f.contains(keys).all()

    def test_remove_absent_is_noop(self):
        f = CuckooFilter(8)
        assert f.remove(np.array([12345], dtype=np.uint64)) == 0
        assert f.count == 0


class TestCorruptPages:
    def test_corrupt_html_skipped_not_fatal(self):
        from crawler_tjce_ray.stages.extract import ExtractPrecatorios

        from crawler_tjce_ray.dsr.synth import build_page_plan, generate_page

        plan = [p for p in build_page_plan(n_entities=4, total_pages=12, seed=42)
                if p.kind == "precatorios"][:2]
        rows = [generate_page(p, 20, 42) for p in plan]
        batch = pa.Table.from_pylist(rows + [{
            "url": "https://bad.example.com/precatorios/x/page/0",
            "warc_ts": rows[0]["warc_ts"],
            "html": b"\x00\xffnot json at all",
            "text": "", "lang": "pt",
        }])
        ex = ExtractPrecatorios(2026)
        out = ex(batch.select(["url", "html"]))
        assert out.num_rows == 40  # the two good pages decoded fully
        assert ex.pages_failed == 1


@pytest.mark.usefixtures("ray_session")
class TestPolitenessRequeue:
    def test_denied_urls_eventually_fetched(self, tmp_path):
        """With an in-actor token rate of 1 grant/host/wave, the wave
        budget over-selects and actors deny — the denied urls must be
        un-seen, requeued, and fetched in later waves: full coverage,
        nothing lost."""
        from crawler_tjce_ray.pipelines.crawl import CrawlConfig, run_crawl
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        cfg = CrawlConfig(
            wave_size=64, per_host_budget=8, max_waves=80,
            fetch_concurrency=2, extract_records=False,
            actor_token_rate=1,
        )
        r = run_crawl(pages, str(tmp_path / "w"), config=cfg)
        t = r.trace
        denied = t[t["status"] == "budget_denied"]
        fetched = t[t["status"] == "ok"]
        assert len(denied) > 0, "token rate 1 should cause denials"
        assert fetched["url"].nunique() == 38  # whole corpus crawled
        # every denied url was fetched in a LATER wave
        for url in denied["url"].unique():
            later_ok = t[(t["url"] == url) & (t["status"] == "ok")]
            assert len(later_ok) == 1
            assert later_ok["wave"].iloc[0] > denied[denied["url"] == url]["wave"].min()


@pytest.mark.usefixtures("ray_session")
class TestResumeWithExtraction:
    def test_records_complete_after_resume(self, tmp_path):
        """Kill after wave 2 WITH fused extraction on, resume, and
        require the records to equal an uninterrupted run's (the
        records-durable-before-checkpoint contract)."""
        import pandas as pd
        import ray.data as rd

        from crawler_tjce_ray.pipelines.crawl import CrawlConfig, run_crawl
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        base = dict(wave_size=64, per_host_budget=8, fetch_concurrency=2,
                    extract_records=True)
        full = run_crawl(pages, str(tmp_path / "full"),
                         config=CrawlConfig(**base, max_waves=60))

        run_crawl(pages, str(tmp_path / "cut"),
                  config=CrawlConfig(**base, max_waves=3))  # "killed"
        resumed = run_crawl(pages, str(tmp_path / "cut"),
                            config=CrawlConfig(**base, max_waves=60),
                            resume=True)
        pd.testing.assert_frame_equal(
            full.trace.reset_index(drop=True),
            resumed.trace.reset_index(drop=True),
        )

        def recs(workdir):
            return (
                rd.read_parquet(f"{workdir}/records/precatorios")
                .to_pandas().sort_values(["url", "ordem"]).reset_index(drop=True)
            )

        a, b = recs(str(tmp_path / "full")), recs(str(tmp_path / "cut"))
        pd.testing.assert_frame_equal(a, b)
