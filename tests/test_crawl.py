"""Wave-crawl integration: determinism, resume identity, politeness,
coverage, and an independent crawl-order oracle."""

import os

import numpy as np
import pandas as pd
import pytest

from crawler_tjce_ray.pipelines.crawl import CrawlConfig, run_crawl
from crawler_tjce_ray.state.frontier import (
    canonicalize_url,
    make_frontier_rows,
    select_wave,
    url_sha1_64,
)

N_ENTITIES, TOTAL_PAGES, ROWS = 8, 40, 20


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pages"))
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from crawler_tjce_ray.sources.pages import write_pages_corpus

    plan = write_pages_corpus(out, n_entities=N_ENTITIES, total_pages=TOTAL_PAGES,
                              rows_per_page=ROWS, seed=42)
    return out, plan


class TestFrontierUnits:
    def test_canonicalize(self):
        assert canonicalize_url("HTTPS://Example.COM:443/a/b/") == "https://example.com/a/b"
        assert canonicalize_url("http://example.com:8080/x?q=1#frag") == "http://example.com:8080/x?q=1"
        assert canonicalize_url("https://h.example/") == "https://h.example/"

    def test_url_key_stable(self):
        assert url_sha1_64("https://a/b") == url_sha1_64("https://a/b")
        assert url_sha1_64("https://a/b") != url_sha1_64("https://a/c")

    def test_select_wave_politeness_and_order(self):
        urls = [f"https://hot.example/p/{i}" for i in range(10)] + [
            "https://cold.example/x",
        ]
        f = make_frontier_rows(urls)
        sel, rest = select_wave(f, wave=0, wave_size=100, per_host_budget=3)
        assert (sel.groupby("host").size() <= 3).all()
        # deferred hot-host urls carry to wave 1
        assert (rest["next_fetch_wave"] == 1).all()
        assert len(sel) + len(rest) == len(f)
        # order within wave: sorted by (priority, next_fetch_wave, url)
        assert list(sel["url"]) == sorted(sel["url"])


@pytest.mark.usefixtures("ray_session")
class TestCrawl:
    def _run(self, corpus, workdir, **kw):
        pages, _ = corpus
        cfg = CrawlConfig(wave_size=64, per_host_budget=4, max_waves=60,
                          n_seen_shards=2, log2_buckets=12,
                          fetch_concurrency=2, extract_records=kw.pop("extract", False))
        return run_crawl(pages, workdir, config=cfg, **kw)

    def test_full_coverage_and_determinism(self, corpus, tmp_path):
        pages, plan = corpus
        r1 = self._run(corpus, str(tmp_path / "run1"))
        r2 = self._run(corpus, str(tmp_path / "run2"))
        # every page of the corpus is crawled exactly once
        fetched = r1.trace[r1.trace["status"] == "ok"]
        assert sorted(fetched["url"]) == sorted(p.url for p in plan)
        # two runs produce byte-identical traces (order contract)
        pd.testing.assert_frame_equal(
            r1.trace.reset_index(drop=True), r2.trace.reset_index(drop=True)
        )

    def test_politeness_budget_respected(self, corpus, tmp_path):
        r = self._run(corpus, str(tmp_path / "run"))
        t = r.trace[r.trace["status"] == "ok"].copy()
        t["host"] = t["url"].str.extract(r"https://([^/]+)/")[0]
        per_wave_host = t.groupby(["wave", "host"]).size()
        assert (per_wave_host <= 4).all()

    def test_chain_order_monotonic(self, corpus, tmp_path):
        """Page k+1 of a cursor chain is always crawled in a wave ≥
        page k's wave (the restart-token protocol ordering)."""
        r = self._run(corpus, str(tmp_path / "run"))
        t = r.trace[r.trace["status"] == "ok"].copy()
        t["chain"] = t["url"].str.replace(r"/page/\d+$", "", regex=True)
        t["page_no"] = t["url"].str.extract(r"/page/(\d+)$")[0].astype(int)
        for _, g in t.groupby("chain"):
            g = g.sort_values("page_no")
            assert g["wave"].is_monotonic_increasing

    def test_resume_identical(self, corpus, tmp_path):
        """Kill after wave k, resume → identical remaining trace and
        identical URL-seen state (the north-rule resume contract)."""
        workdir_full = str(tmp_path / "full")
        full = self._run(corpus, workdir_full)

        workdir_cut = str(tmp_path / "cut")
        pages, _ = corpus
        cfg_cut = CrawlConfig(wave_size=64, per_host_budget=4, max_waves=3,
                              n_seen_shards=2, log2_buckets=12,
                              fetch_concurrency=2, extract_records=False)
        run_crawl(pages, workdir_cut, config=cfg_cut)  # "killed" after wave 2
        cfg_resume = CrawlConfig(wave_size=64, per_host_budget=4, max_waves=60,
                                 n_seen_shards=2, log2_buckets=12,
                                 fetch_concurrency=2, extract_records=False)
        resumed = run_crawl(pages, workdir_cut, config=cfg_resume, resume=True)
        pd.testing.assert_frame_equal(
            full.trace.reset_index(drop=True), resumed.trace.reset_index(drop=True)
        )
        # seen state equality via the final checkpoint blobs
        def final_seen(workdir):
            base = os.path.join(workdir, "ckpt")
            last = sorted(os.listdir(base))[-1]
            return [
                open(os.path.join(base, last, f"seen_shard_{i}.bin"), "rb").read()
                for i in range(2)
            ]

        assert final_seen(workdir_full) == final_seen(workdir_cut)

    def test_robots_denied(self, corpus, tmp_path):
        pages, _ = corpus
        from crawler_tjce_ray.pipelines.crawl import default_seeds

        seeds = default_seeds() + ["https://esaj.tjce.example.org/private/secret/page/0"]
        cfg = CrawlConfig(wave_size=64, per_host_budget=8, max_waves=5,
                          n_seen_shards=2, log2_buckets=12,
                          fetch_concurrency=2, extract_records=False)
        r = run_crawl(pages, str(tmp_path / "run"), seeds=seeds, config=cfg)
        denied = r.trace[r.trace["url"].str.contains("/private/")]
        assert (denied["status"] == "robots_denied").all() and len(denied) == 1

    def test_records_written(self, corpus, tmp_path):
        pages, plan = corpus
        r = self._run(corpus, str(tmp_path / "run"), extract=True)
        import ray.data as rd

        n_prec = sum(1 for p in plan if p.kind == "precatorios")
        recs = rd.read_parquet(os.path.join(r.records_dir, "precatorios"))
        assert recs.count() == n_prec * ROWS

    def test_independent_order_oracle(self, corpus, tmp_path):
        """Cross-check the wave trace against a from-scratch sequential
        simulator implementing the same policy (priority=depth BFS,
        per-host budget, lexicographic tiebreak)."""
        pages, plan = corpus
        r = self._run(corpus, str(tmp_path / "run"))

        from crawler_tjce_ray.dsr.synth import generate_page, page_outlinks
        from crawler_tjce_ray.pipelines.crawl import default_seeds

        by_url = {p.url: p for p in plan}
        pending = {u: (0, 0) for u in default_seeds()}  # url -> (depth, avail_wave)
        seen = set()
        oracle = []  # (wave, url)
        wave = 0
        while pending and wave < 60:
            elig = [(d, u) for u, (d, w) in pending.items() if w <= wave]
            elig.sort(key=lambda x: (x[0], x[1]))
            granted, host_used, taken = [], {}, 0
            for d, u in elig:
                host = u.split("/")[2]
                if taken >= 64:
                    break
                if host_used.get(host, 0) >= 4:
                    continue
                host_used[host] = host_used.get(host, 0) + 1
                taken += 1
                granted.append(u)
            for u in pending:
                if u not in granted and pending[u][1] <= wave:
                    pending[u] = (pending[u][0], wave + 1)
            for u in granted:
                d = pending.pop(u)[0]
                if u in seen:
                    continue
                seen.add(u)
                oracle.append((wave, u))
                if u in by_url:
                    for link in page_outlinks(by_url[u]):
                        if link not in seen and link not in pending:
                            pending[link] = (d + 1, wave + 1)
            wave += 1

        mine = [
            (int(w), u)
            for w, u, s in zip(r.trace["wave"], r.trace["url"], r.trace["status"])
            if s == "ok"
        ]
        assert mine == oracle
