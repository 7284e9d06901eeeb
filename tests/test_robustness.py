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


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressions:
    def test_resume_survives_leftover_tmp_checkpoint(self, tmp_path):
        """A crash between writing _SUCCESS into the tmp dir and the
        atomic rename leaves wave_NNNNN.tmp behind; resume must ignore
        it instead of crashing on int('NNNNN.tmp')."""
        import os

        from crawler_tjce_ray.pipelines.crawl import CrawlConfig, run_crawl
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        pages = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        w = str(tmp_path / "w")
        cfg = dict(wave_size=64, per_host_budget=8, fetch_concurrency=2,
                   extract_records=False)
        run_crawl(pages, w, config=CrawlConfig(**cfg, max_waves=3))
        bad = os.path.join(w, "ckpt", "wave_00099.tmp")
        os.makedirs(bad)
        open(os.path.join(bad, "_SUCCESS"), "w").write("ok")
        r = run_crawl(pages, w, config=CrawlConfig(**cfg, max_waves=60), resume=True)
        assert (r.trace["status"] == "ok").sum() == 38

    def test_page_store_rebuilds_on_corpus_change(self, tmp_path):
        """A store marker from corpus A must not be served for corpus B."""
        import pyarrow.parquet as pq

        from crawler_tjce_ray.sources.pages import corpus_cache_dir
        from crawler_tjce_ray.stages.fetch import build_page_store

        a = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        b = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=43)
        store = str(tmp_path / "store")
        build_page_store(a, store)
        n_a = sum(pq.read_metadata(f).num_rows
                  for f in __import__("glob").glob(f"{store}/**/*.parquet", recursive=True))
        build_page_store(b, store)  # different corpus → rebuild
        import glob
        urls = set()
        for f in glob.glob(f"{store}/**/*.parquet", recursive=True):
            urls.update(pq.read_table(f, columns=["url"])["url"].to_pylist())
        b_urls = set()
        for f in glob.glob(f"{b}/**/*.parquet", recursive=True):
            b_urls.update(pq.read_table(f, columns=["url"])["url"].to_pylist())
        assert urls == b_urls and n_a > 0

    def test_global_ordem_survives_page_straddle(self):
        """A page's records split across blocks must still get a
        correct, duplicate-free global sequence (rebase uses the
        page-global min, not a batch-local one)."""
        import pandas as pd
        import ray.data as rd

        from crawler_tjce_ray.pipelines.extract_all import assign_global_ordem

        # two 'pages' of 6 records, each page SPLIT across two blocks
        def page(url, n, base):
            return pd.DataFrame({"url": [url] * n, "ordem": range(base, base + n)})

        u1 = "https://h/powerbi/precatorios/aaa/page/0"
        u2 = "https://h/powerbi/precatorios/bbb/page/0"
        frames = [page(u1, 4, 1), page(u1, 2, 5), page(u2, 3, 1), page(u2, 3, 4)]
        ds = rd.from_pandas(frames)  # one block per frame → u1, u2 straddle
        out = assign_global_ordem(ds).to_pandas().sort_values("ordem")
        assert out["ordem"].tolist() == list(range(1, 13))
        assert (out[out["url"] == u1]["ordem"] <= 6).all()
        assert (out[out["url"] == u2]["ordem"] > 6).all()

    def test_simhash_uses_all_64_bits(self):
        """Band keys cover bits 48-63; pairs differing only in bit 63
        must report hamming 1, not 0."""
        import pandas as pd

        from crawler_tjce_ray.pipelines.dedup import SIMHASH_BANDS

        h1 = 0x8000_0000_0000_0001
        h2 = 0x0000_0000_0000_0001
        rows = []
        for doc_id, h in ((1, h1), (2, h2)):
            for b in range(SIMHASH_BANDS):
                rows.append((b, (h >> (16 * b)) & 0xFFFF, doc_id,
                             int(np.uint64(h).astype(np.int64))))
        g = pd.DataFrame(rows, columns=["band", "bkey", "doc_id", "sim64"])
        # reuse the band-pairs kernel logic: hamming over full 64 bits
        xor = np.bitwise_xor(
            np.array([g["sim64"][0]], dtype=np.int64).view(np.uint64),
            np.array([g["sim64"][4]], dtype=np.int64).view(np.uint64),
        )
        ham = np.unpackbits(xor.view(np.uint8).reshape(1, 8), axis=1).sum()
        assert ham == 1


class TestWindowOpEdgeCases:
    """Edge branches the synthetic tables never hit: users with fewer
    than 5 events (journey padding) and NTILE with n < buckets."""

    def _write_events(self, tmp_path, n_per_user):
        import pandas as pd
        import pyarrow.parquet as pq

        rows = []
        eid = 0
        for u, n in enumerate(n_per_user):
            for k in range(n):
                rows.append((eid, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=eid),
                             u, f"t{k}", float(k)))
                eid += 1
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                         "event_type", "value"])
        pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))

    def test_user_journey_short_users(self, tmp_path):
        import duckdb
        import pandas as pd

        from crawler_tjce_ray.pipelines.relational import (
            SQL_USER_JOURNEY, q_user_journey,
        )

        self._write_events(tmp_path, [1, 2, 4, 5, 9])
        mine = q_user_journey(str(tmp_path))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        ref = con.execute(SQL_USER_JOURNEY).df()
        pd.testing.assert_frame_equal(
            mine.reset_index(drop=True), ref, check_dtype=False)
        assert mine.loc[mine["user_id"] == 0, "journey"].iloc[0] == "t0"
        assert mine.loc[mine["user_id"] == 1, "journey"].iloc[0] == "t0>t1"

    def test_ntile_fewer_rows_than_buckets(self, tmp_path):
        import duckdb
        import pandas as pd
        import pyarrow.parquet as pq

        from crawler_tjce_ray.pipelines.relational import (
            SQL_ROW_NUMBER_NTILE, q_row_number_ntile,
        )

        df = pd.DataFrame({
            "doc_id": range(7),
            "n_chars": [30, 10, 10, 50, 20, 20, 20],
        })
        pq.write_table(pa.Table.from_pandas(df),
                       str(tmp_path / "documents.parquet"))
        mine = q_row_number_ntile(str(tmp_path))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        ref = con.execute(SQL_ROW_NUMBER_NTILE).df()
        pd.testing.assert_frame_equal(
            mine.reset_index(drop=True), ref, check_dtype=False)
