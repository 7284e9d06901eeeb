"""CSV display sink (K1-K4) and CLI entry-point tests: encodings,
BOM, header-on-empty quirk, ordem ordering, entity filter."""

import csv
import subprocess
import sys

import pandas as pd
import pytest

from crawler_tjce_ray.dsr.specs import (
    EDITAL_CSV_FIELDS, PRECATORIO_CSV_FIELDS,
)
from crawler_tjce_ray.functions.sinks import write_display_csv


class TestDisplaySink:
    def test_empty_input_still_writes_header(self, tmp_path):
        out = tmp_path / "empty.csv"
        n = write_display_csv(pd.DataFrame(columns=EDITAL_CSV_FIELDS), "editais", str(out))
        assert n == 0
        raw = out.read_bytes()
        assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM
        header = raw.decode("utf-8-sig").strip().split(",")
        assert header == EDITAL_CSV_FIELDS

    def test_precatorio_formatting(self, tmp_path):
        from decimal import Decimal

        row = {f: "-" for f in PRECATORIO_CSV_FIELDS}
        import datetime

        row.update({
            "ordem": 1, "processo": "123", "valor_original": Decimal("1234.56"),
            "valor_atual": Decimal("0.10"),
            "data_cadastro": datetime.datetime(2024, 9, 9),
        })
        out = tmp_path / "p.csv"
        write_display_csv(pd.DataFrame([row]), "precatorios", str(out))
        raw = out.read_bytes()
        assert not raw.startswith(b"\xef\xbb\xbf")  # plain utf-8 (K1)
        rows = list(csv.DictReader(raw.decode("utf-8").splitlines()))
        assert rows[0]["valor_original"] == "R$ 1.234,56"
        assert rows[0]["valor_atual"] == "R$ 0,10"
        assert rows[0]["data_cadastro"] == "09/09/2024"


@pytest.mark.usefixtures("ray_session")
class TestCLI:
    def test_extract_inproc_ordem_sorted(self, tmp_path):
        from crawler_tjce_ray.cli import main

        out = tmp_path / "prec.csv"
        rc = main(["extract", "--kind", "precatorios", "--output", str(out)])
        assert rc == 0
        df = pd.read_csv(out)
        assert list(df.columns) == PRECATORIO_CSV_FIELDS
        assert df["ordem"].tolist() == list(range(1, len(df) + 1))

    def test_extract_entity_filter(self, tmp_path):
        from crawler_tjce_ray.cli import main
        from crawler_tjce_ray.dsr.synth import entity_names
        from crawler_tjce_ray.functions.text import slugify

        name = entity_names(8)[1]
        out = tmp_path / "one.csv"
        rc = main([
            "extract", "--kind", "precatorios", "--entity", name,
            "--output", str(out),
        ])
        assert rc == 0
        df = pd.read_csv(out)
        assert 0 < len(df)
        assert df["ordem"].tolist() == list(range(1, len(df) + 1))
        # sanity: fewer rows than the whole corpus extraction
        full = tmp_path / "full.csv"
        main(["extract", "--kind", "precatorios", "--output", str(full)])
        assert len(df) < len(pd.read_csv(full))
        assert slugify(name)  # slug resolves

    def test_cli_subprocess_owns_ray_session(self, tmp_path):
        """The CLI must run standalone (guarded ray.init) — EP2 parity."""
        out = tmp_path / "sub.csv"
        proc = subprocess.run(
            [sys.executable, "-m", "crawler_tjce_ray", "extract",
             "--kind", "editais", "--output", str(out)],
            capture_output=True, text=True, timeout=240,
            cwd="/root/repo", env={"PATH": "/usr/bin:/bin", "HOME": "/root",
                                   "RAY_GRAFT_CPUS": "2",
                                   "PYTHONPATH": "/root/repo"},
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert out.read_bytes().startswith(b"\xef\xbb\xbf")
        assert len(pd.read_csv(out, encoding="utf-8-sig")) > 0


@pytest.mark.usefixtures("ray_session")
class TestPartitionedCsvSink:
    def test_dir_sink_matches_single_file_rows(self, tmp_path):
        """The scale path (partitioned ds.write_csv) carries the same
        display rows as the bounded single-file writer."""
        import csv
        import glob
        import os

        from crawler_tjce_ray.functions.sinks import (
            write_display_csv, write_display_csv_dir,
        )
        from crawler_tjce_ray.pipelines.extract_all import extract_records
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        corpus = corpus_cache_dir(n_entities=8, total_pages=40,
                                  rows_per_page=50, seed=42)
        ds = extract_records(corpus, "precatorios", current_year=2026)
        ds = ds.drop_columns(["url"]).materialize()

        single = os.path.join(tmp_path, "single.csv")
        write_display_csv(ds, "precatorios", single)
        out_dir = os.path.join(tmp_path, "parts")
        write_display_csv_dir(ds, "precatorios", out_dir)

        with open(single, encoding="utf-8") as f:
            single_rows = list(csv.DictReader(f))
        part_rows = []
        for p in sorted(glob.glob(os.path.join(out_dir, "*"))):
            with open(p, encoding="utf-8") as f:
                part_rows.extend(csv.DictReader(f))
        assert len(part_rows) == len(single_rows) > 0
        key = lambda r: (r["processo"], r["ordem"])  # noqa: E731
        assert sorted(part_rows, key=key) == sorted(single_rows, key=key)

    def test_dir_sink_fires_hooks_per_part(self, tmp_path):
        """The partitioned path pins every part file through the same
        post-write hooks as the single-file path (K6 analog), with per
        part row counts summing to the dataset size."""
        import glob
        import os

        from crawler_tjce_ray.functions import sinks
        from crawler_tjce_ray.pipelines.extract_all import extract_records
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        corpus = corpus_cache_dir(n_entities=8, total_pages=40,
                                  rows_per_page=50, seed=42)
        ds = extract_records(corpus, "precatorios", current_year=2026)
        ds = ds.drop_columns(["url"]).materialize()
        total = ds.count()

        calls = []
        sinks.register_post_write_hook(
            lambda path, kind, n: calls.append((path, kind, n))
        )
        try:
            out_dir = os.path.join(tmp_path, "parts")
            sinks.write_display_csv_dir(ds, "precatorios", out_dir)
        finally:
            sinks.clear_post_write_hooks()
        parts = [p for p in glob.glob(os.path.join(out_dir, "*"))
                 if os.path.isfile(p)]
        assert len(calls) == len(parts) > 0
        assert sum(n for _, _, n in calls) == total
        assert all(kind == "precatorios" for _, kind, _ in calls)


class TestPostWriteHooks:
    """K6 analog: artifact hooks fire after the single-file CSV write
    (reference services/pinata_uploader.py uploads the finished CSV)."""

    @pytest.fixture(autouse=True)
    def _clean_hooks(self):
        from crawler_tjce_ray.functions import sinks

        sinks.clear_post_write_hooks()
        yield
        sinks.clear_post_write_hooks()

    def test_manifest_hook_records_content_address(self, tmp_path):
        import hashlib
        import json

        from crawler_tjce_ray.functions import sinks

        sinks.register_post_write_hook(sinks.manifest_hook)
        out = tmp_path / "e.csv"
        df = pd.DataFrame([{f: "x" for f in EDITAL_CSV_FIELDS}])
        n = write_display_csv(df, "editais", str(out))
        m = json.loads((tmp_path / "e.csv.manifest.json").read_text())
        assert m["rows"] == n == 1
        assert m["kind"] == "editais"
        assert m["sha256"] == hashlib.sha256(out.read_bytes()).hexdigest()
        assert m["bytes"] == out.stat().st_size

    def test_pinata_shell_uses_injected_transport(self, tmp_path):
        from crawler_tjce_ray.functions import sinks

        calls = []

        def fake_post(filename, content, jwt):
            calls.append((filename, len(content), jwt))
            return {"IpfsHash": "Qmfake123"}

        up = sinks.PinataUploader(jwt="tok", post_fn=fake_post)
        sinks.register_post_write_hook(up)
        out = tmp_path / "p.csv"
        write_display_csv(pd.DataFrame(columns=EDITAL_CSV_FIELDS), "editais", str(out))
        assert calls and calls[0][0] == "p.csv" and calls[0][2] == "tok"
        assert up.pinned[0]["cid"] == "Qmfake123"
        assert up.pinned[0]["url"].endswith("Qmfake123")

    def test_pinata_shell_refuses_without_transport(self, tmp_path):
        from crawler_tjce_ray.functions import sinks

        sinks.register_post_write_hook(sinks.PinataUploader())
        out = tmp_path / "q.csv"
        with pytest.raises(RuntimeError, match="no transport"):
            write_display_csv(
                pd.DataFrame(columns=EDITAL_CSV_FIELDS), "editais", str(out)
            )


class TestQuerySubcommand:
    """`python -m crawler_tjce_ray query` — the registry from the CLI."""

    def test_list_prints_registry(self, capsys):
        from crawler_tjce_ray.cli import main
        from crawler_tjce_ray.pipelines.registry import build_queries

        rc = main(["query", "--list"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert len(lines) == len(build_queries())
        assert any(l.startswith("groupby_count\toracle") for l in lines)

    def test_query_to_csv_matches_direct(self, tmp_path, ray_session):
        import pandas as pd

        from crawler_tjce_ray.cli import main
        from crawler_tjce_ray.pipelines.registry import build_queries

        out = tmp_path / "gb.csv"
        rc = main(["query", "groupby_count",
                   "--sf-dir", "/root/testdata/sf0.001",
                   "--output", str(out)])
        assert rc == 0
        got = pd.read_csv(out)
        want = build_queries()["groupby_count"]("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(
            got, want.reset_index(drop=True), check_dtype=False
        )

    def test_query_to_parquet(self, tmp_path, ray_session):
        import pandas as pd

        from crawler_tjce_ray.cli import main

        out = tmp_path / "pq.parquet"
        rc = main(["query", "qty_moments_by_flag",
                   "--sf-dir", "/root/testdata/sf0.001",
                   "--output", str(out)])
        assert rc == 0
        assert len(pd.read_parquet(out)) == 3

    def test_unknown_query_is_error(self):
        from crawler_tjce_ray.cli import main

        assert main(["query", "nope", "--output", "/tmp/x.csv"]) == 2
