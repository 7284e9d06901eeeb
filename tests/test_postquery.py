"""CLI post-query options: the reference apply_filters/sort_rows
surface (main.py:696-737) exposed as extract flags."""

import csv
import os

import pytest


def _corpus():
    from crawler_tjce_ray.sources.pages import corpus_cache_dir

    return corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)


def _run(tmp_path, *flags):
    from crawler_tjce_ray.cli import main

    out_file = os.path.join(tmp_path, "out.csv")
    rc = main(["extract", "--kind", "precatorios", "--output", out_file,
               "--corpus", _corpus(), *flags])
    assert rc == 0
    with open(out_file, encoding="utf-8") as f:
        return list(csv.DictReader(f))


@pytest.mark.usefixtures("ray_session")
class TestPostQueryOptions:
    def test_baseline_rowcount(self, tmp_path):
        rows = _run(tmp_path)
        assert len(rows) > 100
        self.baseline = rows

    def test_ano_filter(self, tmp_path):
        full = _run(tmp_path)
        lo = min(int(r["ano_orcamento"]) for r in full) + 1
        filtered = _run(tmp_path, "--ano-min", str(lo))
        expected = [r for r in full if int(r["ano_orcamento"]) >= lo]
        assert [r["processo"] for r in filtered] == [r["processo"] for r in expected]
        assert len(filtered) < len(full)

    def test_natureza_filter_case_insensitive(self, tmp_path):
        filtered = _run(tmp_path, "--natureza", "alimentar")
        assert filtered and all(r["natureza"] == "Alimentar" for r in filtered)

    def test_valor_filter(self, tmp_path):
        from crawler_tjce_ray.functions.numeric import format_currency_brl  # noqa: F401

        filtered = _run(tmp_path, "--valor-max", "1000")
        full = _run(tmp_path)
        assert len(filtered) < len(full)

    def test_sort_desc_stable(self, tmp_path):
        rows = _run(tmp_path, "--sort-by", "ano_orcamento", "--order", "desc")
        anos = [int(r["ano_orcamento"]) for r in rows]
        assert anos == sorted(anos, reverse=True)
        # stability: within equal ano, ordem stays ascending
        for i in range(1, len(rows)):
            if anos[i] == anos[i - 1]:
                assert int(rows[i]["ordem"]) > int(rows[i - 1]["ordem"])

    def test_filters_rejected_for_other_kinds(self, tmp_path):
        from crawler_tjce_ray.cli import main

        rc = main(["extract", "--kind", "pagamentos", "--output",
                   os.path.join(tmp_path, "x.csv"), "--corpus", _corpus(),
                   "--ano-min", "2020"])
        assert rc == 2

    def test_unknown_sort_field_rejected(self, tmp_path):
        from crawler_tjce_ray.cli import main

        rc = main(["extract", "--kind", "precatorios", "--output",
                   os.path.join(tmp_path, "x.csv"), "--corpus", _corpus(),
                   "--sort-by", "nope"])
        assert rc == 2


@pytest.mark.usefixtures("ray_session")
class TestArtifactHook:
    def test_cas_upload_and_dedup(self, tmp_path):
        from crawler_tjce_ray.cli import main
        from crawler_tjce_ray.functions.artifacts import LocalCASUploader

        out_file = os.path.join(tmp_path, "out.csv")
        store = os.path.join(tmp_path, "cas")
        rc = main(["extract", "--kind", "precatorios", "--output", out_file,
                   "--corpus", _corpus(), "--artifact-store", store])
        assert rc == 0
        cid = LocalCASUploader.content_id(out_file)
        pinned = os.path.join(store, cid)
        assert os.path.exists(pinned)
        with open(pinned, "rb") as a, open(out_file, "rb") as b:
            assert a.read() == b.read()
        # pin-once: re-upload of identical bytes dedups
        receipt = LocalCASUploader(store).upload(out_file)
        assert receipt["cid"] == cid and receipt["deduplicated"]

    def test_pinata_stub_is_honest(self):
        from crawler_tjce_ray.functions.artifacts import PinataUploader

        with pytest.raises(NotImplementedError):
            PinataUploader().upload("/dev/null")
