"""Synthetic corpus determinism + distributed extraction end-to-end."""

import json

import pytest

from crawler_tjce_ray.dsr.decode import (
    decode_editais_page,
    decode_pagamentos_page,
    decode_precatorios_page,
    extract_restart_tokens,
)
from crawler_tjce_ray.dsr.synth import (
    build_page_plan,
    generate_page,
    generate_precatorios_envelope,
)


@pytest.fixture(scope="module")
def plan():
    return build_page_plan(n_entities=8, total_pages=40, seed=42)


class TestSynthDeterminism:
    def test_page_bytes_identical(self, plan):
        a = generate_page(plan[0], 50, 42)
        b = generate_page(plan[0], 50, 42)
        assert a["html"] == b["html"]
        assert a == b

    def test_pages_differ_across_indices(self, plan):
        a = generate_page(plan[0], 50, 42)
        b = generate_page(plan[1], 50, 42)
        assert a["html"] != b["html"]

    def test_plan_structure(self, plan):
        kinds = {p.kind for p in plan}
        assert kinds == {"precatorios", "editais", "pagamentos", "entities"}
        # dominant-host skew: ≥60% of urls on the dominant host
        from crawler_tjce_ray.dsr.synth import DOMINANT_HOST

        share = sum(p.host == DOMINANT_HOST for p in plan) / len(plan)
        assert share >= 0.6
        # chains are contiguous 0..len-1
        by_chain = {}
        for p in plan:
            by_chain.setdefault((p.kind, p.entity_slug), []).append(p.page_no)
        for pages in by_chain.values():
            assert sorted(pages) == list(range(len(pages)))


class TestSynthDecodeRoundTrip:
    def test_precatorios_page_decodes(self, plan):
        p = next(p for p in plan if p.kind == "precatorios")
        resp = generate_precatorios_envelope(p, 50, 42)
        rows, last = decode_precatorios_page(resp, 0, current_year=2026)
        assert last == len(rows) == 50
        # base row resolves the dictionary-encoded processo exactly
        d0 = resp["results"][0]["result"]["data"]["dsr"]["DS"][0]["ValueDicts"]["D0"]
        assert rows[0]["processo"] == d0[0]
        # every row distinct (no accidental inherit-everything rows)
        assert len({r["processo"] for r in rows}) == 50

    def test_rt_chain(self, plan):
        chain = sorted(
            (p for p in plan if p.kind == "precatorios" and p.entity_slug == "estado-do-ceara"),
            key=lambda p: p.page_no,
        )
        assert len(chain) > 1
        for p in chain[:-1]:
            resp = generate_precatorios_envelope(p, 20, 42)
            assert extract_restart_tokens(resp) is not None
        last = generate_precatorios_envelope(chain[-1], 20, 42)
        assert extract_restart_tokens(last) is None

    def test_editais_pagamentos_decode(self, plan):
        pe = next(p for p in plan if p.kind == "editais")
        rows = decode_editais_page(json.loads(json.dumps(
            __import__("crawler_tjce_ray.dsr.synth", fromlist=["generate_editais_envelope"])
            .generate_editais_envelope(pe, 30, 42))))
        assert len(rows) == 30
        pp = next(p for p in plan if p.kind == "pagamentos")
        prow = decode_pagamentos_page(
            __import__("crawler_tjce_ray.dsr.synth", fromlist=["generate_pagamentos_envelope"])
            .generate_pagamentos_envelope(pp, 30, 42))
        assert len(prow) == 30  # 31 wire rows, row 0 schema-only

    def test_pagamentos_page_self_contained(self, plan):
        """Distributed decode == sequential decode: page 2 decoded alone
        must equal page 2 decoded with page 1's rows as prior state
        (guaranteed by the generator's full first delta row)."""
        from crawler_tjce_ray.dsr.synth import generate_pagamentos_envelope

        chain = sorted((p for p in plan if p.kind == "pagamentos"), key=lambda p: p.page_no)
        if len(chain) < 2:
            pytest.skip("need 2+ pagamento pages")
        r1 = decode_pagamentos_page(generate_pagamentos_envelope(chain[0], 20, 42))
        seq = decode_pagamentos_page(
            generate_pagamentos_envelope(chain[1], 20, 42), starting_order_number=len(r1), prior_rows=r1
        )
        alone = decode_pagamentos_page(generate_pagamentos_envelope(chain[1], 20, 42))
        assert len(seq) == len(alone)
        for a, b in zip(seq, alone):
            a2 = {k: v for k, v in a.items() if k != "ordem"}
            b2 = {k: v for k, v in b.items() if k != "ordem"}
            assert a2 == b2


@pytest.mark.usefixtures("ray_session")
class TestRayExtraction:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("pages"))
        from crawler_tjce_ray.sources.pages import write_pages_corpus

        plan = write_pages_corpus(out, n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        return out, plan

    def test_flagship_counts_and_order(self, corpus):
        from crawler_tjce_ray.pipelines.extract_all import run_flagship

        out, plan = corpus
        n_prec_pages = sum(1 for p in plan if p.kind == "precatorios")
        df = run_flagship(out, current_year=2026).to_pandas()
        assert len(df) == n_prec_pages * 50
        assert df["ordem"].is_unique
        assert df["ordem"].min() == 1 and df["ordem"].max() == len(df)
        # crawl order: sorting by ordem must sort by (slug, page_no)
        from crawler_tjce_ray.pipelines.extract_all import crawl_order_key

        df = df.sort_values("ordem")
        keys = df["url"].map(crawl_order_key)
        assert list(keys) == sorted(keys)

    def test_extraction_matches_sequential_decode(self, corpus):
        """The Ray map_batches output equals a driver-side sequential
        decode of the same pages (the reference execution model)."""
        import pyarrow.parquet as pq

        from crawler_tjce_ray.pipelines.extract_all import extract_records

        out, plan = corpus
        df = (
            extract_records(out, "precatorios", current_year=2026)
            .to_pandas()
            .sort_values(["url", "ordem"])
            .reset_index(drop=True)
        )
        seq_rows = []
        for p in sorted((p for p in plan if p.kind == "precatorios"), key=lambda p: (p.entity_slug, p.page_no)):
            resp = json.loads(generate_page(p, 50, 42)["html"])
            rows, _ = decode_precatorios_page(resp, 0, current_year=2026)
            for r in rows:
                r["url"] = p.url
                seq_rows.append(r)
        assert len(df) == len(seq_rows)
        seq_sorted = sorted(seq_rows, key=lambda r: (r["url"], r["ordem"]))
        for i in (0, len(df) // 2, len(df) - 1):
            got = df.iloc[i]
            exp = seq_sorted[i]
            assert got["processo"] == exp["processo"]
            assert str(got["valor_atual"]) == str(exp["valor_atual"])
            assert got["situacao"] == exp["situacao"]

    def test_editais_pagamentos_pipelines(self, corpus):
        from crawler_tjce_ray.pipelines.extract_all import assign_global_ordem, extract_records

        out, plan = corpus
        n_aux = sum(1 for p in plan if p.kind == "editais")
        ed = assign_global_ordem(extract_records(out, "editais")).to_pandas()
        assert len(ed) == n_aux * 50
        assert ed["ordem"].is_unique
        pg = assign_global_ordem(extract_records(out, "pagamentos")).to_pandas()
        assert len(pg) == n_aux * 50
        assert pg["ordem"].is_unique


class TestEditaisOrdering:
    def test_global_ordem_matches_reference_ascending(self, ray_session):
        """Editais chains serve ordem-DESC; after resequencing with
        descending_pages=True, the global ordem must order rows by the
        ORIGINAL chain ordem ascending (the reference's client-side
        re-sort, edital_crawler.py:630-631)."""
        from crawler_tjce_ray.pipelines.extract_all import (
            assign_global_ordem, extract_records,
        )
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        out = corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        raw = extract_records(out, "editais").to_pandas()
        orig_by_key = dict(zip(raw["precatorio"], raw["ordem"]))
        ed = assign_global_ordem(
            extract_records(out, "editais"), descending_pages=True
        ).to_pandas().sort_values("ordem")
        orig_seq = [orig_by_key[p] for p in ed["precatorio"]]
        assert orig_seq == sorted(orig_seq), "global ordem must follow original ascending"
        assert ed["ordem"].tolist() == list(range(1, len(ed) + 1))
