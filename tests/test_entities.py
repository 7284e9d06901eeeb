"""M9 entity registry + S4/K4 entity-list end-to-end route.

Mirrors the reference's entity-mapping test intent
(tests/test_crawler.py:42-54): slug → exact accented official name,
unslugify only as the unknown-entity fallback, runtime extension via
add_entity_mapping, and the entity-list chain decoded all the way to
the single-column CSV (data/entidades_tjce.csv shape)."""

import csv
import os

import pytest

from crawler_tjce_ray.dsr.synth import entity_names
from crawler_tjce_ray.state.entities import EntityRegistry


class TestEntityRegistry:
    def test_slug_to_exact_official_name(self):
        reg = EntityRegistry(["MUNICÍPIO DE TAUÁ", "ESTADO DO CEARÁ"])
        # unslugify alone would give the lossy "MUNICIPIO DE TAUA"
        assert reg.get_api_entity_name("municipio-de-taua") == "MUNICÍPIO DE TAUÁ"
        assert reg.get_api_entity_name("estado-do-ceara") == "ESTADO DO CEARÁ"

    def test_name_or_slug_in(self):
        reg = EntityRegistry(["MUNICÍPIO DE TAUÁ"])
        # free-form name input normalizes through slugify first
        assert reg.get_api_entity_name("Municipio de Taua") == "MUNICÍPIO DE TAUÁ"
        assert reg.get_api_entity_name("MUNICÍPIO DE TAUÁ") == "MUNICÍPIO DE TAUÁ"

    def test_unslugify_fallback_for_unknown(self):
        reg = EntityRegistry(["ESTADO DO CEARÁ"])
        assert reg.get_api_entity_name("municipio-de-nowhere") == "MUNICIPIO DE NOWHERE"

    def test_reverse_lookup_and_fallback(self):
        reg = EntityRegistry(["MUNICÍPIO DE TAUÁ"])
        assert reg.get_entity_slug("MUNICÍPIO DE TAUÁ") == "municipio-de-taua"
        assert reg.get_entity_slug("ALGO NOVO LTDA.") == "algo-novo-ltda"

    def test_validate(self):
        reg = EntityRegistry(["MUNICÍPIO DE TAUÁ"])
        assert reg.validate_entity_slug("municipio-de-taua")
        # validation normalizes its input like the reference
        assert reg.validate_entity_slug("MUNICÍPIO DE TAUÁ")
        assert not reg.validate_entity_slug("municipio-de-outro")

    def test_add_entity_mapping(self):
        reg = EntityRegistry()
        reg.add_entity_mapping("Fundo Próprio", "FUNDO PRÓPRIO - FP")
        # slug input was normalized through slugify
        assert reg.validate_entity_slug("fundo-proprio")
        assert reg.get_api_entity_name("fundo-proprio") == "FUNDO PRÓPRIO - FP"
        assert reg.get_entity_slug("FUNDO PRÓPRIO - FP") == "fundo-proprio"

    def test_from_entity_list_skips_placeholder(self):
        reg = EntityRegistry.from_entity_list(
            ["--- Selecione a Entidade", "ESTADO DO CEARÁ"]
        )
        assert len(reg) == 1
        assert not reg.validate_entity_slug("selecione-a-entidade")


@pytest.mark.usefixtures("ray_session")
class TestEntityListEndToEnd:
    def _corpus(self):
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        return corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)

    def test_extract_entities_matches_corpus(self):
        from crawler_tjce_ray.pipelines.extract_all import extract_entities

        out = extract_entities(self._corpus())
        # reference semantics: distinct, sorted(), placeholder kept
        expected = sorted(set(entity_names(8)) | {"--- Selecione a Entidade"})
        assert out["entidade"].tolist() == expected
        assert out.loc[out["entidade"] == "ESTADO DO CEARÁ", "slug"].iloc[0] == (
            "estado-do-ceara"
        )

    def test_registry_from_corpus(self):
        reg = EntityRegistry.from_corpus(self._corpus())
        assert len(reg) == 8
        assert reg.get_api_entity_name("estado-do-ceara") == "ESTADO DO CEARÁ"

    def test_cli_entities_csv(self, tmp_path):
        from crawler_tjce_ray.cli import main

        out_file = os.path.join(tmp_path, "entidades.csv")
        rc = main(["extract", "--kind", "entities", "--output", out_file,
                   "--corpus", self._corpus()])
        assert rc == 0
        # utf-8-sig BOM like the reference (entity_mapping_crawler.py:293)
        with open(out_file, "rb") as f:
            assert f.read(3) == b"\xef\xbb\xbf"
        with open(out_file, encoding="utf-8-sig") as f:
            rows = list(csv.DictReader(f))
        assert [r["entidade"] for r in rows] == sorted(
            set(entity_names(8)) | {"--- Selecione a Entidade"}
        )

    def test_cli_entity_resolution_via_registry(self, tmp_path, capsys):
        from crawler_tjce_ray.cli import main

        out_file = os.path.join(tmp_path, "prec.csv")
        # free-form unaccented name resolves to the official entity
        rc = main(["extract", "--kind", "precatorios", "--entity",
                   "Estado do Ceara", "--output", out_file,
                   "--corpus", self._corpus()])
        assert rc == 0
        assert "ESTADO DO CEARÁ" in capsys.readouterr().out
        with open(out_file, encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) > 0


REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference snapshot absent")
class TestGoldenEntityConformance:
    def _golden_names(self):
        import csv as _csv

        with open(os.path.join(REF, "data", "entidades_tjce.csv"),
                  encoding="utf-8-sig", newline="") as f:
            return [r["entidade"] for r in _csv.DictReader(f)]

    def test_registry_over_real_entity_list(self):
        """Seed the registry from the reference's actual 224-entity
        crawl output and verify the accent-sensitive lookups the static
        table exists for."""
        names = self._golden_names()
        assert len(names) == 224
        reg = EntityRegistry.from_entity_list(names)
        # the crawled truth differs from the reference's static table
        # (e.g. golden has "MUNICÍPIO DE TAUA", the table "MUNICÍPIO DE
        # TAUÁ") — the registry must return the CRAWLED exact string
        assert reg.get_api_entity_name("municipio-de-taua") == "MUNICÍPIO DE TAUA"
        # every accent-carrying golden entity (unslugify-lossy names)
        # resolves exactly; and every name round-trips name→slug→name
        lossy = [n for n in names if not n.startswith("---")
                 and n != n.encode("ascii", "ignore").decode()]
        assert len(lossy) > 100  # the accented majority
        for n in lossy:
            assert reg.get_api_entity_name(reg.get_entity_slug(n)) == n
        for n in names:
            if not n.startswith("---"):
                assert reg.get_api_entity_name(reg.get_entity_slug(n)) == n

    def test_csv_writer_byte_identical_roundtrip(self, tmp_path):
        """K4 writer golden conformance: writing the golden list back
        reproduces data/entidades_tjce.csv byte for byte (BOM, CRLF,
        quoting)."""
        import pandas as pd

        from crawler_tjce_ray.functions.sinks import write_display_csv

        names = self._golden_names()
        out_file = os.path.join(tmp_path, "entidades.csv")
        write_display_csv(pd.DataFrame({"entidade": names}), "entities", out_file)
        with open(os.path.join(REF, "data", "entidades_tjce.csv"), "rb") as f:
            golden = f.read()
        with open(out_file, "rb") as f:
            mine = f.read()
        assert mine == golden
