"""DSR decoder conformance against the reference wire-format fixtures
and golden CSV outputs (SURVEY.md §5: the de-facto conformance corpus).

These tests read the read-only reference snapshot at /root/reference
(fixtures + goldens only, no code) and are skipped when it is absent.
"""

import csv
import json
import os
from datetime import datetime
from decimal import Decimal

import pytest

from crawler_tjce_ray.dsr.decode import (
    decode_editais_page,
    decode_entities_page,
    decode_pagamentos_page,
    decode_precatorios_page,
    extract_restart_tokens,
    navigate_envelope,
)
from crawler_tjce_ray.functions.sinks import (
    edital_to_csv_row,
    pagamento_to_csv_row,
)

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


def _load(name):
    with open(os.path.join(REF, "examples", name)) as f:
        return json.load(f)


def _golden(path):
    with open(os.path.join(REF, path), encoding="utf-8-sig") as f:
        return list(csv.DictReader(f))


@needs_reference
class TestEditalConformance:
    def test_byte_identical_vs_golden_csv(self):
        rows = sorted(decode_editais_page(_load("response_edital.json")), key=lambda r: r["ordem"])
        golden = _golden("data/editais_tjce.csv")
        assert len(rows) == len(golden) == 158
        for mine, gold in zip(rows, golden):
            assert edital_to_csv_row(mine) == dict(gold)


@needs_reference
class TestPagamentoConformance:
    def test_byte_identical_vs_golden_csv(self):
        rows = decode_pagamentos_page(_load("response_pagamentos.json"))
        golden = _golden("data/pagamentos_tjce.csv")
        # fixture holds the first page: 500 DM0 rows → 499 emitted
        # (row 0 is schema-only in the pagamentos decoder)
        assert len(rows) == 499
        for mine, gold in zip(rows, golden[:499]):
            assert pagamento_to_csv_row(mine) == dict(gold)


@needs_reference
class TestPrecatorioConformance:
    """The precatório fixture has no same-version golden CSV
    (examples/example.csv predates the current decoder), so this pins
    the decoder's reference-semantics output directly: envelope
    navigation, the Sum(...)-column default quirk, delta inheritance,
    dictionary decode and the RT cursor."""

    def test_envelope(self):
        page = navigate_envelope(_load("response.json"))
        assert page is not None
        assert len(page["rows"]) == 500
        assert len(page["selects"]) == 10
        assert set(page["value_dicts"]) == {"D0", "D1", "D2", "D3", "D4", "D5"}
        assert page["ic"] is False

    def test_decode_pinned(self):
        rows, last = decode_precatorios_page(_load("response.json"), 0, current_year=2026)
        assert last == len(rows) == 500
        assert [r["ordem"] for r in rows] == list(range(1, 501))
        r0 = rows[0]
        assert r0["processo"] == "3003313-36.2024.8.06.0000"
        assert r0["comarca"] == "COMARCA DE FORTALEZA"
        assert r0["data_cadastro"] == datetime(2024, 5, 13)
        assert r0["valor_atual"] == Decimal("361354.01")
        # QUIRK: Sum(...)-wrapped columns never resolve → defaults
        assert r0["ano_orcamento"] == 2024
        assert r0["valor_original"] == Decimal("0.0")
        # QUIRK: delta-row C misalignment shifts the date column onto the
        # (unmapped) ano_orcamento value → Excel-serial 2025 → 1905
        r1 = rows[1]
        assert r1["processo"] == "0003515-98.2023.8.06.0000"
        assert r1["data_cadastro"] == datetime(1905, 7, 17)
        assert r1["valor_atual"] == Decimal("361354.01")  # inherited

    def test_restart_tokens(self):
        rt = extract_restart_tokens(_load("response.json"))
        assert rt == [[
            "500L",
            "'0001637-12.2021.8.06.0000'",
            "2022L",
            "'Alimentar'",
            "datetime'2021-06-22T00:00:00'",
            "'Orçamentário'",
            "33043.15D",
            "'Cadastrado'",
            "'COMARCA DE FORTALEZA'",
            "'R$52.472,42'",
        ]]


class TestEnvelopeEdges:
    def test_empty_page_marker(self):
        resp = {
            "results": [{"result": {"data": {
                "descriptor": {"Select": []},
                "dsr": {"DS": [{"PH": [{"DM0": [{}]}], "ValueDicts": {}}]},
            }}}]
        }
        page = navigate_envelope(resp)
        assert page is not None and page["rows"] == []

    def test_missing_structures(self):
        assert navigate_envelope({}) is None
        assert navigate_envelope({"results": [{}]}) is None
        assert navigate_envelope(None) is None

    def test_entities_placeholder_filter(self):
        resp = {
            "results": [{"result": {"data": {"dsr": {"DS": [{"PH": [{"DM0": [
                {"G0": "--- Selecione"},
                {"G0": "--- Selecione a Entidade"},
                {"G0": "'MUNIC\\u00c3\\u008dPIO DE TAU\\u00c3\\u0081'"},
                {"C": ["ESTADO DO CEARA"]},
                {},
            ]}]}]}}}}]
        }
        ents = decode_entities_page(resp)
        # exact "--- selecione" dropped; the longer placeholder kept
        # (matches data/entidades_tjce.csv which includes it)
        assert ents == [
            "--- Selecione a Entidade",
            "MUNICÍPIO DE TAUÁ",
            "ESTADO DO CEARA",
        ]


@needs_reference
class TestByteGoldenCsvRoundTrip:
    """Full-file conformance: decode the reference wire fixtures and
    write the display CSVs — the bytes must match the reference's own
    golden outputs (BOM, CRLF, quoting, field formatting)."""

    def test_editais_csv_bytes(self, tmp_path):
        import pandas as pd

        from crawler_tjce_ray.functions.sinks import write_display_csv

        rows = sorted(decode_editais_page(_load("response_edital.json")),
                      key=lambda r: r["ordem"])
        out_file = os.path.join(tmp_path, "editais.csv")
        write_display_csv(pd.DataFrame(rows), "editais", out_file)
        with open(os.path.join(REF, "data", "editais_tjce.csv"), "rb") as f:
            golden = f.read()
        with open(out_file, "rb") as f:
            assert f.read() == golden

    def test_pagamentos_csv_first_page_bytes(self, tmp_path):
        import pandas as pd

        from crawler_tjce_ray.functions.sinks import write_display_csv

        rows = decode_pagamentos_page(_load("response_pagamentos.json"))
        out_file = os.path.join(tmp_path, "pagamentos.csv")
        write_display_csv(pd.DataFrame(rows), "pagamentos", out_file)
        with open(os.path.join(REF, "data", "pagamentos_tjce.csv"), "rb") as f:
            golden_lines = f.read().split(b"\r\n")
        with open(out_file, "rb") as f:
            mine_lines = f.read().split(b"\r\n")
        # the golden holds the full multi-page crawl; the fixture is
        # its first page (499 rows) — header + those rows must match
        assert mine_lines[:500] == golden_lines[:500]
