"""Kernel unit tests — ports the *intent* of the reference's
tests/test_crawler.py plus the F9 edge-case vectors from FIXTURES.md."""

from datetime import datetime
from decimal import Decimal

import pytest

from crawler_tjce_ray.functions.dates import (
    clean_data_cadastro,
    format_date_value,
    render_date_ddmmyyyy,
    validate_ano_orcamento,
)
from crawler_tjce_ray.functions.format import (
    finalize_precatorio,
    format_value,
)
from crawler_tjce_ray.functions.numeric import (
    clean_decimal,
    clean_decimal_simple,
    format_currency_brl,
    format_numeric_value,
)
from crawler_tjce_ray.functions.text import (
    clean_processo,
    decode_unicode_escapes,
    digits_only,
    is_precatorio_number,
    slugify,
    unslugify,
    zero_pad_processo,
)


class TestText:
    def test_unicode_unescape(self):
        # the round trip repairs double-encoded (mojibake) escapes ...
        assert decode_unicode_escapes("MUNIC\\u00c3\\u008dPIO") == "MUNICÍPIO"
        assert decode_unicode_escapes("MUNICÃ\x8dPIO") == "MUNICÍPIO"
        # ... while plain single escapes fail the utf-8 step and pass
        # through unchanged (reference crawler/crawler.py:96-97)
        assert decode_unicode_escapes("MUNIC\\u00cdPIO") == "MUNIC\\u00cdPIO"
        assert decode_unicode_escapes("plain") == "plain"

    def test_slugify(self):
        assert slugify("MUNICÍPIO DE FORTALEZA") == "municipio-de-fortaleza"
        assert slugify("MUNICÍPIO DE TAUÁ") == "municipio-de-taua"
        assert slugify("A  -  B") == "a-b"

    def test_unslugify(self):
        assert unslugify("municipio-de-fortaleza") == "MUNICIPIO DE FORTALEZA"

    def test_digits_only(self):
        assert digits_only("018.649.473-49") == "01864947349"
        assert digits_only("") == "-"
        assert digits_only(None) == "-"
        assert digits_only("abc") == "-"

    def test_clean_processo(self):
        assert clean_processo("0004029-51.2023.8.06.0000") == "0004029-51.2023.8.06.0000"
        assert clean_processo("  xyz !@# 123 ") == "xyz123"
        assert clean_processo("!!!") is None
        assert clean_processo("") is None
        assert clean_processo(1234567890) == "1234567890"

    def test_is_precatorio_number(self):
        assert is_precatorio_number("0001734-46.2020.8.06.0000")
        assert not is_precatorio_number("123")
        assert not is_precatorio_number(42)

    def test_zero_pad(self):
        assert zero_pad_processo(1234567890) == "00000000001234567890"
        assert zero_pad_processo(" abc ") == "abc"


class TestNumeric:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("1.234,56", "1234.56"),
            # QUIRK: _format_value has no US-format branch — the comma
            # survives and float() fails → "0" (crawler/crawler.py:119-139)
            ("1,234.56", "0"),
            ("1234,56", "1234.56"),
            ("R$ 31.795,85", "31795.85"),
        ],
    )
    def test_format_numeric_float(self, raw, expected):
        assert format_numeric_value(raw, "float") == expected

    def test_format_numeric_int(self):
        assert format_numeric_value("2024", "int") == "2024"
        assert format_numeric_value("2024.9", "int") == "2024"
        assert format_numeric_value("junk", "int") == "0"
        assert format_numeric_value(None, "int") == "0"

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("R$ 1.234.567,89", Decimal("1234567.89")),
            ("1.234,56", Decimal("1234.56")),
            ("1,234,567.89", Decimal("1234567.89")),
            ("1234,56", Decimal("1234.56")),
            # single dot + 3 trailing digits → thousands separator
            ("1.234", Decimal("1234")),
            ("1234.56", Decimal("1234.56")),
            ("-", Decimal("0.0")),
            (None, Decimal("0.0")),
            (42, Decimal("42")),
            (3.14, Decimal("3.14")),
        ],
    )
    def test_clean_decimal(self, raw, expected):
        assert clean_decimal(raw) == expected

    def test_clean_decimal_simple_no_heuristics(self):
        # the Pagamento variant does NOT resolve pt-BR separators
        assert clean_decimal_simple("R$ 100.50") == Decimal("100.50")
        assert clean_decimal_simple("1.234,56") == Decimal("0.0")  # parse fails → 0

    def test_format_currency(self):
        assert format_currency_brl(1234.5) == "R$ 1.234,50"
        assert format_currency_brl(0.0) == "R$ 0,00"
        assert format_currency_brl(1234567.891) == "R$ 1.234.567,89"


class TestDates:
    def test_epoch_millis(self):
        assert format_date_value("1715558400000") == "2024-05-13 00:00:00"

    def test_epoch_seconds_is_dead(self):
        # QUIRK: the reference's epoch-seconds guard is unsatisfiable
        assert format_date_value("1715558400") == ""

    def test_excel_serial(self):
        assert format_date_value("13717.16") == "1937-07-21 03:50:24"
        assert format_date_value("45000") == "2023-03-15"

    def test_datetime_literal_is_dead(self):
        # QUIRK: the broken raw-string regex means datetime(...) → ""
        assert format_date_value("datetime(2023,8,10)") == ""

    def test_unparseable(self):
        assert format_date_value("not-a-date") == ""
        assert format_date_value(None) == ""

    def test_clean_data_cadastro(self):
        assert clean_data_cadastro("datetime(2023,8,10)") == datetime(2023, 8, 10)
        assert clean_data_cadastro("2023-08-10T00:00:00Z") == datetime(
            2023, 8, 10, tzinfo=__import__("datetime").timezone.utc
        )
        assert clean_data_cadastro("1715558400") == datetime(2024, 5, 13)
        assert clean_data_cadastro("1715558400000") == datetime(2024, 5, 13)
        assert clean_data_cadastro("-") is None
        assert clean_data_cadastro(None) is None

    def test_validate_ano(self):
        assert validate_ano_orcamento("2024", 2026) == 2024
        assert validate_ano_orcamento(1715558400000, 2026) == 2024  # ts → year
        assert validate_ano_orcamento("1715558400000", 2026) == 2024
        assert validate_ano_orcamento(1850, 2026) == 2026  # clamped → default
        assert validate_ano_orcamento(2032, 2026) == 2026
        assert validate_ano_orcamento(2031, 2026) == 2031  # now+5 edge
        assert validate_ano_orcamento("-", 2026) == 2026
        assert validate_ano_orcamento(None, 2026) == 2026

    def test_render_ddmmyyyy(self):
        assert render_date_ddmmyyyy(datetime(2023, 8, 10)) == "10/08/2023"
        assert render_date_ddmmyyyy(None) == ""
        assert render_date_ddmmyyyy("") == ""


class TestFormatDispatch:
    def test_defaults(self):
        assert format_value(None, "date") == ""
        assert format_value(None, "int") == "0"
        assert format_value(None, "str") == "-"
        assert format_value("", "Decimal") == "0"
        assert format_value("none", "str") == "-"

    def test_processo(self):
        assert format_value(1234567890, "processo") == "00000000001234567890"
        assert format_value(" 0001-x ", "processo") == "0001-x"


class TestFinalize:
    def test_valid_row(self):
        row = {
            "ordem": "0",
            "processo": "0004029-51.2023.8.06.0000",
            "comarca": "COMARCA DE MORADA NOVA",
            "ano_orcamento": "2025",
            "natureza": "Alimentar",
            "data_cadastro": "2023-08-10 00:00:00",
            "tipo_classificacao": "Orçamentário",
            "valor_original": "8314.73",
            "valor_atual": "R$ 10.758,54",
            "situacao": "Cadastrado",
        }
        out = finalize_precatorio(row, 2026)
        assert out["processo"] == "0004029-51.2023.8.06.0000"
        assert out["ano_orcamento"] == 2025
        assert out["data_cadastro"] == datetime(2023, 8, 10)
        assert out["valor_original"] == Decimal("8314.73")
        assert out["valor_atual"] == Decimal("10758.54")

    def test_invalid_processo_dropped(self):
        assert finalize_precatorio({"processo": "!!!"}, 2026) is None
        assert finalize_precatorio({"processo": ""}, 2026) is None
