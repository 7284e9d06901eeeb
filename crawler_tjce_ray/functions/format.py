"""The typed value formatter and the model-level row finalizers.

``format_value`` is the single dispatcher the reference calls for every
decoded cell (crawler/crawler.py:99-250); the finalizers reproduce the
Pydantic validators (models/models.py) at plain-dict level so the Ray
stages can run them vectorized without Pydantic.
"""

from __future__ import annotations

from crawler_tjce_ray.functions.dates import (
    clean_data_cadastro,
    format_date_value,
    validate_ano_orcamento,
)
from crawler_tjce_ray.functions.numeric import clean_decimal, format_numeric_value
from crawler_tjce_ray.functions.text import (
    clean_optional_string,
    clean_processo,
    zero_pad_processo,
)

NUMERIC_TYPES = ("int", "float", "Decimal")


def format_value(value, field_type: str) -> str:
    """Dispatch on field type → normalized display string.

    Parity: ``PrecatoriosCrawler._format_value`` (crawler/crawler.py:99-250).
    Empty/None defaults: ``""`` for dates, ``"0"`` for numerics, ``"-"``
    for strings.
    """
    value_str = str(value)
    if value is None or (not value_str.strip() or value_str.lower() == "none"):
        if field_type == "date":
            return ""
        if field_type in NUMERIC_TYPES:
            return "0"
        return "-"
    try:
        if field_type == "processo":
            return zero_pad_processo(value)
        if field_type in NUMERIC_TYPES:
            return format_numeric_value(value, field_type)
        if field_type == "date":
            return format_date_value(value)
        return value_str.strip()
    except Exception:
        if field_type in NUMERIC_TYPES:
            return "0"
        if field_type == "date":
            return ""
        return "-"


def finalize_precatorio(row: dict, current_year: int | None = None) -> dict | None:
    """Apply the ``Precatorio`` model validators to a formatted row.

    Returns the canonical-typed dict or ``None`` when the row is
    invalid (empty ``processo`` — the reference drops it with a logged
    ValidationError, crawler/crawler.py:1074-1081).
    Parity: models/models.py:25-228.
    """
    processo = clean_processo(row.get("processo"))
    if processo is None:
        return None
    try:
        ordem = int(float(row.get("ordem", 0) or 0))
    except (TypeError, ValueError):
        ordem = 0
    if ordem < 0:
        return None
    return {
        "ordem": ordem,
        "processo": processo,
        "comarca": clean_optional_string(row.get("comarca")),
        "ano_orcamento": validate_ano_orcamento(row.get("ano_orcamento"), current_year),
        "natureza": clean_optional_string(row.get("natureza")),
        "data_cadastro": clean_data_cadastro(row.get("data_cadastro")),
        "tipo_classificacao": clean_optional_string(row.get("tipo_classificacao")),
        "valor_original": clean_decimal(row.get("valor_original")),
        "valor_atual": clean_decimal(row.get("valor_atual")),
        "situacao": clean_optional_string(row.get("situacao")),
    }


# NOTE: the display-row converters (dd/MM/yyyy dates, R$ currency)
# live in functions/sinks.py next to the CSV writers that apply them;
# the pagamento post-processing lives inline in dsr/decode.py where
# the reference applies it (pagamentos_crawler.py:585-607).
