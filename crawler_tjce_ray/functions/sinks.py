"""CSV display-row converters (the K1-K5 sink formatting).

Canonical storage is typed Parquet; these converters produce the
reference's CSV display views (dd/MM/yyyy dates, ``R$ 1.234,56``
currency, ``"-"`` → ``""`` blanking) and are applied inside a final
``map_batches`` before ``write_csv``.
"""

from __future__ import annotations

from decimal import Decimal

from crawler_tjce_ray.dsr.specs import (
    EDITAL_CSV_FIELDS,
    PAGAMENTO_CSV_FIELDS,
    PRECATORIO_CSV_FIELDS,
)
from crawler_tjce_ray.functions.dates import render_date_ddmmyyyy
from crawler_tjce_ray.functions.numeric import format_currency_brl


def precatorio_to_csv_row(row: dict) -> dict:
    """Parity: ``PrecatoriosCrawler.write_csv`` (crawler/crawler.py:1134-1162)."""
    out = {f: row.get(f) for f in PRECATORIO_CSV_FIELDS}
    out["data_cadastro"] = render_date_ddmmyyyy(row.get("data_cadastro"))
    for f in ("valor_original", "valor_atual"):
        v = out.get(f)
        if isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        elif v is None:
            out[f] = format_currency_brl(0.0)
    return out


def edital_to_csv_row(row: dict) -> dict:
    """Parity: ``save_editais`` (crawler/edital_crawler.py:690-717):
    Decimal → currency; any remaining ``"-"`` blanks to ``""``."""
    out = {}
    for f in EDITAL_CSV_FIELDS:
        v = row.get(f, "-")
        if f == "valor" and isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        else:
            out[f] = str(v) if v != "-" else ""
    return out


def pagamento_to_csv_row(row: dict) -> dict:
    """Parity: ``save_pagamentos`` (crawler/pagamentos_crawler.py:665-710).

    Note the reference writes 17 columns — ``ordem`` is carried in the
    normalized rows but not in the CSV.
    """
    out = {}
    for f in PAGAMENTO_CSV_FIELDS:
        v = row.get(f, "-")
        if isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        else:
            out[f] = str(v) if v != "-" else ""
    return out
