"""Numeric / currency kernels (pt-BR ↔ US separator disambiguation).

The two separator resolvers in the reference differ subtly and both are
kept: ``normalize_decimal_separators`` (the ``_format_value`` variant)
and ``clean_decimal`` (the Pydantic-validator variant with the extra
thousands heuristics).
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation


def normalize_decimal_separators(value: str) -> str:
    """Strip ``R$`` and resolve ``1.234,56`` vs ``1,234.56`` to ``.``-decimal.

    Parity: the numeric branch of ``_format_value``
    (crawler/crawler.py:119-127): only two rules — if both separators
    present and the last ``.`` precedes the last ``,``, treat ``.`` as
    thousands; else a lone ``,`` becomes the decimal point.
    """
    temp = value.replace("R$", "").strip()
    if "," in temp and "." in temp:
        if temp.rfind(".") < temp.rfind(","):
            temp = temp.replace(".", "").replace(",", ".")
    elif "," in temp:
        temp = temp.replace(",", ".")
    return temp


def format_numeric_value(value, field_type: str) -> str:
    """The int/float/Decimal branch of ``_format_value`` → string.

    Empty/None → ``"0"``; unparseable → ``"0"``; ints truncate through
    ``float``.  Parity: crawler/crawler.py:99-139 (numeric paths only).
    """
    value_str = str(value)
    if value is None or (not value_str.strip() or value_str.lower() == "none"):
        return "0"
    temp = normalize_decimal_separators(value_str)
    try:
        val = float(temp)
    except (ValueError, TypeError):
        return "0"
    if field_type == "int":
        return str(int(val))
    return str(val)


def clean_decimal(value) -> Decimal:
    """Money cleaner → ``Decimal``; the Pydantic-validator semantics.

    Handles ``R$`` prefixes and four separator layouts plus the
    trailing-3-digit thousands heuristic.  Unparseable → ``0.0``.
    Parity: ``Precatorio.clean_decimal_fields`` (models/models.py:167-228).

    QUIRK preserved: the ``1.234`` (single dot, 3 trailing digits)
    case walks an inner heuristic whose first sub-branch
    (models/models.py:203-208) checks ``not any(isdigit)`` over digit
    characters and therefore never fires; the effective rule is: a
    single dot whose decimal part is not exactly 2 digits is treated
    as a thousands separator and removed.
    """
    if isinstance(value, Decimal):
        return value
    if value is None or (isinstance(value, str) and (value.strip() == "-" or not value.strip())):
        return Decimal("0.0")
    if isinstance(value, str):
        cleaned = value.replace("R$", "").strip()
        num_dots = cleaned.count(".")
        num_commas = cleaned.count(",")
        if num_commas == 1 and num_dots > 1:  # 1.234.567,89
            cleaned = cleaned.replace(".", "").replace(",", ".")
        elif num_commas == 1 and num_dots == 1 and cleaned.rfind(",") > cleaned.rfind("."):
            cleaned = cleaned.replace(".", "").replace(",", ".")  # 1.234,56
        elif num_commas > 1 and num_dots == 1:  # 1,234,567.89
            cleaned = cleaned.replace(",", "")
        elif num_commas == 1 and num_dots == 0:  # 1234,56
            cleaned = cleaned.replace(",", ".")
        elif num_dots == 1 and num_commas == 0 and len(cleaned.split(".")[-1]) == 3:
            if (
                cleaned.count(".") == 1
                and len(cleaned.split(".")[-1]) == 3
                and not any(ch.isdigit() for ch in cleaned.split(".")[-1][:2])
            ):
                pass  # dead sub-branch in the reference, kept for parity
            elif cleaned.count(".") >= 1 and len(cleaned.split(".")[-1]) != 2:
                cleaned = cleaned.replace(".", "")
        try:
            return Decimal(cleaned)
        except InvalidOperation:
            return Decimal("0.0")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return Decimal(str(value))
    return Decimal("0.0")


def clean_decimal_simple(value) -> Decimal:
    """The Pagamento-model money cleaner — no separator heuristics.

    Strips ``R$`` and parses as-is; failures → ``0.0``.  Parity:
    ``Pagamento.clean_decimal_fields`` (models/models.py:341-360).
    """
    if isinstance(value, Decimal):
        return value
    if value is None or (isinstance(value, str) and (value.strip() == "-" or not value.strip())):
        return Decimal("0.0")
    if isinstance(value, str):
        cleaned = value.replace("R$", "").strip()
        try:
            return Decimal(cleaned)
        except InvalidOperation:
            return Decimal("0.0")
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return Decimal(str(value))
    return Decimal("0.0")


def format_currency_brl(value: float) -> str:
    """``1234.5 -> 'R$ 1.234,50'`` — the deterministic manual path.

    The reference prefers ``locale.currency`` when ``pt_BR.UTF-8`` is
    installed and falls back to this manual formatter otherwise
    (crawler/crawler.py:60-67).  The manual path is the one this engine
    standardizes on (deterministic across machines, SURVEY.md §2.2-M10).
    """
    value_str = f"{value:,.2f}".replace(",", "X").replace(".", ",").replace("X", ".")
    return f"R$ {value_str}"
