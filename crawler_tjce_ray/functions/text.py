"""String kernels.

Parity targets (reference file:line cited per function; the reference
code is the spec — including its quirks, which are preserved and
flagged QUIRK in docstrings).
"""

from __future__ import annotations

import re
import unicodedata

_SLUG_DROP = re.compile(r"[^a-z0-9\s-]")
_SLUG_DASH = re.compile(r"[-\s]+")

# Precatório process-number display format, e.g. 0001734-46.2020.8.06.0000
# (reference crawler/edital_crawler.py:636-643).
_PRECATORIO_RE = re.compile(r"^\d{7}-\d{2}\.\d{4}\.\d{1}\.\d{2}\.\d{4}$")


def decode_unicode_escapes(value: str) -> str:
    """Fix ``\\u00XX`` escape sequences left in API strings.

    latin-1 → unicode-escape → latin-1 → utf-8 round trip; returns the
    input unchanged on any codec error.  Parity:
    ``PrecatoriosCrawler._decode_utf8`` (crawler/crawler.py:84-97; the
    same helper is duplicated at schemas/entity_mapping_crawler.py:21-34).
    """
    if not isinstance(value, str):
        return str(value)
    try:
        return (
            value.encode("latin-1")
            .decode("unicode-escape")
            .encode("latin-1")
            .decode("utf-8")
        )
    except (UnicodeError, AttributeError):
        return value


def slugify(text: str) -> str:
    """``'MUNICÍPIO DE FORTALEZA' -> 'municipio-de-fortaleza'``.

    NFKD accent folding, lowercase, drop non ``[a-z0-9 -]``, collapse
    runs of space/dash to a single dash.  Parity:
    schemas/entity_mapping.py:7-20.
    """
    text = text.lower()
    text = unicodedata.normalize("NFKD", text)
    text = "".join(c for c in text if not unicodedata.combining(c))
    text = _SLUG_DROP.sub("", text)
    return _SLUG_DASH.sub("-", text).strip("-")


def unslugify(slug: str) -> str:
    """``'municipio-de-fortaleza' -> 'MUNICIPIO DE FORTALEZA'``.

    Parity: schemas/entity_mapping.py:23-28.
    """
    return slug.replace("-", " ").upper()


def digits_only(value: str) -> str:
    """Keep only digits; empty result → ``"-"`` (CPF/CNPJ cleaning).

    Parity: ``Pagamento.clean_cpf_cnpj`` (models/models.py:330-339).
    """
    if value is None or (isinstance(value, str) and not value.strip()):
        return "-"
    if not isinstance(value, str):
        return str(value).strip()
    cleaned = "".join(c for c in value if c.isdigit())
    return cleaned if cleaned else "-"


def clean_processo(value) -> str | None:
    """Keep alnum/``-``/``.`` characters; ``None`` marks an invalid row.

    The reference raises ``ValueError`` inside a Pydantic validator and
    drops the row (models/models.py:48-59 via crawler/crawler.py:1074);
    here invalidity is signalled with ``None`` so a vectorized filter
    can drop it with a side-channel count.
    """
    if not value or not isinstance(value, str):
        if isinstance(value, (int, float)) and not isinstance(value, bool):
            return f"{value:.0f}"
        return None
    processed = "".join(c for c in value if c.isalnum() or c in "-.")
    if not processed.strip():
        return None
    return processed.strip()


def is_precatorio_number(value) -> bool:
    """True when *value* matches the precatório display pattern.

    Used by the edital decoder to treat a direct string that *looks*
    like a process number as a literal value even when the column is
    dictionary-encoded.  Parity: crawler/edital_crawler.py:636-643.
    """
    if not isinstance(value, str):
        return False
    return bool(_PRECATORIO_RE.match(value.strip()))


def zero_pad_processo(value) -> str:
    """Numeric process ids render as 20-digit zero-padded strings.

    Parity: the ``processo`` branch of ``_format_value``
    (crawler/crawler.py:114-117).
    """
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return f"{value:020.0f}"
    return str(value).strip()


def clean_optional_string(value) -> str:
    """Blank / ``None`` / ``"-"`` → ``"-"``; otherwise stripped str.

    Parity: ``Precatorio.clean_optional_strings`` (models/models.py:61-70).
    """
    if value is None or (isinstance(value, str) and not value.strip()) or value == "-":
        return "-"
    if not isinstance(value, str):
        return str(value).strip()
    return value.strip()
