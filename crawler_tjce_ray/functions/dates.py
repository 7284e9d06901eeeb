"""Date kernels: the four-strategy date formatter and validators.

Timezone note: the reference converts epochs with
``datetime.fromtimestamp`` (machine-local timezone,
crawler/crawler.py:178,185).  This engine pins UTC so results are
deterministic on any machine; on a UTC host (the reference deployment
and this sandbox) the outputs are byte-identical.
"""

from __future__ import annotations

import re
from datetime import date, datetime, timedelta, timezone

# QUIRK preserved: the reference writes this pattern as a *raw* string
# with doubled backslashes (r"datetime\\s*\\(([^)]+)\\)",
# crawler/crawler.py:145-147), so it matches a literal backslash and
# never fires on real input.  ``format_date_value`` therefore returns
# "" for every ``datetime(...)`` literal (the float() fallback raises),
# and only the Pydantic-level ``clean_data_cadastro`` parses them.
_DEAD_DATETIME_RE = re.compile(r"datetime\\s*\\(([^)]+)\\)", re.IGNORECASE)

_EXCEL_EPOCH = datetime(1899, 12, 30)


def _from_epoch(seconds: float) -> datetime:
    return datetime.fromtimestamp(seconds, tz=timezone.utc).replace(tzinfo=None)


def format_date_value(value) -> str:
    """The ``date`` branch of ``_format_value`` → display string.

    Strategies, in order (crawler/crawler.py:141-233):

    1. ``datetime(Y,M,D,...)`` literal — dead in practice (see QUIRK
       above): the string contains "datetime", the broken regex fails,
       ``float()`` raises, and "" is returned.
    2. epoch-milliseconds: 1e11 < ts < 3e14 → ``str(datetime)``.
    3. epoch-seconds: the reference guard ``ts > 1e9 and ts < 3e8`` is
       unsatisfiable (crawler/crawler.py:182-184) — QUIRK preserved:
       numeric epoch-seconds never parse here and fall through to "".
    4. Excel serial days (1 < ts < 80000), base 1899-12-30; renders
       ``%Y-%m-%d`` when the time-of-day is midnight else
       ``%Y-%m-%d %H:%M:%S``.

    Anything else → "".
    """
    value_str = str(value)
    if value is None or (not value_str.strip() or value_str.lower() == "none"):
        return ""
    # QUIRK preserved: the reference has NO datetime branch here — a
    # datetime input stringifies, contains no "datetime(" literal,
    # fails float(), and renders "" (crawler/crawler.py:141-233)

    if isinstance(value_str, str):
        if "datetime" in value_str.lower():
            match = _DEAD_DATETIME_RE.search(value_str)
            if match:  # unreachable on real input; kept for parity
                try:
                    components = [int(c.strip()) for c in match.group(1).split(",")]
                    if len(components) >= 3:
                        if components[1] == 0 and len(components) > 1:
                            components[1] = 1
                        return str(datetime(*components))
                    return ""
                except ValueError:
                    return ""
        try:
            ts = float(value_str)
        except ValueError:
            return ""
        if 100000000000 < ts < 300000000000000:  # epoch millis
            return str(_from_epoch(ts / 1000.0))
        if ts > 1000000000 and ts < 300000000:  # unsatisfiable (reference parity)
            return str(_from_epoch(ts))
        if 1 < ts < 80000:  # Excel serial days
            try:
                delta_days = int(ts)
                delta_fraction = ts - delta_days
                dt = (
                    _EXCEL_EPOCH
                    + timedelta(days=delta_days)
                    + timedelta(seconds=delta_fraction * 86400)
                )
                return (
                    dt.strftime("%Y-%m-%d %H:%M:%S")
                    if dt.time() != datetime.min.time()
                    else dt.strftime("%Y-%m-%d")
                )
            except (ValueError, OverflowError):
                return ""
        return ""
    return ""


def clean_data_cadastro(value) -> datetime | None:
    """Pydantic-level date cleaner → ``datetime`` or ``None``.

    Order (models/models.py:72-119): passthrough datetimes; a *working*
    ``datetime(Y,M,D,...)`` literal parse; ISO-8601 (with ``Z`` fix);
    digit-strings and numbers as epoch seconds-vs-millis split at
    253402300799 (year 9999 in seconds).
    """
    if value is None or (isinstance(value, str) and (value.strip() == "-" or not value.strip())):
        return None
    if isinstance(value, datetime):
        return value
    if isinstance(value, date):  # models/models.py:80-81
        return datetime.combine(value, datetime.min.time())

    if isinstance(value, str):
        if "datetime" in value.lower():
            try:
                parts_str = value[value.lower().find("datetime(") + len("datetime(") : value.rfind(")")]
                parts = [int(p.strip()) for p in parts_str.split(",")]
                return datetime(*parts)
            except (ValueError, TypeError):
                return None
        try:
            return datetime.fromisoformat(value.replace("Z", "+00:00"))
        except ValueError:
            pass
        try:
            if value.isdigit():
                num = float(value)
                if num > 253402300799:
                    return _from_epoch(num / 1000.0)
                return _from_epoch(num)
        except ValueError:
            pass
        return None

    if isinstance(value, (int, float)):
        try:
            if value > 253402300799:
                return _from_epoch(value / 1000.0)
            return _from_epoch(value)
        except Exception:
            return None
    return None


def validate_ano_orcamento(value, current_year: int | None = None) -> int:
    """Budget-year validator: timestamps → year, clamp 1900..now+5.

    Parity: ``Precatorio.validate_ano_orcamento`` (models/models.py:121-165).
    ``current_year`` is injectable for deterministic tests; pipelines
    default to the wall-clock year exactly like the reference.
    """
    if current_year is None:
        current_year = datetime.now().year
    default_ano = current_year

    if value is None or (isinstance(value, str) and (value.strip() == "-" or not value.strip())):
        return default_ano

    if isinstance(value, str):
        if not value.isdigit():
            if len(value) > 8 and all(c.isdigit() for c in value):
                try:
                    return _from_epoch(int(value) / 1000.0).year
                except ValueError:
                    return default_ano
            return default_ano
        try:
            v_int = int(value)
        except ValueError:
            return default_ano
    elif isinstance(value, (int, float)) and not isinstance(value, bool):
        v_int = int(value)
    else:
        return default_ano

    if v_int > 3000 and len(str(v_int)) > 8:
        try:
            return _from_epoch(v_int / 1000.0).year
        except ValueError:
            pass
    if 1900 <= v_int <= current_year + 5:
        return v_int
    return default_ano


def render_date_ddmmyyyy(value) -> str:
    """CSV display renderer: ``datetime`` → ``dd/MM/yyyy``, else ""/as-is.

    Parity: the ``data_cadastro`` branch of ``write_csv``
    (crawler/crawler.py:1141-1147).
    """
    try:  # pd.NaT passes isinstance(datetime) but strftime raises
        import pandas as _pd

        if _pd.isna(value):
            return ""
    except (TypeError, ValueError):
        pass
    if isinstance(value, datetime):
        return value.strftime("%d/%m/%Y")
    if value is None or str(value).strip() == "":
        return ""
    return str(value)
