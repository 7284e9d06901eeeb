"""Pure scalar kernels reproducing the reference normalizer battery.

Every function here is deterministic and side-effect free; they are the
unit-tested core that the vectorized ``map_batches`` stages call.
Reference parity citations live on each function.
"""

from crawler_tjce_ray.functions.text import (
    decode_unicode_escapes,
    slugify,
    unslugify,
    digits_only,
    clean_processo,
    is_precatorio_number,
    zero_pad_processo,
)
from crawler_tjce_ray.functions.numeric import (
    normalize_decimal_separators,
    format_numeric_value,
    clean_decimal,
    format_currency_brl,
)
from crawler_tjce_ray.functions.dates import (
    format_date_value,
    clean_data_cadastro,
    validate_ano_orcamento,
    render_date_ddmmyyyy,
)

__all__ = [
    "decode_unicode_escapes",
    "slugify",
    "unslugify",
    "digits_only",
    "clean_processo",
    "is_precatorio_number",
    "zero_pad_processo",
    "normalize_decimal_separators",
    "format_numeric_value",
    "clean_decimal",
    "format_currency_brl",
    "format_date_value",
    "clean_data_cadastro",
    "validate_ano_orcamento",
    "render_date_ddmmyyyy",
]
