"""Power BI "DSR" wire-format decode/encode.

A DSR page is ``results[0].result.data.{descriptor,dsr}`` where
``dsr.DS[0]`` carries named string dictionaries (``ValueDicts``), a
row list ``PH[0].DM0`` (base row with schema ``S`` + column values
``C``; delta rows with a sparse ``C`` and an inherit-bitmask ``R``),
restart tokens ``RT`` (the pagination cursor) and an ``IC``
is-complete flag.  See SURVEY.md §1.1 and the reference fixtures
``examples/response*.json``.
"""

from crawler_tjce_ray.dsr.decode import (
    decode_editais_page,
    decode_entities_page,
    decode_pagamentos_page,
    decode_precatorios_page,
    extract_restart_tokens,
    navigate_envelope,
)

__all__ = [
    "decode_precatorios_page",
    "decode_editais_page",
    "decode_pagamentos_page",
    "decode_entities_page",
    "extract_restart_tokens",
    "navigate_envelope",
]
