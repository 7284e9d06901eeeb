"""Exact JSON parsing with an orjson fast path.

orjson is ~4× faster on the ~300 KB DSR envelopes but is NOT
value-equivalent to the stdlib parser in two ways that matter here
(verified against orjson 3.8.3):

* integers beyond 64 bits parse as *floats* silently — the decoders'
  documented big-``R``/big-cell semantics (int64 overflow → scalar
  replay) depend on receiving exact ints;
* ``NaN``/``Infinity`` literals are rejected outright, turning a page
  the stdlib parser accepts into a pages_failed drop.

``loads_exact`` therefore routes a body through stdlib ``json`` when
it might hit either divergence: any parse error (covers NaN/Infinity)
or any 19+-digit run (covers big ints — 19 digits is the first length
that can exceed int64; false positives inside strings only cost the
fast path, never correctness).
"""

from __future__ import annotations

import json
import re

try:
    import orjson
except ImportError:  # pragma: no cover
    orjson = None

_BIG_INT_RUN = re.compile(rb"[0-9]{19}")
_BIG_INT_RUN_S = re.compile(r"[0-9]{19}")


def loads_exact(body):
    """Parse JSON with stdlib-equivalent values; orjson when safe."""
    if orjson is None:
        return json.loads(body)
    pat = _BIG_INT_RUN if isinstance(body, (bytes, bytearray, memoryview)) else _BIG_INT_RUN_S
    if pat.search(body):
        return json.loads(body)
    try:
        return orjson.loads(body)
    except orjson.JSONDecodeError:
        return json.loads(body)
