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
fast path, never correctness).  The digit-run scan is vectorized
numpy (~0.18 ms on a 45 KB body, ~2.5% of the page decode; a Python
``re`` scan measured 0.76 ms — 2.7× the orjson parse itself).
"""

from __future__ import annotations

import json
import re

import numpy as np

try:
    import orjson
except ImportError:  # pragma: no cover
    orjson = None

_BIG_INT_RUN_S = re.compile(r"[0-9]{19}")
_RUN = 19


def _has_long_digit_run(body: bytes) -> bool:
    """True iff ``body`` contains ≥19 consecutive ASCII digits.

    Pure streaming numpy (one wraparound compare + one cumsum + one
    window diff — no index materialization): a 19-run exists iff some
    19-byte window sums to 19 over the digit mask."""
    a = np.frombuffer(body, dtype=np.uint8)
    if len(a) < _RUN:
        return False
    d = (a - np.uint8(48)) < 10  # uint8 wraparound: digits only
    c = np.cumsum(d, dtype=np.int32)
    if c[_RUN - 1] == _RUN:
        return True
    return bool(((c[_RUN:] - c[:-_RUN]) == _RUN).any())


def loads_exact(body):
    """Parse JSON with stdlib-equivalent values; orjson when safe."""
    if orjson is None:
        return json.loads(body)
    if isinstance(body, (bytes, bytearray, memoryview)):
        risky = _has_long_digit_run(bytes(body))
    else:
        risky = _BIG_INT_RUN_S.search(body) is not None
    if risky:
        return json.loads(body)
    try:
        return orjson.loads(body)
    except orjson.JSONDecodeError:
        return json.loads(body)
