"""loads_exact: stdlib-equivalent values with the orjson fast path."""

import json
import math

from crawler_tjce_ray.functions.jsonio import loads_exact


def test_big_ints_stay_exact():
    body = '{"R": 18446744073709551616, "v": [9999999999999999999]}'
    got = loads_exact(body)
    assert got == json.loads(body)
    assert isinstance(got["R"], int) and got["R"] == 18446744073709551616


def test_nan_infinity_accepted_like_stdlib():
    body = '{"a": NaN, "b": Infinity, "c": -Infinity}'
    got = loads_exact(body)
    assert math.isnan(got["a"]) and got["b"] == float("inf")


def test_bytes_and_str_inputs():
    assert loads_exact(b'{"x": 1}') == {"x": 1}
    assert loads_exact('{"x": 1.5}') == {"x": 1.5}


def test_fast_path_values_match_stdlib():
    body = '{"i": 123, "f": 1.25, "s": "caf\\u00e9", "l": [1, 2.5, null, true]}'
    assert loads_exact(body) == json.loads(body)
