"""Exchange fan-out sizing for coarse-bucket shuffles.

Every ``groupby("kb").map_groups(fn)`` exchange in this package
materializes ONE bucket as ONE in-task frame.  For exchanges that
carry *partials* (bounded per-key aggregates) a fixed 64-way fan-out
is fine at any corpus size — the bucket payload is O(keys/64), not
O(rows).  For exchanges that carry *row-level data* (big-big joins,
text-carrying dedup hops) the bucket payload is O(corpus/buckets), so
the fan-out must grow with the input: at 100 TB a 64-way exchange
puts ~1.5 TB in a single task.

``buckets_for_bytes`` derives a power-of-two fan-out from the
estimated input bytes so one bucket's decompressed payload targets
``TARGET_BUCKET_BYTES`` — the same size-from-input discipline the
politeness and page-store layers already use.  At test scale the
estimate clamps to the 64 floor, so small-sf plans (and their strict
oracle hashes) are unchanged; the fan-out only widens when the data
does.  Tests pin oracle equality at forced 16- and 128-way fan-outs
(tests/test_exchange_fanout.py), so correctness is bucket-count
invariant by construction, not by luck.

Ops override order: ``set_forced_buckets()`` (tests) >
``CRAWLER_EXCHANGE_BUCKETS`` env > size-derived value.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# target decompressed bytes of row payload per bucket task — sized so a
# bucket frame plus its join/merge scratch fits a worker heap with room
# to spare (32 workers × 256 MB ≈ 8 GB resident on a 128 GB node)
TARGET_BUCKET_BYTES = 256 * 1024 * 1024
# snappy parquet on these schemas decompresses ~4x (measured on the
# testdata tables; text-heavy tables run closer to 3x)
PARQUET_INFLATION = 4
MIN_BUCKETS = 64
MAX_BUCKETS = 1 << 16

_FORCED: int | None = None


def set_forced_buckets(n: int | None) -> None:
    """Force a fan-out (tests / ops).  Must be a power of two so the
    ``& (nb-1)`` bucket key stays an exact mod; ``None`` clears."""
    global _FORCED
    if n is not None and (n < 1 or n & (n - 1)):
        raise ValueError(f"bucket count must be a power of two, got {n}")
    _FORCED = n


def _next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def buckets_for_bytes(est_file_bytes: int | None) -> int:
    """Fan-out for a row-carrying exchange whose payload is roughly
    the given on-disk input size.  ``None`` (unknown) → the 64 floor."""
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("CRAWLER_EXCHANGE_BUCKETS")
    if env:
        n = int(env)
        if n < 1 or n & (n - 1):
            raise ValueError(
                f"CRAWLER_EXCHANGE_BUCKETS must be a power of two, got {n}")
        return n
    if not est_file_bytes:
        return MIN_BUCKETS
    need = (est_file_bytes * PARQUET_INFLATION) // TARGET_BUCKET_BYTES
    return min(MAX_BUCKETS, max(MIN_BUCKETS, _next_pow2(int(need))))


def table_bytes(sf_dir: str, *tables: str) -> int | None:
    """Sum of on-disk bytes of the named tables (parquet preferred,
    any other single-file extension accepted) — the cheap input-size
    estimate ``buckets_for_bytes`` consumes.  Missing files are
    skipped; returns None if nothing was found."""
    total, found = 0, False
    for t in tables:
        for ext in ("parquet", "jsonl", "csv", "json"):
            p = os.path.join(sf_dir, f"{t}.{ext}")
            if os.path.exists(p):
                total += os.path.getsize(p)
                found = True
                break
    return total if found else None


def band_subbuckets(total_buckets: int | None, n_bands: int) -> int:
    """Per-band sub-bucket count for LSH-style banding exchanges: the
    size-derived TOTAL group budget (``buckets_for_bytes``) split
    across the bands, floored at 1 and rounded to a power of two so
    the ``& (nb-1)`` key stays an exact mod.  At the 64-bucket floor a
    32-band scheme gets 2 sub-buckets/band (near-zero overhead vs
    band-only grouping); the fan-out only widens when the data
    does."""
    if not total_buckets:
        return 1
    return _next_pow2(max(1, total_buckets // max(1, n_bands)))


def kb_arrow(key: pa.ChunkedArray | pa.Array, nb: int) -> pa.ChunkedArray:
    """key & (nb-1) as a pyarrow kernel — exact mod for non-negative
    keys and power-of-two nb."""
    return pc.bit_wise_and(pc.cast(key, pa.int64()), pa.scalar(nb - 1, pa.int64()))


def kb_numpy(key: np.ndarray, nb: int) -> np.ndarray:
    """Same bucket key for int64 numpy arrays."""
    return key & np.int64(nb - 1)


def kb_words(words, nb: int) -> np.ndarray:
    """Bucket keys for a string key column, vectorized: pandas'
    process-stable siphash (fixed key — the same cross-process
    determinism guarantee the paragraph-dedup hop relies on) masked to
    the power-of-two fan-out.  Any word→bucket FUNCTION co-locates all
    rows of a key, which is the only property these exchanges need —
    the forced-16/128 invariance tests pin that the downstream result
    does not depend on the assignment."""
    import pandas as pd

    arr = np.asarray(words, dtype=object)
    if arr.size == 0:
        return np.empty(0, np.int64)
    return (pd.util.hash_array(arr) & np.uint64(nb - 1)).astype(np.int64)
