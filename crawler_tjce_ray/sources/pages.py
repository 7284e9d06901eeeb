"""The ``pages`` source: Common-Crawl-style Parquet (BASELINE.json
``input_hint`` schema) — synthesis, partitioned writing, pruned reads.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def write_pages_corpus(
    out_dir: str,
    n_entities: int = 12,
    total_pages: int = 60,
    rows_per_page: int = 100,
    seed: int = 42,
    num_blocks: int | None = None,
    dominant_share: float = 0.65,
) -> list:
    """Generate the synthetic corpus in parallel and write partitioned
    Parquet.  Returns the page plan (driver-side metadata).

    Generation is a pure function of ``(seed, page index)``, so it runs
    as a stateless ``map_batches`` over a ``range`` dataset — each task
    generates its slice independently (no driver-side row loop), which
    is the same pattern a 100 TB synthesis would use.  Output is a
    directory of part files.  NOTE: Ray's write_parquet APPENDS
    uniquely-named parts — rerunning into a non-empty dir duplicates
    the corpus; go through ``corpus_cache_dir`` (which wipes partial
    dirs and guards with a marker) rather than calling this directly.
    """
    import ray.data as rd

    from crawler_tjce_ray.dsr.synth import build_page_plan, generate_page

    plan = build_page_plan(
        n_entities=n_entities, total_pages=total_pages, seed=seed,
        dominant_share=dominant_share,
    )
    plan_arr = plan  # small: one dataclass per page, broadcast via closure

    def gen(batch: dict) -> pa.Table:
        rows = [generate_page(plan_arr[i], rows_per_page, seed) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    n = len(plan)
    ds = rd.range(n, override_num_blocks=num_blocks or max(1, min(64, n // 4 or 1)))
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(gen, batch_format="pyarrow", batch_size=16).write_parquet(out_dir)
    return plan


def read_pages(path: str, columns: list[str] | None = None, **kwargs):
    """Pruned read of a pages corpus (pass only the columns the stage
    needs — e.g. ``["url", "html"]`` for extraction)."""
    import ray.data as rd

    return rd.read_parquet(path, columns=columns, **kwargs)


def corpus_cache_dir(
    base: str = "/tmp/tjce_pages_cache",
    n_entities: int = 12,
    total_pages: int = 60,
    rows_per_page: int = 100,
    seed: int = 42,
    dominant_share: float = 0.65,
) -> str:
    """Deterministic cache path for a synthetic corpus configuration;
    generates it on first use (used by queries()/bench so repeated runs
    skip synthesis)."""
    import shutil

    from crawler_tjce_ray.dsr.synth import CORPUS_FORMAT_VERSION

    key = (
        f"v{CORPUS_FORMAT_VERSION}_e{n_entities}_p{total_pages}"
        f"_r{rows_per_page}_s{seed}_d{dominant_share}"
    )
    out = os.path.join(base, key)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        # a dir without the marker is a partial/failed write — wipe it,
        # otherwise write_parquet would append duplicate part files
        shutil.rmtree(out, ignore_errors=True)
        write_pages_corpus(
            out, n_entities=n_entities, total_pages=total_pages,
            rows_per_page=rows_per_page, seed=seed,
            dominant_share=dominant_share,
        )
        with open(marker, "w") as f:
            f.write("ok\n")
    return out
