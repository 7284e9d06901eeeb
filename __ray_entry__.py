"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in crawler_tjce_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (SURVEY.md §7.2): synthesize the deterministic
    Common-Crawl-style pages corpus (BASELINE.json ``input_hint`` shape)
    at small scale, then read_parquet → map_batches(DSR extract) →
    global crawl-order resequencing.  Returns the records Dataset."""
    from crawler_tjce_ray.pipelines.extract_all import run_flagship
    from crawler_tjce_ray.sources.pages import corpus_cache_dir

    pages = corpus_cache_dir(
        n_entities=8, total_pages=40, rows_per_page=50, seed=42
    )
    return run_flagship(pages, current_year=2026)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from crawler_tjce_ray.pipelines.registry import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from crawler_tjce_ray.pipelines.registry import build_oracle_sql

    return build_oracle_sql()
