"""Flagship pipeline (SURVEY.md §7.2 minimum slice):

``read_parquet(pages)`` → filter record-kind → ``map_batches(extract)``
→ deterministic global ``ordem`` resequencing → records.

Everything streams; the only materialized intermediate is the tiny
per-page row-count table used for the order prefix-sum (one row per
*page*, not per record — ~1/500th of the data).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from crawler_tjce_ray.sources.pages import read_pages
from crawler_tjce_ray.stages.extract import (
    ExtractEditais,
    ExtractPagamentos,
    ExtractPrecatorios,
    filter_kind,
)

_EXTRACTORS = {
    "precatorios": ExtractPrecatorios,
    "editais": ExtractEditais,
    "pagamentos": ExtractPagamentos,
}

_URL_RE = re.compile(r"/(precatorios|editais|pagamentos|entities)/(?:([^/]+)/)?page/(\d+)")


def crawl_order_key(url: str) -> tuple[str, int]:
    """Deterministic crawl-order key of a page url: (entity slug, page no).

    The reference crawls one entity at a time following the
    restart-token chain (crawler/crawler.py:556-677); entities sort by
    slug, pages by position in the chain.
    """
    m = _URL_RE.search(url)
    if not m:
        return ("", 0)
    return (m.group(2) or "", int(m.group(3)))


def extract_records(pages_path: str, kind: str = "precatorios",
                    current_year: int | None = None, batch_size: int = 16):
    """pages parquet → typed record Dataset for one record kind.

    Columns are pruned at the read (url + html only); the kind filter
    is a vectorized substring match; extraction is a stateless
    ``map_batches`` (pure function of the page → plain tasks, no actor
    pool needed).
    """
    extractor = _EXTRACTORS[kind](current_year)
    ds = read_pages(pages_path, columns=["url", "html"])
    ds = ds.map_batches(
        lambda t, k=kind: filter_kind(t, k), batch_format="pyarrow",
    )
    return ds.map_batches(extractor, batch_format="pyarrow", batch_size=batch_size)


def assign_global_ordem(records_ds, descending_pages: bool = False):
    """M7 — overwrite ``ordem`` with a global 1-based sequence in crawl
    order (reference: crawler/crawler.py:1056-1057 with the counter
    carried across pages at :540,585-590).

    Distributed recipe: per-page row counts + min page-local ordem
    (small aggregate) → prefix sums over the deterministic crawl order
    on the driver → broadcast url→(offset, min) map → vectorized
    per-batch add.  Scales as O(#pages) driver state, never
    O(#records), and is correct even when one page's rows straddle a
    batch/block boundary (the rebase uses the page-GLOBAL min ordem,
    never a batch-local one).
    """
    # consumed twice (stats pass + rewrite pass): materialize the
    # extraction output once, or the whole read+DSR-decode re-executes
    from ray.data.aggregate import Count, Min

    records_ds = records_ds.materialize()
    stats = (
        records_ds.groupby("url")
        .aggregate(Count(alias_name="n"), Min(on="ordem", alias_name="min_ordem"))
        .to_pandas()
    )
    stats["key"] = stats["url"].map(crawl_order_key)
    stats = stats.sort_values("key", ascending=not descending_pages, kind="mergesort")
    offsets: dict[str, tuple[int, int]] = {}
    running = 0
    for url, n, mo in zip(stats["url"], stats["n"], stats["min_ordem"]):
        offsets[url] = (running, int(mo))
        running += int(n)

    # page-local ordem is 1-based for precatorios/editais and 0-based
    # for pagamentos; rebase each row against its page's GLOBAL min so
    # the offset add is robust to either convention and to batching
    def add_offset_grouped(batch: pa.Table) -> pa.Table:
        import numpy as np

        urls = batch["url"].to_pylist()
        ordem = batch["ordem"].to_numpy(zero_copy_only=False).astype("int64")
        out = np.empty(len(urls), dtype="int64")
        i = 0
        while i < len(urls):
            j = i
            while j < len(urls) and urls[j] == urls[i]:
                j += 1
            off, mo = offsets[urls[i]]
            out[i:j] = off + (ordem[i:j] - mo) + 1
            i = j
        return batch.set_column(
            batch.schema.get_field_index("ordem"), "ordem", pa.array(out, pa.int64())
        )

    return records_ds.map_batches(add_offset_grouped, batch_format="pyarrow")


def run_flagship(pages_path: str, out_dir: str | None = None,
                 current_year: int | None = None):
    """The §7.2 flagship: extract precatórios with global ordering.

    Returns the Dataset; optionally writes partitioned Parquet.
    """
    ds = extract_records(pages_path, "precatorios", current_year)
    ds = assign_global_ordem(ds)
    if out_dir:
        ds.write_parquet(out_dir)
    return ds
