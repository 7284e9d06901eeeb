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
                    current_year: int | None = None, batch_size: int = 16,
                    url_contains: str | None = None):
    """pages parquet → typed record Dataset for one record kind.

    Columns are pruned at the read (url + html only); the kind filter
    — and any extra ``url_contains`` predicate (e.g. one entity's
    chain) — is a vectorized substring match applied BEFORE the decode,
    so non-matching pages are never parsed; extraction is a stateless
    ``map_batches`` (pure function of the page → plain tasks, no actor
    pool needed).
    """
    extractor = _EXTRACTORS[kind](current_year)
    ds = read_pages(pages_path, columns=["url", "html"])
    ds = ds.map_batches(
        lambda t, k=kind: filter_kind(t, k), batch_format="pyarrow",
    )
    if url_contains:
        ds = ds.map_batches(
            lambda t, frag=url_contains: t.filter(
                pc.match_substring(t["url"], frag)
            ),
            batch_format="pyarrow",
        )
    return ds.map_batches(extractor, batch_format="pyarrow", batch_size=batch_size)


# driver-state ceiling (BASELINE.md table): the resequencer's
# url→(offset, min_ordem) map is ~200 B/page driver-resident — ~1 GB
# at 5M pages; past it the prefix sum must shard (see the assert)
RESEQ_MAX_DRIVER_PAGES = 5_000_000


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
    records_ds = records_ds.materialize()

    # per-batch (url, n, min_ordem) partials fold on the driver —
    # counts add and mins re-min across batch fragments of one page,
    # so the full record stream never rides a sort exchange (a native
    # groupby("url") would shuffle every record by a string key just
    # to produce these O(#pages) rows)
    def page_partials(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"url": t["url"], "ordem": t["ordem"]})
            .group_by("url")
            .aggregate([("ordem", "count"), ("ordem", "min")])
        )
        return pa.table({
            "url": g["url"],
            "n": pc.cast(g["ordem_count"], pa.int64()),
            "min_ordem": pc.cast(g["ordem_min"], pa.int64()),
        })

    stats = (
        records_ds.map_batches(page_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("url", as_index=False)
        .agg(n=("n", "sum"), min_ordem=("min_ordem", "min"))
    )
    if len(stats) > RESEQ_MAX_DRIVER_PAGES:
        raise ValueError(
            f"assign_global_ordem: {len(stats)} pages exceed "
            f"RESEQ_MAX_DRIVER_PAGES={RESEQ_MAX_DRIVER_PAGES}; shard the "
            "prefix sum: bucket pages by crawl-order range, fold only the "
            "per-bucket row totals on the driver (O(buckets)), and rebase "
            "each bucket's pages in-bucket against its broadcast base "
            "offset")
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
        import pandas as pd

        urls = batch["url"].to_numpy(zero_copy_only=False)
        ordem = batch["ordem"].to_numpy(zero_copy_only=False).astype("int64")
        # factorize → per-PAGE dict lookups, per-ROW numpy gathers (no
        # Python loop over rows; pages ≪ rows per batch)
        codes, uniq = pd.factorize(urls)
        offs = np.fromiter(
            (offsets[u][0] for u in uniq), np.int64, count=len(uniq))
        mos = np.fromiter(
            (offsets[u][1] for u in uniq), np.int64, count=len(uniq))
        out = offs[codes] + (ordem - mos[codes]) + 1
        return batch.set_column(
            batch.schema.get_field_index("ordem"), "ordem", pa.array(out, pa.int64())
        )

    return records_ds.map_batches(add_offset_grouped, batch_format="pyarrow")


def extract_entities(pages_path: str):
    """S4/K4 — the entity-list chain end-to-end: entity pages →
    decoded names → distinct → reference order.

    Reference semantics (schemas/entity_mapping_crawler.py:162-282):
    names accumulate across cursor pages into a set and the final list
    is ``sorted()`` — so order is name-sort, not crawl order, and the
    placeholder "--- Selecione a Entidade" survives (only the exact
    "--- selecione" is dropped by the page decoder; the golden
    data/entidades_tjce.csv keeps the longer one).

    Distributed shape: the decode runs as ``map_batches`` over the
    (pruned, kind-filtered) pages; each batch emits its *distinct*
    names (a combiner — the shuffle carries names, never pages), and
    the driver merges the small partials.  Returns a pandas frame
    ``(entidade, slug)`` — the slug column is the
    ``get_and_save_entities`` mapping payload
    (entity_mapping_crawler.py:329-336).
    """
    import json

    import pandas as pd

    from crawler_tjce_ray.dsr.decode import decode_entities_page
    from crawler_tjce_ray.functions.text import slugify as _slugify

    def decode_batch(t: pa.Table) -> pa.Table:
        names: set[str] = set()
        for body in t["html"]:
            try:
                names.update(decode_entities_page(json.loads(body.as_py())))
            except Exception:
                continue  # corrupt page: skip, like the record kinds
        return pa.table({"entidade": pa.array(sorted(names), pa.string())})

    ds = read_pages(pages_path, columns=["url", "html"])
    parts = (
        ds.map_batches(lambda t: filter_kind(t, "entities"), batch_format="pyarrow")
        .map_batches(decode_batch, batch_size=16, batch_format="pyarrow")
        .to_pandas()
    )
    out = pd.DataFrame({"entidade": sorted(set(parts["entidade"]))})
    out["slug"] = out["entidade"].map(_slugify)
    return out


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
