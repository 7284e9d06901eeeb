"""Command-line entry points (reference EP2/EP3 parity:
``python main.py --entity X --output f.csv`` → here
``python -m crawler_tjce_ray extract --entity X --output f.csv``).

Intentional divergence: the reference CLI normalizes twice
(crawler/crawler.py:1222 re-runs ``normalize_to_rows`` on
already-normalized dicts, so the second pass finds no ``results`` key
and the CLI writes an EMPTY csv — a real defect).  This CLI implements
the evidently-intended semantics: fetch → extract once → write.

Owns its Ray session (guarded init) — library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import os
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        # Under `ray job submit` (the cluster path) RAY_ADDRESS points
        # at the running cluster and capping cpus is the cluster's
        # job, not ours; standalone invocations fall back to a local
        # session sized by RAY_GRAFT_CPUS.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = {}
        if address == "local":
            kwargs["num_cpus"] = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
        ray.init(
            address=address,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _default_corpus() -> str:
    from crawler_tjce_ray.sources.pages import corpus_cache_dir

    return corpus_cache_dir(n_entities=8, total_pages=40, rows_per_page=50, seed=42)


def cmd_extract(args: argparse.Namespace) -> int:
    """Extract one record kind (optionally one entity) to a display CSV."""
    from crawler_tjce_ray.functions.sinks import write_display_csv
    from crawler_tjce_ray.pipelines.extract_all import (
        assign_global_ordem, extract_entities, extract_records,
    )

    if args.entity and args.kind != "precatorios":
        print(
            f"error: --entity applies only to precatorios "
            f"(the {args.kind} chain is not entity-partitioned)",
            file=sys.stderr,
        )
        return 2
    # validate post-query flags BEFORE any kind-specific early return:
    # the entity list has no filterable/sortable fields, so silently
    # ignoring the flags there would hide user errors
    if args.kind != "precatorios" and any(
        v is not None
        for v in (args.ano_min, args.ano_max, args.valor_min, args.valor_max,
                  args.natureza)
    ):
        print(
            "error: --ano-min/--ano-max/--valor-min/--valor-max/--natureza "
            "filter precatorio fields only",
            file=sys.stderr,
        )
        return 2
    if args.kind == "entities" and args.sort_by:
        print("error: --sort-by does not apply to the entity list",
              file=sys.stderr)
        return 2

    _ensure_ray()
    corpus = args.corpus or _default_corpus()

    if args.kind == "entities":
        # S4/K4: the entity-list chain → single-column display CSV
        # (reference output: data/entidades_tjce.csv, utf-8-sig)
        out = extract_entities(corpus)[["entidade"]]
        n = write_display_csv(out, "entities", args.output)
        print(f"wrote {n} entities -> {args.output}")
        _maybe_upload(args)
        return 0

    frag = None
    slug = None
    if args.entity:
        # M9: resolve name-or-slug through the corpus-seeded registry
        # (exact official name; slugify fallback only for unknowns)
        from crawler_tjce_ray.state.entities import EntityRegistry

        registry = EntityRegistry.from_corpus(corpus)
        official = registry.get_api_entity_name(args.entity)
        slug = registry.get_entity_slug(official)
        if not registry.validate_entity_slug(slug):
            print(
                f"warning: entity {args.entity!r} not in the crawled "
                f"registry; falling back to slug {slug!r}",
                file=sys.stderr,
            )
        else:
            print(f"entity: {official} (slug {slug})")
        frag = f"/{args.kind}/{slug}/"

    # the entity predicate prunes pages BEFORE the DSR decode — other
    # entities' pages are never parsed
    ds = extract_records(corpus, args.kind, url_contains=frag)
    if args.entity:
        # materialize ONCE: the emptiness probe and the downstream sort
        # must not re-execute the whole extraction pipeline
        ds = ds.materialize()
        if ds.count() == 0:
            print(
                f"error: no {args.kind} pages for entity "
                f"{args.entity!r} (slug {slug!r}) in this corpus",
                file=sys.stderr,
            )
            return 2
    # reference contract: rows in crawl order, ordem ascending (O3:
    # client-side re-sort after normalize, edital_crawler.py:630-631).
    # editais chains serve ordem-DESC, so their pages sequence reversed.
    ds = assign_global_ordem(
        ds, descending_pages=(args.kind == "editais")
    ).drop_columns(["url"]).sort("ordem")

    # post-query options (reference apply_filters/sort_rows, main.py:696-737)
    from crawler_tjce_ray.functions.postquery import apply_filters, sort_rows

    has_filters = any(
        v is not None
        for v in (args.ano_min, args.ano_max, args.valor_min, args.valor_max,
                  args.natureza)
    )
    if has_filters:
        ds = apply_filters(
            ds, ano_min=args.ano_min, ano_max=args.ano_max,
            valor_min=args.valor_min, valor_max=args.valor_max,
            natureza=args.natureza,
        )
    if args.sort_by:
        if args.sort_by not in ds.schema().names:
            print(f"error: unknown sort field {args.sort_by!r}", file=sys.stderr)
            return 2
        ds = sort_rows(ds, args.sort_by, args.order)

    n = write_display_csv(ds, args.kind, args.output)
    print(f"wrote {n} {args.kind} rows -> {args.output}")
    _maybe_upload(args)
    return 0


def _maybe_upload(args: argparse.Namespace) -> None:
    """K6 post-write hook: pin the written CSV into the artifact store
    when ``--artifact-store`` is set (the reference uploads to IPFS via
    Pinata after every write, services/pinata_uploader.py)."""
    if not getattr(args, "artifact_store", None):
        return
    from crawler_tjce_ray.functions.artifacts import (
        LocalCASUploader, post_write_upload,
    )

    receipt = post_write_upload(
        [args.output], LocalCASUploader(args.artifact_store)
    )[0]
    print(f"pinned {receipt['name']} -> {receipt['cid']} ({receipt['size']} B)")


def cmd_crawl(args: argparse.Namespace) -> int:
    """Run (or resume) the frontier crawl over a pages corpus."""
    from crawler_tjce_ray.pipelines.crawl import CrawlConfig, run_crawl

    _ensure_ray()
    corpus = args.corpus or _default_corpus()
    cfg = CrawlConfig(max_waves=args.max_waves)
    res = run_crawl(corpus, args.workdir, config=cfg, resume=args.resume)
    ok = int((res.trace["status"] == "ok").sum())
    print(f"crawled {ok} urls in {res.waves_run} waves -> {res.records_dir}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run one registry query (the same surface the driver and the
    HTTP /api/query route use) and write its rows to CSV or Parquet —
    ``--list`` prints the registry instead."""
    from crawler_tjce_ray.pipelines.registry import (
        build_oracle_sql, build_queries,
    )

    qs = build_queries()
    if args.list:
        sql = build_oracle_sql()
        for n in qs:
            print(f"{n}\t{'oracle' if n in sql else 'rows-only'}")
        return 0
    if not args.name:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2
    if args.name not in qs:
        print(f"error: unknown query: {args.name}", file=sys.stderr)
        return 2
    if not args.output:
        print("error: --output required", file=sys.stderr)
        return 2
    if not os.path.isdir(args.sf_dir):
        print(f"error: sf_dir does not exist: {args.sf_dir}", file=sys.stderr)
        return 2
    _ensure_ray()
    res = qs[args.name](args.sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    if args.output.endswith(".parquet"):
        res.to_parquet(args.output, index=False)
    else:
        res.to_csv(args.output, index=False)
    print(f"{args.name}: {len(res)} rows -> {args.output}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="crawler_tjce_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="extract records to a display CSV")
    pe.add_argument("--kind", default="precatorios",
                    choices=["precatorios", "editais", "pagamentos", "entities"])
    pe.add_argument("--entity", default=None,
                    help="entity name or slug (precatórios only)")
    pe.add_argument("--output", required=True)
    pe.add_argument("--corpus", default=None, help="pages parquet dir")
    # post-query options (reference /api/fetch query params)
    pe.add_argument("--ano-min", type=int, default=None)
    pe.add_argument("--ano-max", type=int, default=None)
    pe.add_argument("--valor-min", type=float, default=None)
    pe.add_argument("--valor-max", type=float, default=None)
    pe.add_argument("--natureza", default=None,
                    help="case-insensitive natureza equality filter")
    pe.add_argument("--sort-by", default=None, help="stable sort field")
    pe.add_argument("--order", default="asc", choices=["asc", "desc"])
    pe.add_argument("--artifact-store", default=None,
                    help="post-write hook: pin the CSV into this "
                         "content-addressed store (K6 IPFS analog)")
    pe.set_defaults(fn=cmd_extract)

    pc = sub.add_parser("crawl", help="run the frontier crawl")
    pc.add_argument("--workdir", required=True)
    pc.add_argument("--corpus", default=None)
    pc.add_argument("--resume", action="store_true")
    pc.add_argument("--max-waves", type=int, default=100)
    pc.set_defaults(fn=cmd_crawl)

    pq = sub.add_parser("query", help="run a registry query to CSV/Parquet")
    pq.add_argument("name", nargs="?", default=None,
                    help="query name (see --list)")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="input table directory")
    pq.add_argument("--output", default=None,
                    help=".csv or .parquet output path")
    pq.add_argument("--list", action="store_true",
                    help="print the registry (name + oracle flag)")
    pq.set_defaults(fn=cmd_query)

    ps = sub.add_parser("serve", help="serve the HTTP API (EP1 parity)")
    ps.add_argument("--port", type=int, default=8000)
    ps.add_argument("--corpus", default=None)
    ps.add_argument("--artifact-store", default=None,
                    help="pin served CSVs into this content-addressed "
                         "store (fills pinata_url)")
    from crawler_tjce_ray.serve import cmd_serve

    ps.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
