"""The wave-synchronous frontier crawl (SURVEY.md §7.1, the north rule
architecture):

    seeds → frontier ──per wave──►
      select (priority sort + per-host politeness cap + wave cap)
      → URL-seen filter (sharded cuckoo actors, check-and-add)
      → fetch (actor pool: page-store lookup + robots + token bucket)
      → parse (stateless DSR extract) → records/<kind>/wave=k parquet
      → outlinks → frontier ∪ new urls
      → checkpoint (frontier, cuckoo shards, lineage, metrics)

Determinism contract: crawl order is defined by the frontier sort key
(priority=depth, next_fetch_wave, url) — a total order — never by
fetch completion; a killed run resumed from wave k reproduces waves
k+1.. byte-identically (tested).

Scale notes: the per-wave working set is bounded by ``wave_size``;
frontier bookkeeping here is pandas on the driver, which holds to
~10^7 pending urls — beyond that the same select/update steps run as
Dataset ops (sort + groupby(host).map_groups(head) + limit) over a
Parquet-backed frontier, which is why every step is expressed on
columns, not Python rows.  Records and page-store IO are always
distributed.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from crawler_tjce_ray.stages.extract import (
    ExtractEditais,
    ExtractPagamentos,
    ExtractPrecatorios,
)
from crawler_tjce_ray.stages.fetch import (
    DEFAULT_STORE_BUCKETS,
    FetchPool,
    build_page_store,
)
from crawler_tjce_ray.stages.seen import ShardedSeenSet
from crawler_tjce_ray.state.frontier import make_frontier_rows, select_wave

_EXTRACTORS = {
    "precatorios": ExtractPrecatorios,
    "editais": ExtractEditais,
    "pagamentos": ExtractPagamentos,
}


@dataclass
class CrawlConfig:
    wave_size: int = 256
    per_host_budget: int = 8          # politeness: fetches per host per wave
    max_waves: int = 100              # O7 crawl depth cap (reference max_pages)
    n_seen_shards: int = 4
    log2_buckets: int = 16
    store_buckets: int = DEFAULT_STORE_BUCKETS
    fetch_concurrency: int = 4
    fetch_batch_size: int = 64
    current_year: int = 2026
    extract_records: bool = True


@dataclass
class CrawlResult:
    workdir: str
    waves_run: int
    trace: pd.DataFrame               # (wave, order_in_wave, url, status, seed)
    metrics: list[dict] = field(default_factory=list)

    @property
    def records_dir(self) -> str:
        return os.path.join(self.workdir, "records")


def default_seeds() -> list[str]:
    """The corpus entry points: the entity list + the two global chains
    (the reference's three crawl entry points, main.py routes)."""
    from crawler_tjce_ray.dsr.synth import DOMINANT_HOST

    return [
        f"https://{DOMINANT_HOST}/powerbi/entities/page/0",
        f"https://{DOMINANT_HOST}/powerbi/editais/page/0",
        f"https://{DOMINANT_HOST}/powerbi/pagamentos/page/0",
    ]


def _ckpt_dir(workdir: str, wave: int) -> str:
    return os.path.join(workdir, "ckpt", f"wave_{wave:05d}")


def _latest_checkpoint(workdir: str) -> int | None:
    base = os.path.join(workdir, "ckpt")
    if not os.path.isdir(base):
        return None
    waves = []
    for name in sorted(os.listdir(base)):
        if name.startswith("wave_") and os.path.exists(os.path.join(base, name, "_SUCCESS")):
            waves.append(int(name.split("_")[1]))
    return max(waves) if waves else None


def _write_checkpoint(workdir: str, wave: int, frontier: pd.DataFrame,
                      seen: ShardedSeenSet, lineage: pd.DataFrame, metrics: dict):
    """Atomic per-wave checkpoint: tmp dir + rename, _SUCCESS marker."""
    final = _ckpt_dir(workdir, wave)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    frontier.reset_index(drop=True).to_parquet(os.path.join(tmp, "frontier.parquet"))
    for i, blob in enumerate(seen.checkpoint()):
        with open(os.path.join(tmp, f"seen_shard_{i}.bin"), "wb") as f:
            f.write(blob)
    lineage.to_parquet(os.path.join(tmp, "lineage.parquet"))
    with open(os.path.join(tmp, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


def _load_checkpoint(workdir: str, wave: int, seen: ShardedSeenSet) -> pd.DataFrame:
    d = _ckpt_dir(workdir, wave)
    frontier = pd.read_parquet(os.path.join(d, "frontier.parquet"))
    blobs = []
    for i in range(seen.n_shards):
        with open(os.path.join(d, f"seen_shard_{i}.bin"), "rb") as f:
            blobs.append(f.read())
    seen.restore(blobs)
    return frontier


def _extract_outlinks_batch(t: pa.Table) -> pa.Table:
    """Fetched page → outlink rows (url, out_url, seed, depth).

    Links come from the page's embedded hyperlink list plus the
    restart-token chain (T2: the RT cursor implies the next page of the
    chain; the generator embeds it as a link too, so this is the union)."""
    out_url, out_seed, out_depth = [], [], []
    for url, html, seed, depth in zip(
        t["url"].to_pylist(), t["html"].to_pylist(),
        t["seed"].to_pylist(), t["depth"].to_pylist(),
    ):
        if html is None:
            continue
        try:
            env = json.loads(html)
        except Exception:
            continue
        for link in env.get("links", []):
            out_url.append(link)
            out_seed.append(seed)
            out_depth.append(depth + 1)
    return pa.table({
        "out_url": pa.array(out_url, pa.string()),
        "seed": pa.array(out_seed, pa.string()),
        "depth": pa.array(out_depth, pa.int32()),
    })


def run_crawl(
    pages_path: str,
    workdir: str,
    seeds: list[str] | None = None,
    config: CrawlConfig | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Run (or resume) the wave crawl over a pages corpus."""
    import ray.data as rd

    cfg = config or CrawlConfig()
    seeds = seeds if seeds is not None else default_seeds()
    os.makedirs(workdir, exist_ok=True)
    store_dir = build_page_store(
        pages_path, os.path.join(workdir, "store"), cfg.store_buckets
    )

    seen = ShardedSeenSet(cfg.n_seen_shards, cfg.log2_buckets)
    pool = FetchPool(store_dir, cfg.store_buckets, cfg.fetch_concurrency)
    start_wave = 0
    if resume:
        latest = _latest_checkpoint(workdir)
        if latest is not None:
            frontier = _load_checkpoint(workdir, latest, seen)
            start_wave = latest + 1
        else:
            resume = False
    if not resume:
        shutil.rmtree(os.path.join(workdir, "ckpt"), ignore_errors=True)
        shutil.rmtree(os.path.join(workdir, "records"), ignore_errors=True)
        frontier = make_frontier_rows(seeds, priority=0, wave=0, depth=0, seed="root")

    metrics_all: list[dict] = []
    wave = start_wave
    for wave in range(start_wave, cfg.max_waves):
        if frontier.empty:
            break
        selected, frontier = select_wave(
            frontier, wave, cfg.wave_size, cfg.per_host_budget
        )
        if selected.empty:
            # nothing eligible this wave but future work remains
            if (frontier["next_fetch_wave"] > wave).all() and not frontier.empty:
                continue
            break

        seen_mask = seen.check_and_add(selected["url_key"].to_numpy(dtype=np.uint64))
        selected = selected.assign(status=np.where(seen_mask, "dup", "pending"))
        todo = selected[~seen_mask].reset_index(drop=True)

        fetched_df = pd.DataFrame()
        outlinks = pd.DataFrame(columns=["out_url", "seed", "depth"])
        if not todo.empty:
            fetched_tbl = pool.fetch(todo, wave)  # bounded by wave_size

            # records per kind (stateless distributed extract; skipped
            # for pure frontier benchmarks via cfg.extract_records)
            if cfg.extract_records:
                ok_tbl = fetched_tbl.filter(pa.compute.is_valid(fetched_tbl["html"]))
                for kind, extractor in _EXTRACTORS.items():
                    sub = ok_tbl.filter(
                        pa.compute.match_substring(ok_tbl["url"], f"/{kind}/")
                    )
                    if sub.num_rows == 0:
                        continue
                    rd.from_arrow(sub).map_batches(
                        extractor(cfg.current_year), batch_format="pyarrow",
                        batch_size=cfg.fetch_batch_size,
                    ).write_parquet(
                        os.path.join(workdir, "records", kind, f"wave={wave}")
                    )

            outlinks = (
                rd.from_arrow(fetched_tbl)
                .map_batches(_extract_outlinks_batch, batch_format="pyarrow",
                             batch_size=cfg.fetch_batch_size)
                .to_pandas()
            )
            fetched_df = fetched_tbl.select(["url", "status"]).to_pandas()

        # merge fetch statuses into the wave lineage
        lineage = selected[["url", "seed", "status"]].copy()
        if not fetched_df.empty:
            smap = dict(zip(fetched_df["url"], fetched_df["status"]))
            lineage["status"] = [
                smap.get(u, s) for u, s in zip(lineage["url"], lineage["status"])
            ]
        lineage.insert(0, "wave", wave)
        lineage.insert(1, "order_in_wave", np.arange(len(lineage)))

        # frontier update: add new outlinks (drop urls already pending)
        if not outlinks.empty:
            new_rows = []
            pending = set(frontier["url"])
            dedup = outlinks.drop_duplicates("out_url")
            for _, r in dedup.iterrows():
                if r["out_url"] in pending:
                    continue
                new_rows.append((r["out_url"], r["seed"], int(r["depth"])))
            if new_rows:
                add = make_frontier_rows(
                    [u for u, _, _ in new_rows], priority=0,
                    wave=wave + 1, depth=0, seed="",
                )
                add["seed"] = [s for _, s, _ in new_rows]
                add["depth"] = np.array([d for _, _, d in new_rows], dtype=np.int32)
                add["priority"] = add["depth"]  # BFS: shallower first
                frontier = pd.concat([frontier, add], ignore_index=True)

        wave_metrics = {
            "wave": wave,
            "selected": int(len(selected)),
            "dup": int(seen_mask.sum()),
            "fetched_ok": int((fetched_df["status"] == "ok").sum()) if not fetched_df.empty else 0,
            "outlinks": int(len(outlinks)),
            "frontier_pending": int(len(frontier)),
            "seen_total": int(sum(seen.counts())),
        }
        metrics_all.append(wave_metrics)
        _write_checkpoint(workdir, wave, frontier, seen, lineage, wave_metrics)

    # assemble the full trace from the per-wave lineage checkpoints
    parts = []
    base = os.path.join(workdir, "ckpt")
    if os.path.isdir(base):
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name, "lineage.parquet")
            if os.path.exists(p) and os.path.exists(os.path.join(base, name, "_SUCCESS")):
                parts.append(pd.read_parquet(p))
    trace = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=["wave", "order_in_wave", "url", "seed", "status"]
    )
    seen.shutdown()
    pool.shutdown()
    waves_run = (metrics_all[-1]["wave"] + 1) if metrics_all else start_wave
    return CrawlResult(workdir=workdir, waves_run=waves_run, trace=trace, metrics=metrics_all)
