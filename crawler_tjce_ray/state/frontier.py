"""Frontier state: URL canonicalization, keys, the frontier table and
deterministic wave selection.

The frontier is a Parquet-checkpointed table (FIXTURES.md F7):

    url, url_key (uint64 = first 8 bytes of sha1(canonical url)),
    host, host_hash, priority, next_fetch_wave, depth, seed

Ordering contract (north rule / SURVEY.md §4): the crawl order is
defined by the frontier sort key ``(priority, next_fetch_wave, url)``
— a total order — never by fetch completion, so runs and resumes are
order-identical by construction.
"""

from __future__ import annotations

import hashlib
import urllib.parse

import numpy as np
import pandas as pd

FRONTIER_COLUMNS = [
    "url", "url_key", "host", "host_hash", "priority",
    "next_fetch_wave", "depth", "seed",
]


def assert_frontier_unique(frontier: pd.DataFrame) -> None:
    """Enforce the frontier's url_key-uniqueness invariant.

    ``select_wave_distributed`` defers by url_key SET membership while
    the pandas ``select_wave`` defers by row index: if duplicate
    url_key rows ever coexisted, the distributed path would silently
    drop the non-selected duplicate and the two paths would diverge.
    The frontier-update code maintains uniqueness (seen-filter +
    within-wave outlink dedup + pending-url anti-join), so a duplicate
    here means corrupted state — fail loudly before selection."""
    if not frontier["url_key"].is_unique:
        raise AssertionError("frontier url_key uniqueness invariant violated")


def canonicalize_url(url: str) -> str:
    """Lowercase scheme/host, drop fragments and default ports, strip
    trailing slashes on paths, collapse empty query (the M8
    slug-canonicalization analog for URLs)."""
    p = urllib.parse.urlsplit(url.strip())
    host = (p.hostname or "").lower()
    port = f":{p.port}" if p.port and p.port not in (80, 443) else ""
    path = p.path.rstrip("/") or "/"
    query = f"?{p.query}" if p.query else ""
    return f"{p.scheme.lower()}://{host}{port}{path}{query}"


def url_sha1_64(url: str) -> int:
    """First 8 bytes of sha1(canonical url) as uint64 — the URL-seen
    key (north rule: canonicalized+SHA1-hashed URLs)."""
    h = hashlib.sha1(url.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big")


def host_of(url: str) -> str:
    return (urllib.parse.urlsplit(url).hostname or "").lower()


def host_hash_salted(host: str, url: str, hot_hosts: dict[str, int] | None = None) -> int:
    """Partition key: hash(host), salted into ``n`` sub-partitions for
    hosts listed in ``hot_hosts`` (skew handling: the dominant host
    would otherwise serialize an entire partition — SURVEY.md §4 Skew)."""
    base = int.from_bytes(hashlib.sha1(host.encode()).digest()[:8], "big")
    if hot_hosts and host in hot_hosts:
        salt = url_sha1_64(url) % hot_hosts[host]
        return (base + salt) & 0x7FFFFFFFFFFFFFFF
    return base & 0x7FFFFFFFFFFFFFFF


def make_frontier_rows(
    urls: list[str],
    priority: int = 0,
    wave: int = 0,
    depth: int = 0,
    seed: str = "",
    hot_hosts: dict[str, int] | None = None,
) -> pd.DataFrame:
    """Build canonical frontier rows for a url list (driver-side for
    seeds; the same columns are derived vectorized in-pipeline for
    outlinks)."""
    canon = [canonicalize_url(u) for u in urls]
    hosts = [host_of(u) for u in canon]
    return pd.DataFrame(
        {
            "url": canon,
            "url_key": np.array([url_sha1_64(u) for u in canon], dtype=np.uint64),
            "host": hosts,
            "host_hash": np.array(
                [host_hash_salted(h, u, hot_hosts) for h, u in zip(hosts, canon)],
                dtype=np.int64,
            ),
            "priority": np.full(len(canon), priority, dtype=np.int32),
            "next_fetch_wave": np.full(len(canon), wave, dtype=np.int32),
            "depth": np.full(len(canon), depth, dtype=np.int32),
            "seed": [seed] * len(canon),
        }
    )


def select_wave(
    frontier: pd.DataFrame,
    wave: int,
    wave_size: int,
    per_host_budget: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic wave selection (O1 frontier ordering):

    1. eligible = rows with ``next_fetch_wave <= wave``;
    2. total-order sort by (priority, next_fetch_wave, url);
    3. per-host politeness cap: first ``per_host_budget`` per host
       (the token-bucket grant for this wave);
    4. global cap ``wave_size``.

    Returns (selected, deferred_rest).  Deferred rows stay in the
    frontier with ``next_fetch_wave = wave + 1`` — the dominant host
    never stalls the wave (skew rule: carry, don't barrier).

    This pandas implementation holds to ~10^7 pending urls on the
    driver; ``select_wave_distributed`` below is the semantically
    identical Ray-Data path for larger frontiers
    (equivalence pinned by tests/test_frontier_distributed.py).
    """
    eligible = frontier[frontier["next_fetch_wave"] <= wave]
    rest = frontier[frontier["next_fetch_wave"] > wave]
    if eligible.empty:
        return eligible, frontier
    eligible = eligible.sort_values(
        ["priority", "next_fetch_wave", "url"], kind="mergesort"
    )
    capped = eligible.groupby("host", sort=False).head(per_host_budget)
    selected = capped.head(wave_size)
    deferred = eligible.loc[~eligible.index.isin(selected.index)].copy()
    deferred["next_fetch_wave"] = wave + 1
    deferred = pd.concat([deferred, rest], ignore_index=False)
    return selected.reset_index(drop=True), deferred.reset_index(drop=True)


def select_wave_distributed(
    frontier_ds,
    wave: int,
    wave_size: int,
    per_host_budget: int,
):
    """Dataset-level wave selection for frontiers too large for the
    driver (the 10^10-URL regime of the north rule) — semantically
    identical to ``select_wave``:

    1. filter eligible (``next_fetch_wave <= wave``) — stateless map;
    2. global sort by the total order key (the only all-to-all);
    3. per-host politeness cap via ``groupby(host)`` + sorted head
       (hosts co-locate by the groupby hash; salted ``host_hash``
       splits a dominant host across partitions while the budget stays
       host-global because the cap re-applies on the full host group);
    4. ``limit(wave_size)`` — the wave itself is driver-sized by
       definition, so it materializes; the DEFERRED remainder stays a
       Dataset (anti-membership filter against the broadcast selected
       key set, with ``next_fetch_wave`` bumped).

    Returns ``(selected: pd.DataFrame, deferred: ray.data.Dataset)``.
    """
    import ray.data  # noqa: F401

    sort_keys = ["priority", "next_fetch_wave", "url"]

    def split_eligible(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["next_fetch_wave"] <= wave]

    eligible = frontier_ds.map_batches(split_eligible, batch_format="pandas")

    def head_per_host(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_keys, kind="mergesort").head(per_host_budget)

    capped = eligible.groupby("host").map_groups(head_per_host, batch_format="pandas")
    selected = (
        capped.sort(sort_keys).limit(wave_size).to_pandas()
        .sort_values(sort_keys, kind="mergesort").reset_index(drop=True)
    )
    sel_keys = set(selected["url_key"].astype("uint64").tolist())

    def defer(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["url_key"].astype("uint64").isin(sel_keys)].copy()
        bump = df["next_fetch_wave"] <= wave
        df.loc[bump, "next_fetch_wave"] = wave + 1
        return df

    deferred = frontier_ds.map_batches(defer, batch_format="pandas")
    return selected, deferred
