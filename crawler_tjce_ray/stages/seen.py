"""Sharded URL-seen set: cuckoo-filter shards in Ray actors.

A shared mutable index is the one piece the Dataset API cannot
express (SURVEY.md §7.4), so the shards are raw ``@ray.remote``
actors; everything talks to them in *batched, vectorized* calls
(numpy key arrays, one call per shard per wave).  Shard count is
fixed at creation (resharding = rebuild) and every shard serializes
to bytes for the per-partition checkpoint.

Scale path: shard count ≈ cluster cores; each shard holds
``2^log2_buckets × 4`` 16-bit fingerprints (a 2^26-bucket shard ≈
512 MiB ≈ 2.7e8 urls at 0.95 load → 64 shards cover 1.7e10 urls).
"""

from __future__ import annotations

import numpy as np
import ray

from crawler_tjce_ray.state.cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShardActor:
    """num_cpus=0: membership checks are sub-millisecond bitset ops —
    reserving cores here starved task scheduling on small clusters
    (long-lived bookkeeping actors must never hold worker slots that
    fetch/extract tasks need)."""

    def __init__(self, log2_buckets: int = 16):
        self.filter = CuckooFilter(log2_buckets)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add(keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.contains(keys)

    def remove(self, keys: np.ndarray) -> int:
        return self.filter.remove(keys)

    def to_bytes(self) -> bytes:
        return self.filter.to_bytes()

    def load_bytes(self, blob: bytes) -> int:
        self.filter = CuckooFilter.from_bytes(blob)
        return self.filter.count

    def count(self) -> int:
        return self.filter.count


class ShardedSeenSet:
    """Driver-side handle over K seen-set shards."""

    def __init__(self, n_shards: int = 4, log2_buckets: int = 16):
        self.n_shards = n_shards
        self.actors = [SeenShardActor.remote(log2_buckets) for i in range(n_shards)]

    def _route(self, keys: np.ndarray) -> np.ndarray:
        # route on HIGH bits: the cuckoo primary bucket is key & mask
        # (low bits), so low-bit routing would fix those bits per shard
        # and collapse usable i1 buckets to 1/n_shards (measured: shard
        # overflow at ~0.72 load instead of ~0.97)
        return ((keys >> np.uint64(32)) % np.uint64(self.n_shards)).astype(np.int64)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """True per key ⇔ already seen; unseen keys become seen.
        One batched actor call per shard, issued in parallel."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        shard = self._route(keys)
        out = np.zeros(len(keys), dtype=bool)
        futures = {}
        for s in range(self.n_shards):
            idx = np.where(shard == s)[0]
            if idx.size:
                futures[s] = (idx, self.actors[s].check_and_add.remote(keys[idx]))
        for s, (idx, fut) in futures.items():
            out[idx] = ray.get(fut)
        return out

    def remove(self, keys: np.ndarray) -> int:
        """Un-see keys (politeness-denied urls re-entering the
        frontier); same shard routing as check_and_add."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return 0
        shard = self._route(keys)
        futs = []
        for s in range(self.n_shards):
            idx = np.where(shard == s)[0]
            if idx.size:
                futs.append(self.actors[s].remove.remote(keys[idx]))
        return sum(ray.get(futs))

    def counts(self) -> list[int]:
        return ray.get([a.count.remote() for a in self.actors])

    def checkpoint(self) -> list[bytes]:
        return ray.get([a.to_bytes.remote() for a in self.actors])

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.n_shards, "shard count is fixed at creation"
        ray.get([a.load_bytes.remote(b) for a, b in zip(self.actors, blobs)])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
