"""Cuckoo filter unit tests (membership, determinism, serialization)."""

import numpy as np
import pytest

from crawler_tjce_ray.state.cuckoo import CuckooFilter


class TestCuckoo:
    def test_insert_and_contains(self):
        f = CuckooFilter(log2_buckets=10)
        keys = np.random.default_rng(7).integers(1, 2**63, 1000, dtype=np.uint64)
        assert f.add(keys) == len(np.unique(keys))
        assert f.contains(keys).all()

    def test_no_false_negatives_under_load(self):
        f = CuckooFilter(log2_buckets=12)  # 16384 slots
        rng = np.random.default_rng(11)
        keys = rng.integers(1, 2**63, 14000, dtype=np.uint64)  # ~85% load
        f.add(keys)
        assert f.contains(keys).all()

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(log2_buckets=12)
        rng = np.random.default_rng(13)
        keys = rng.integers(1, 2**62, 10000, dtype=np.uint64)
        f.add(keys)
        probes = rng.integers(2**62, 2**63, 20000, dtype=np.uint64)  # disjoint range
        fp_rate = f.contains(probes).mean()
        # 16-bit fingerprints, 8 slots probed → theoretical ~ 8/2^16 ≈ 0.00012
        assert fp_rate < 0.005

    def test_check_and_add_semantics(self):
        f = CuckooFilter(log2_buckets=8)
        keys = np.array([10, 20, 10, 30, 20], dtype=np.uint64)
        seen = f.check_and_add(keys)
        assert list(seen) == [False, False, True, False, True]
        assert list(f.check_and_add(np.array([10, 40], dtype=np.uint64))) == [True, False]

    def test_serialization_roundtrip(self):
        f = CuckooFilter(log2_buckets=10)
        keys = np.random.default_rng(17).integers(1, 2**63, 2000, dtype=np.uint64)
        f.add(keys)
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert g.count == f.count
        assert (g.table == f.table).all()
        assert g.contains(keys).all()

    def test_deterministic_bytes(self):
        def build():
            f = CuckooFilter(log2_buckets=10)
            keys = np.arange(1, 3000, dtype=np.uint64) * np.uint64(2654435761)
            f.add(keys)
            return f.to_bytes()

        assert build() == build()

    def test_over_capacity_raises(self):
        f = CuckooFilter(log2_buckets=4)  # 64 slots
        rng = np.random.default_rng(19)
        with pytest.raises(RuntimeError):
            f.add(rng.integers(1, 2**63, 500, dtype=np.uint64))
