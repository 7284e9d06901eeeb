"""Distributed spherical k-means: convergence, determinism, and
equivalence with a single-machine Lloyd's reference."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from crawler_tjce_ray.pipelines.clustering import (
    KMEANS_ITERS,
    KMEANS_K,
    _init_centroids,
    q_kmeans_embeddings,
    train_kmeans,
)

SF = "/root/testdata/sf0.001"


def _local_lloyds(sf_dir: str, k: int, iters: int):
    """Driver-side reference: identical init, plain numpy Lloyd's."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cents = _init_centroids(sf_dir, k)
    history = []
    sizes = None
    for _ in range(iters):
        sims = mat @ cents.T
        cell = sims.argmax(axis=1)
        history.append(float((1.0 - sims[np.arange(len(mat)), cell]).sum()))
        nxt = cents.copy()
        sizes = np.zeros(k, dtype=np.int64)
        for c in range(k):
            m = cell == c
            sizes[c] = int(m.sum())
            if m.any():
                mean = mat[m].sum(axis=0)
                nxt[c] = mean / np.linalg.norm(mean)
        cents = nxt
    return cents, sizes, history


@pytest.fixture(scope="module")
def trained(ray_session):
    return train_kmeans(SF, KMEANS_K, KMEANS_ITERS)


def test_inertia_monotone_nonincreasing(trained):
    _, _, history = trained
    assert len(history) == KMEANS_ITERS
    for a, b in zip(history, history[1:]):
        assert b <= a + 1e-9
    # and training actually helped (strict improvement over init)
    assert history[-1] < history[0]


def test_sizes_cover_corpus(trained):
    _, sizes, _ = trained
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert sizes.sum() == n
    # the synthetic embeddings are label-clustered: no empty clusters
    assert (sizes > 0).all()


def test_matches_local_lloyds(trained):
    cents, sizes, history = trained
    lc, ls, lh = _local_lloyds(SF, KMEANS_K, KMEANS_ITERS)
    np.testing.assert_allclose(cents, lc, rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(sizes, ls)
    np.testing.assert_allclose(history, lh, rtol=1e-9)


def test_deterministic_across_runs(ray_session, trained):
    from crawler_tjce_ray.pipelines import clustering

    c1, s1, h1 = trained
    c1, s1, h1 = c1.copy(), s1.copy(), list(h1)
    # the model memo would make a repeat call an identity check —
    # clear it so this pins a genuinely fresh training run
    clustering._KMEANS_CACHE.clear()
    c2, s2, h2 = train_kmeans(SF, KMEANS_K, KMEANS_ITERS)
    assert c1 is not c2
    # canonical partial-sort makes the reduce order fixed → bit-identical
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(s1, s2)
    assert h1 == h2


def test_query_summary_shape(ray_session):
    out = q_kmeans_embeddings(SF)
    assert list(out.columns) == ["cluster_id", "size", "inertia"]
    assert out["size"].sum() == pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert (out["inertia"] >= 0).all()
    assert out["cluster_id"].is_monotonic_increasing
    out2 = q_kmeans_embeddings(SF)
    pd.testing.assert_frame_equal(out, out2)


def test_k_larger_than_corpus_raises(tmp_path):
    """n < k must fail loudly, not silently train a k'=n model whose
    centroid/size arrays surprise consumers like semdedup."""
    import pandas as pd
    import pytest as _pytest

    small = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [np.ones(4) / 2.0] * 3,
    })
    small.to_parquet(tmp_path / "embeddings.parquet")
    from crawler_tjce_ray.pipelines.clustering import _init_centroids

    with _pytest.raises(ValueError, match="exceeds the 3 embeddings"):
        _init_centroids(str(tmp_path), k=8)


def test_empty_batch_partial():
    """Ray may hand a map stage an empty block — the partial must
    return a typed empty frame, not crash in np.stack."""
    from crawler_tjce_ray.pipelines.clustering import _assign_partials

    cents = np.eye(4, 8)
    out = _assign_partials(pd.DataFrame({"embedding": []}), cents)
    assert len(out) == 0
    assert list(out.columns) == ["cluster_id", "n", "inertia"] + [
        f"s{j}" for j in range(8)
    ]


class TestSemDedup:
    """SemDeDup composition: cluster assignment + within-cluster
    cosine prune, invariants checked against a local recompute."""

    def test_invariants_and_local_equivalence(self):
        from crawler_tjce_ray.pipelines.clustering import (
            SEMDEDUP_TAU,
            q_semdedup,
        )

        out = q_semdedup(SF)
        n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
        assert len(out) == n
        assert list(out.columns) == [
            "vec_id", "cluster_id", "keep", "max_intra_cosine",
        ]

        # local recompute with the same deterministic model
        cents, _, _ = train_kmeans(SF)
        t = pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)
        mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cell = (mat @ cents.T).argmax(axis=1)

        got = out.sort_values("vec_id").reset_index(drop=True)
        assert (got["cluster_id"].to_numpy() == cell).all()

        # keep rule: dropped iff some lower-id cluster-mate >= tau
        ids = t["vec_id"].to_numpy()
        for i in range(n):
            mates = (cell == cell[i]) & (ids < ids[i])
            sim = mat[mates] @ mat[i]
            expect_drop = bool((sim >= SEMDEDUP_TAU).any())
            assert bool(got["keep"][i]) == (not expect_drop), ids[i]

    def test_deterministic(self):
        from crawler_tjce_ray.pipelines import clustering
        from crawler_tjce_ray.pipelines.clustering import q_semdedup

        a = q_semdedup(SF).reset_index(drop=True)
        clustering._KMEANS_CACHE.clear()  # force a fresh model train
        b = q_semdedup(SF).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_planted_duplicates_dropped(self, tmp_path):
        """Near-identical vectors (cos >= tau) in one cluster: every
        lower-id original survives, every planted copy is dropped."""
        import pyarrow as pa

        from crawler_tjce_ray.pipelines.clustering import q_semdedup

        rng = np.random.RandomState(7)
        base = rng.randn(24, 16).astype(np.float32)
        # vecs 24..29 are exact copies of 0..5 (cosine 1.0)
        mat = np.vstack([base, base[:6]])
        t = pa.table({
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
            "label": pa.array([0] * len(mat), pa.int32()),
        })
        import pyarrow.parquet as pq_
        pq_.write_table(t, str(tmp_path / "embeddings.parquet"))

        out = q_semdedup(str(tmp_path)).set_index("vec_id")
        assert not out.loc[24:29, "keep"].any()      # copies dropped
        assert out.loc[:5, "keep"].all()             # originals kept
        # a copy and its original land in the same cluster
        for i in range(6):
            assert out.loc[i, "cluster_id"] == out.loc[24 + i, "cluster_id"]


class TestLloydsSqlOracle:
    """Float-safety evidence for the generated Lloyd's SQL oracles
    (SQL_KMEANS_EMBEDDINGS / SQL_SEMDEDUP): the oracle emulates the
    algorithm exactly, so the only way the two engines can diverge is
    a float comparison whose margin is below the ~1e-13
    summation-order noise between numpy's blocked sums and DuckDB's
    sequential aggregates.  This pins every such margin >= 1e-8
    across all three pinned corpora (measured worst case: one sf0.1
    vector with an 8.1e-7 assignment margin — still five orders above
    the noise; every other margin is >= 1e-4)."""

    SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
    NOISE_FLOOR = 1e-8

    @staticmethod
    def _norm_mat(sf_dir):
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
        mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(
            np.float64)
        return mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def test_assignment_margins_every_iteration(self):
        """Gap between best and second-best centroid dot for EVERY
        vector at EVERY Lloyd's iteration (plus the final assignment
        pass) stays far above float noise — cluster membership cannot
        flip between engines."""
        for sf in self.SFS:
            mat = self._norm_mat(sf)
            cents = _init_centroids(sf, KMEANS_K)
            worst = np.inf
            for _ in range(KMEANS_ITERS + 1):  # +1 = final assignment
                sims = np.sort(mat @ cents.T, axis=1)
                worst = min(worst, float((sims[:, -1] - sims[:, -2]).min()))
                cell = (mat @ cents.T).argmax(axis=1)
                nxt = cents.copy()
                for c in range(KMEANS_K):
                    m = cell == c
                    if m.any():
                        s = mat[m].sum(axis=0)
                        n = np.linalg.norm(s)
                        if n > 0:
                            nxt[c] = s / n
                cents = nxt
            assert worst > self.NOISE_FLOOR, (sf, worst)

    def test_semdedup_tau_gap_and_round_boundaries(self):
        """No in-cluster pair's cosine sits at the τ=0.95 keep/drop
        boundary, and no rounded float output sits at a 6-dp rounding
        boundary, on any pinned corpus."""
        from crawler_tjce_ray.pipelines.clustering import SEMDEDUP_TAU

        for sf in self.SFS:
            mat = self._norm_mat(sf)
            cents, _, _ = _local_lloyds(sf, KMEANS_K, KMEANS_ITERS)
            cell = (mat @ cents.T).argmax(axis=1)
            tau_gap = np.inf
            round_gap = np.inf
            for c in np.unique(cell):
                sub = mat[cell == c]
                if len(sub) < 2:
                    continue
                sims = sub @ sub.T
                off = sims[~np.eye(len(sub), dtype=bool)]
                tau_gap = min(tau_gap, float(np.abs(off - SEMDEDUP_TAU).min()))
                mx = np.copy(sims)
                np.fill_diagonal(mx, -np.inf)
                v = mx.max(axis=1) * 1e6
                round_gap = min(
                    round_gap,
                    float(np.abs(v - np.floor(v) - 0.5).min()))
            assert tau_gap > self.NOISE_FLOOR, (sf, tau_gap)
            # 6-dp boundary distance in units of 1e-6 of the value:
            # 1e-5 here = 1e-11 absolute, ~100x the per-dot noise
            # (measured worst case 8.8e-5 at sf0.01)
            assert round_gap > 1e-5, (sf, round_gap)

    def test_kmeans_inertia_round_boundary(self):
        """Per-cluster final-pass inertia is not at a 6-dp rounding
        boundary on any pinned corpus (round(x, 6) agrees between
        engines despite ~1e-12 absolute summation noise)."""
        for sf in self.SFS:
            mat = self._norm_mat(sf)
            cents, _, _ = _local_lloyds(sf, KMEANS_K, KMEANS_ITERS)
            sims = mat @ cents.T
            cell = sims.argmax(axis=1)
            best = sims[np.arange(len(mat)), cell]
            for c in np.unique(cell):
                x = float((1.0 - best[cell == c]).sum()) * 1e6
                assert abs(x - np.floor(x) - 0.5) > 1e-3, (sf, c, x)

    def test_sql_oracle_toy_corpus_empty_clusters_and_ties(
        self, ray_session, tmp_path
    ):
        """Edges the pinned corpora never hit, pinned cross-engine on
        an exact-arithmetic toy corpus (one-hot vectors — every dot is
        exactly 0 or 1 on both engines, so even argmax TIES resolve
        identically by the shared lowest-cid rule): 14 copies of e0
        and 2 of e1 with k=8 strided init makes centroids c1..c6 EMPTY
        after the first assignment (all e0 vectors tie onto c0), so
        the previous-centroid carry must fire identically in numpy and
        in the SQL LEFT JOIN + CASE."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from crawler_tjce_ray.pipelines import clustering as cl

        dim = 4
        vecs = [[1.0, 0.0, 0.0, 0.0]] * 14 + [[0.0, 1.0, 0.0, 0.0]] * 2
        t = pa.table({
            "vec_id": pa.array(range(16), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * 16, pa.int32()),
        })
        pq_.write_table(t, str(tmp_path / "embeddings.parquet"))

        eng_k = cl.q_kmeans_embeddings(str(tmp_path)).reset_index(drop=True)
        eng_s = cl.q_semdedup(str(tmp_path)).reset_index(drop=True)

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet'")
        ora_k = con.sql(cl._kmeans_oracle_sql(dim=dim)).df()
        ora_s = con.sql(cl._semdedup_oracle_sql(dim=dim)).df()

        # exact content expectations first (not just parity): every e0
        # vector lands on c0, both e1 vectors on the vec_id=14 centroid
        # (cid 7), all other clusters are empty and absent, inertia is
        # exactly 0.0
        assert eng_k.to_dict("list") == {
            "cluster_id": [0, 7], "size": [14, 2], "inertia": [0.0, 0.0]}
        assert bool(eng_s["keep"].iloc[0]) and not eng_s["keep"].iloc[1:14].any()
        assert bool(eng_s.loc[14, "keep"]) and not bool(eng_s.loc[15, "keep"])
        assert (eng_s["max_intra_cosine"] == 1.0).all()

        pd.testing.assert_frame_equal(
            eng_k, ora_k[eng_k.columns], check_dtype=False)
        pd.testing.assert_frame_equal(
            eng_s, ora_s[eng_s.columns], check_dtype=False)
