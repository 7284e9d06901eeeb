"""Exchange fan-out parameterization (r3 verdict item 3): the four
row-carrying coarse-bucket exchanges — hash_join_big,
segment_year_revenue, semi_join_vip, dedup_substring_clean (plus the
jaccard-prefix and minhash scale tiers) — must produce ORACLE-EQUAL
output at any power-of-two bucket count.  The driver always runs the
default (64 at test scale); these tests force 16- and 128-way
fan-outs on the same inputs and require strict equality with DuckDB,
so the size-derived fan-out at 100 TB is covered by construction."""

import duckdb
import pandas as pd
import pytest

from crawler_tjce_ray.pipelines import exchange

SF = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


@pytest.fixture(params=[16, 128])
def forced_buckets(request):
    exchange.set_forced_buckets(request.param)
    yield request.param
    exchange.set_forced_buckets(None)


def _check(qfn, sql, con):
    mine = qfn(SF)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    ref = con.execute(sql).df()
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), ref, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestFanoutInvariance:
    def test_hash_join_big(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_HASH_JOIN_BIG, q_hash_join_big,
        )
        _check(q_hash_join_big, SQL_HASH_JOIN_BIG, con)

    def test_segment_year_revenue(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_SEGMENT_YEAR_REVENUE, q_segment_year_revenue,
        )
        _check(q_segment_year_revenue, SQL_SEGMENT_YEAR_REVENUE, con)

    def test_semi_join_vip(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_SEMI_JOIN_VIP, q_semi_join_vip,
        )
        _check(q_semi_join_vip, SQL_SEMI_JOIN_VIP, con)

    def test_dedup_substring_clean(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.dedup import (
            SQL_DEDUP_SUBSTRING_CLEAN, q_dedup_substring_clean,
        )
        _check(q_dedup_substring_clean, SQL_DEDUP_SUBSTRING_CLEAN, con)

    def test_jaccard_prefix(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.dedup import (
            SQL_DEDUP_NGRAM_JACCARD, q_dedup_jaccard_prefix,
        )
        _check(q_dedup_jaccard_prefix, SQL_DEDUP_NGRAM_JACCARD, con)

    def test_minhash_scale_tier(self, forced_buckets, con, monkeypatch):
        """Force the bucketed verify tier AND a non-default fan-out."""
        from crawler_tjce_ray.pipelines import dedup

        monkeypatch.setattr(dedup, "MINHASH_BROADCAST_MAX_DOCS", 0)
        _check(dedup.q_dedup_minhash_lsh, dedup.SQL_DEDUP_MINHASH_LSH, con)

    # ---- round-5 rollout: one representative per converted family ----

    def test_sessionize_events_stream(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_SESSIONIZE, q_sessionize,
        )
        _check(q_sessionize, SQL_SESSIONIZE, con)

    def test_running_total_orders_window(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_RUNNING_TOTAL, q_running_total,
        )
        _check(q_running_total, SQL_RUNNING_TOTAL, con)

    def test_left_join_counts(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_LEFT_JOIN_COUNTS, q_left_join_counts,
        )
        _check(q_left_join_counts, SQL_LEFT_JOIN_COUNTS, con)

    def test_asof_join(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_ASOF_JOIN, q_asof_join,
        )
        _check(q_asof_join, SQL_ASOF_JOIN, con)

    def test_bloom_anti_join_verify_hop(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_BLOOM_ANTI_JOIN, q_bloom_anti_join,
        )
        _check(q_bloom_anti_join, SQL_BLOOM_ANTI_JOIN, con)

    def test_dedup_paragraphs_text_hop(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.dedup import (
            SQL_DEDUP_PARAGRAPHS, q_dedup_paragraphs,
        )
        _check(q_dedup_paragraphs, SQL_DEDUP_PARAGRAPHS, con)

    def test_inverted_index_posting_lists(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.graph import (
            SQL_INVERTED_INDEX, q_inverted_index,
        )
        _check(q_inverted_index, SQL_INVERTED_INDEX, con)

    def test_triangle_count_wedges(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.graph import (
            SQL_TRIANGLE_COUNT, q_triangle_count,
        )
        _check(q_triangle_count, SQL_TRIANGLE_COUNT, con)

    def test_epoch_shuffle_range_buckets(self, forced_buckets, con):
        # range buckets floor at 256: forcing below exercises max()
        from crawler_tjce_ray.pipelines.training import (
            SQL_EPOCH_SHUFFLE, q_epoch_shuffle,
        )
        _check(q_epoch_shuffle, SQL_EPOCH_SHUFFLE, con)

    def test_bigram_lm_word_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.training import (
            SQL_BIGRAM_LM, q_bigram_lm,
        )
        _check(q_bigram_lm, SQL_BIGRAM_LM, con)

    def test_dup_rate_by_source_digests(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.dedup import (
            SQL_DUP_RATE_BY_SOURCE, q_dup_rate_by_source,
        )
        _check(q_dup_rate_by_source, SQL_DUP_RATE_BY_SOURCE, con)

    def test_minhash_banding_subbuckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.dedup import (
            SQL_DEDUP_MINHASH_LSH, q_dedup_minhash_lsh,
        )
        _check(q_dedup_minhash_lsh, SQL_DEDUP_MINHASH_LSH, con)

    def test_simhash_banding_subbuckets(self, forced_buckets):
        # rows-only query: invariance = identical output at the
        # default fan-out (the pairs and their canonical order cannot
        # depend on the banding sub-bucket assignment)
        from crawler_tjce_ray.pipelines import exchange
        from crawler_tjce_ray.pipelines.dedup import q_dedup_simhash

        forced = q_dedup_simhash(SF)
        exchange.set_forced_buckets(None)
        base = q_dedup_simhash(SF)
        pd.testing.assert_frame_equal(forced, base)

    def test_fuzzy_name_pairs_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.fuzzy import (
            SQL_FUZZY_NAME_PAIRS, q_fuzzy_name_pairs,
        )
        _check(q_fuzzy_name_pairs, SQL_FUZZY_NAME_PAIRS, con)

    def test_top_terms_token_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.textops import (
            SQL_TOP_TERMS_PER_LANG, q_top_terms_per_lang,
        )
        _check(q_top_terms_per_lang, SQL_TOP_TERMS_PER_LANG, con)

    def test_vocab_overlap_token_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.textops import (
            SQL_VOCAB_OVERLAP_SOURCES, q_vocab_overlap_sources,
        )
        _check(q_vocab_overlap_sources, SQL_VOCAB_OVERLAP_SOURCES, con)

    def test_ngram_novelty_shingle_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.webtext import (
            SQL_NGRAM_NOVELTY, q_ngram_novelty,
        )
        _check(q_ngram_novelty, SQL_NGRAM_NOVELTY, con)

    def test_vocab_growth_shingle_buckets(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.webtext import (
            SQL_VOCAB_GROWTH, q_vocab_growth,
        )
        _check(q_vocab_growth, SQL_VOCAB_GROWTH, con)

    def test_region_year_revenue_combiner(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_REGION_YEAR_REVENUE, q_region_year_revenue,
        )
        _check(q_region_year_revenue, SQL_REGION_YEAR_REVENUE, con)

    def test_assoc_rules_support_combiner(self, forced_buckets, con):
        from crawler_tjce_ray.pipelines.relational import (
            SQL_ASSOC_RULES, q_assoc_rules,
        )
        _check(q_assoc_rules, SQL_ASSOC_RULES, con)


class TestBucketSizing:
    def test_floor_and_growth(self):
        assert exchange.buckets_for_bytes(None) == 64
        assert exchange.buckets_for_bytes(1) == 64
        # 100 TB on disk -> 400 TB decompressed -> ~1.6M target tasks,
        # clamped at the 65536 ceiling
        assert exchange.buckets_for_bytes(100 * (1 << 40)) == 65536
        # 1 TB -> 4 TB decompressed / 256 MB = 16384 buckets
        assert exchange.buckets_for_bytes(1 << 40) == 16384

    def test_power_of_two_enforced(self):
        with pytest.raises(ValueError):
            exchange.set_forced_buckets(48)
        exchange.set_forced_buckets(None)

    def test_band_subbuckets(self):
        # total budget split across bands, floored at 1, power of two
        assert exchange.band_subbuckets(None, 32) == 1
        assert exchange.band_subbuckets(0, 32) == 1
        assert exchange.band_subbuckets(16, 32) == 1    # forced-16 case
        assert exchange.band_subbuckets(64, 32) == 2    # test-scale floor
        assert exchange.band_subbuckets(128, 32) == 4
        assert exchange.band_subbuckets(65536, 32) == 2048  # 100 TB cap
        assert exchange.band_subbuckets(64, 4) == 16    # pHash bands
        # non-pow2 band counts still yield a pow2 sub-bucket mask
        n = exchange.band_subbuckets(64, 3)
        assert n & (n - 1) == 0

    def test_table_bytes(self):
        b = exchange.table_bytes(SF, "orders", "lineitem")
        assert b and b > 0
        assert exchange.table_bytes(SF, "nope_no_such_table") is None
