"""Driver-state ceilings (r3 verdict item 10): operators that hold
per-key driver state must refuse inputs past their documented ceiling
with an error that names the sharded fallback — silent OOM at 100 TB
is the failure mode these pins prevent.  Ceilings are monkeypatched to
tiny values so the guards fire at test scale."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestCeilingsAsserted:
    def test_pagerank_node_ceiling(self, monkeypatch):
        from crawler_tjce_ray.pipelines import graph

        monkeypatch.setattr(graph, "PR_MAX_DRIVER_NODES", 10)
        with pytest.raises(ValueError, match="shard the rank vector"):
            graph.q_pagerank_parts(SF)

    def test_grouped_select_group_ceiling(self, monkeypatch):
        from crawler_tjce_ray.pipelines import sketches

        monkeypatch.setattr(sketches, "SELECT_MAX_DRIVER_GROUPS", 1)
        with pytest.raises(ValueError, match="hash-bucket the groups"):
            sketches._grouped_quantile_select(SF, 0.5)

    def test_unionfind_pair_ceiling(self, monkeypatch):
        from crawler_tjce_ray.pipelines import dedup

        monkeypatch.setattr(dedup, "UNIONFIND_MAX_DRIVER_PAIRS", 0)
        dedup._DUP_PAIRS_CACHE.clear()
        with pytest.raises(ValueError,
                           match="dedup_clusters_distributed"):
            dedup._cluster_label_ref(SF)

    def test_resequencer_page_ceiling(self, monkeypatch):
        from crawler_tjce_ray.pipelines import extract_all
        from crawler_tjce_ray.sources.pages import corpus_cache_dir

        monkeypatch.setattr(extract_all, "RESEQ_MAX_DRIVER_PAGES", 1)
        pages = corpus_cache_dir(
            n_entities=8, total_pages=40, rows_per_page=50, seed=42)
        ds = extract_all.extract_records(pages, "precatorios")
        with pytest.raises(ValueError, match="shard the\n?\\s*prefix sum"):
            extract_all.assign_global_ordem(ds)

    def test_multimodal_collect_ceiling(self, monkeypatch):
        from crawler_tjce_ray.stages import multimodal

        monkeypatch.setattr(multimodal, "MEDIA_MAX_DRIVER_ROWS", 0)
        with pytest.raises(ValueError, match="write_parquet the feature"):
            multimodal.q_multimodal_image_features(SF)
        with pytest.raises(ValueError, match="write_parquet the feature"):
            multimodal.q_multimodal_frame_sample(SF)

    def test_defaults_pass_at_test_scale(self):
        """The real ceilings must NOT fire on the test corpora."""
        from crawler_tjce_ray.pipelines import dedup, graph, sketches
        from crawler_tjce_ray.stages import multimodal

        assert graph.q_pagerank_parts(SF) is not None
        assert sketches._grouped_quantile_select(SF, 0.5)
        assert dedup._cluster_label_ref(SF) is not None
        multimodal._assert_media_driver_bound(rows_per_media=64)
