"""The external driver oracle-checks exactly the FIRST 50 entries of
``build_queries()``.  These pins make window regressions loud: an
insertion that grows the front list past 50 would otherwise silently
push the tail entry out of the driver's horizon (a real bug caught in
round 3 — adding a 51st entry dropped ``ann_lsh_topk`` from the round
with no signal)."""

from crawler_tjce_ray.pipelines import registry


def test_front_list_is_exactly_window_sized():
    assert len(registry._DRIVER_WINDOW_FRONT) == registry._DRIVER_WINDOW_SIZE


def test_front_names_all_exist_and_fill_the_window():
    qs = registry.build_queries()
    names = list(qs)
    missing = [n for n in registry._DRIVER_WINDOW_FRONT if n not in qs]
    assert not missing, f"front entries not in registry: {missing}"
    assert names[: registry._DRIVER_WINDOW_SIZE] == registry._DRIVER_WINDOW_FRONT


def test_front_has_no_duplicates():
    front = registry._DRIVER_WINDOW_FRONT
    assert len(front) == len(set(front))
