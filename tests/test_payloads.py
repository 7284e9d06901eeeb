"""Querydata payload-builder pins (dsr/payloads.py): structure of the
request bodies the reference POSTs (S1-S5), the D3 filter rewrite's
strip-then-append semantics, cursor threading, and the URL→payload
mapping over the synthetic corpus."""

import json

import pytest

from crawler_tjce_ray.dsr import payloads as P


def _where(p):
    return P._command(p)["Query"]["Where"]


def _window(p):
    return P._command(p)["Binding"]["DataReduction"]["Primary"]["Window"]


class TestBuildPayload:
    def test_structure_and_model_routing(self):
        for kind, model in P.MODEL_IDS.items():
            p = P.build_payload(kind)
            assert p["modelId"] == model
            cmd = P._command(p)  # raises if the command path is wrong
            assert cmd["Query"]["Version"] == 2
            assert _window(p)["Count"] == P.DEFAULT_COUNT

    def test_entity_filter_shape(self):
        p = P.build_payload("precatorios", entity="Estado do Ceara")
        (f,) = _where(p)
        in_cond = f["Condition"]["In"]
        assert in_cond["Expressions"][0]["Column"]["Property"] == P.ENTITY_PROPERTY
        # string literals are single-quoted on the wire
        assert in_cond["Values"][0][0]["Literal"]["Value"] == "'Estado do Ceara'"

    def test_year_filter_shape(self):
        p = P.build_payload("precatorios", year=2024)
        (f,) = _where(p)
        cmp_ = f["Condition"]["Comparison"]
        assert cmp_["ComparisonKind"] == 0
        assert cmp_["Left"]["Column"]["Property"] == P.YEAR_PROPERTY
        # integer literals carry the L suffix on the wire
        assert cmp_["Right"]["Literal"]["Value"] == "2024L"

    def test_restart_token_threading(self):
        p0 = P.build_payload("precatorios", entity="x")
        assert "RestartTokens" not in _window(p0)
        p1 = P.build_payload("precatorios", entity="x",
                             restart_tokens=[["'a|1'"]])
        assert _window(p1)["RestartTokens"] == [["'a|1'"]]

    def test_editais_order_desc(self):
        p = P.build_payload("editais")
        ob = P._command(p)["Query"]["OrderBy"]
        assert ob[0]["Direction"] == 2  # descending (O2)

    def test_unknown_kind(self):
        with pytest.raises(ValueError):
            P.build_payload("nope")


class TestD3Rewrite:
    def test_strips_preexisting_entity_filters_both_shapes(self):
        p = P.build_payload("precatorios")
        stale_cmp = {"Condition": {"Comparison": {
            "ComparisonKind": 0,
            "Left": P._column("dfslcp_nom_entidade_devedora"),
            "Right": {"Literal": {"Value": "'Old'"}},
        }}}
        stale_in = {"Condition": {"In": {
            "Expressions": [P._column(P.ENTITY_PROPERTY)],
            "Values": [[{"Literal": {"Value": "'Older'"}}]],
        }}}
        unrelated = {"Condition": {"Comparison": {
            "ComparisonKind": 2,
            "Left": P._column("dfslcp_vlr_atual"),
            "Right": {"Literal": {"Value": "0D"}},
        }}}
        P._command(p)["Query"]["Where"] = [stale_cmp, stale_in, unrelated]
        out = P.inject_filters(p, entity="New")
        w = _where(out)
        assert len(_where(p)) == 3  # input payload untouched (pure fn)
        assert unrelated in w  # non-entity filters preserved
        vals = [f["Condition"].get("In", {}).get("Values") for f in w
                if "In" in f.get("Condition", {})]
        assert vals == [[[{"Literal": {"Value": "'New'"}}]]]
        assert len(w) == 2  # unrelated + new entity, stale ones gone

    def test_idempotent_double_injection(self):
        p = P.build_payload("precatorios", entity="A", year=2023)
        once = json.loads(P.canonical_json(p))
        twice = P.inject_filters(p, entity="A", year=2023)
        assert json.loads(P.canonical_json(twice)) == once

    def test_year_rewrite_replaces_only_year(self):
        p = P.build_payload("precatorios", entity="A", year=2022)
        p = P.inject_filters(p, year=2024)
        years = [f["Condition"]["Comparison"]["Right"]["Literal"]["Value"]
                 for f in _where(p) if P._is_year_filter(f)]
        assert years == ["2024L"]
        assert sum(P._is_entity_filter(f) for f in _where(p)) == 1


class TestSpecialQueries:
    def test_entities_distinct_values(self):
        p = P.build_entities_payload()
        cmd = P._command(p)
        assert cmd["Binding"]["IncludeEmptyGroups"] is True
        assert cmd["Query"]["Select"][0]["Column"]["Property"] == P.ENTITY_PROPERTY
        assert "RestartTokens" not in _window(p)
        p2 = P.build_entities_payload(last_entity="Municipio de Sobral")
        assert _window(p2)["RestartTokens"] == [["'Municipio de Sobral'"]]

    def test_timestamp_probe_min_aggregation(self):
        p = P.build_timestamp_probe_payload()
        cmd = P._command(p)
        sel = cmd["Query"]["Select"][0]["Aggregation"]
        assert sel["Function"] == 3  # Min
        assert "Top" in cmd["Binding"]["DataReduction"]["Primary"]


class TestUrlMapping:
    def test_corpus_urls_map_to_distinct_payloads(self):
        urls = [
            "https://h1.example/powerbi/precatorios/estado-do-ceara/page/0",
            "https://h1.example/powerbi/precatorios/estado-do-ceara/page/1",
            "https://h2.example/powerbi/precatorios/municipio-x/page/0",
            "https://big.example/powerbi/editais/page/0",
            "https://big.example/powerbi/pagamentos/page/3",
        ]
        blobs = [P.canonical_json(P.payload_for_url(u)) for u in urls]
        assert len(set(blobs)) == len(urls)  # request identity ↔ URL

    def test_page0_has_no_tokens_later_pages_do(self):
        p0 = P.payload_for_url(
            "https://h/powerbi/precatorios/slug-a/page/0")
        p2 = P.payload_for_url(
            "https://h/powerbi/precatorios/slug-a/page/2")
        assert "RestartTokens" not in _window(p0)
        assert _window(p2)["RestartTokens"]

    def test_non_corpus_url_rejected(self):
        with pytest.raises(ValueError):
            P.payload_for_url("https://h/robots.txt")

    def test_canonical_json_deterministic(self):
        u = "https://h/powerbi/editais/page/1"
        assert (P.canonical_json(P.payload_for_url(u))
                == P.canonical_json(P.payload_for_url(u)))
