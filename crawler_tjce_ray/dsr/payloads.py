"""Power BI *querydata* request builders — the reference's payload
surface (S1/S2/S3/S4/S5) re-expressed as pure functions.

The reference constructs one JSON body per page fetch:
``get_precatorios_payload`` (crawler/crawler.py:303-521) mutates a
deep-copied template — OrderBy for pagination, ``Window.Count`` +
``RestartTokens`` for the cursor, an ``In`` filter for the entity and
a ``Comparison`` filter for the year — with the D3 rewrite: any
PRE-EXISTING entity/year filters are stripped before the new ones are
appended (crawler/crawler.py:402-443,471-484).  The edital/pagamento
crawlers ship their own templates (edital_crawler.py:84-248,
pagamentos_crawler.py:84-316), the entity list is a distinct-values
query with ``IncludeEmptyGroups`` paged by last-entity-name restart
tokens (schemas/entity_mapping_crawler.py:36-121), and the edital
"last updated" probe is a Min aggregation (Function 3) under a Top
window (edital_crawler.py:250-313).

In this sandbox nothing is POSTed — the fetch stage reads the pages
Parquet — but the payload surface is part of the reference's contract,
so it exists here as real, tested code: ``payload_for_url`` maps every
corpus URL to the request body that would have produced that page, and
the builders are pure (template never mutated in place), so they are
safe to call from Ray actors without copy discipline.

Wire-format vocabulary (property names, model ids, the ``'…'`` string
and ``…L`` integer literal quoting) must match the reference byte for
byte to be useful against the same backend; everything else —
structure, naming, staging — is this repo's own.
"""

from __future__ import annotations

import json
from typing import Any
from urllib.parse import urlsplit

# resource/model routing per record kind (SURVEY §2.1 S1-S3)
MODEL_IDS = {"precatorios": 4287487, "editais": 5903288, "pagamentos": 5283863}

ENTITY_PROPERTY = "dfslcp_dsc_entidade"
# property names the reference treats as "an entity filter" when
# stripping pre-existing filters (crawler.py:404-408)
ENTITY_PROPERTIES = ("dfslcp_nom_entidade_devedora", "dfslcp_dsc_entidade")
YEAR_PROPERTY = "dfslcp_num_ano_orcamento"

# pagination order keys per kind: precatórios page ascending on ordem,
# editais serve ordem DESCENDING (SURVEY S2/O2)
ORDER_BY = {
    "precatorios": [("dfslcp_num_ordem", 1)],
    "editais": [("Ordem", 2)],
    "pagamentos": [("num_ordem", 1)],
}

DEFAULT_COUNT = 500


def _column(prop: str, source: str = "d") -> dict:
    return {"Column": {"Expression": {"SourceRef": {"Source": source}},
                       "Property": prop}}


def _skeleton(kind: str) -> dict:
    """A fresh querydata skeleton (never shared, never mutated in
    place — the reference deep-copies a module-global template
    instead; building fresh is the actor-safe equivalent)."""
    shape = {
        "Query": {
            "Version": 2,
            "From": [{"Name": "d", "Entity": f"tjce_{kind}", "Type": 0}],
            "Select": [],
            "Where": [],
            "OrderBy": [],
        },
        "Binding": {
            "Primary": {"Groupings": [{"Projections": []}]},
            "DataReduction": {"DataVolume": 3,
                              "Primary": {"Window": {"Count": DEFAULT_COUNT}}},
            "Version": 1,
        },
    }
    return {
        "version": "1.0.0",
        "queries": [{
            "Query": {"Commands": [{"SemanticQueryDataShapeCommand": shape}]},
            "QueryId": "",
            "ApplicationContext": {"DatasetId": f"tjce-{kind}"},
        }],
        "cancelQueries": [],
        "modelId": MODEL_IDS.get(kind, 0),
    }


def _command(payload: dict) -> dict:
    return payload["queries"][0]["Query"]["Commands"][0][
        "SemanticQueryDataShapeCommand"
    ]


def _is_entity_filter(f: dict) -> bool:
    """D3 predicate: does this Where item filter an entity property
    (either ``Comparison`` or ``In`` shape)?  Mirrors
    crawler/crawler.py:409-435."""
    cond = f.get("Condition", {})
    prop = (cond.get("Comparison", {}).get("Left", {})
            .get("Column", {}).get("Property"))
    if prop in ENTITY_PROPERTIES:
        return True
    exprs = cond.get("In", {}).get("Expressions")
    if isinstance(exprs, list) and exprs:
        return exprs[0].get("Column", {}).get("Property") in ENTITY_PROPERTIES
    return False


def _is_year_filter(f: dict) -> bool:
    return (f.get("Condition", {}).get("Comparison", {}).get("Left", {})
            .get("Column", {}).get("Property")) == YEAR_PROPERTY


def inject_filters(payload: dict, entity: str | None = None,
                   year: int | None = None) -> dict:
    """The D3 rewrite, as a PURE function (the input payload is
    deep-copied, never mutated — callers may share one base payload
    across Ray tasks): strip pre-existing entity/year filters from
    Where (anti-semijoin on the property name), keep everything else,
    then append the new entity ``In`` filter and/or year
    ``Comparison`` filter.  Injecting twice is idempotent by
    construction."""
    import copy

    payload = copy.deepcopy(payload)
    cmd = _command(payload)
    where = [f for f in cmd["Query"]["Where"]
             if not (entity is not None and _is_entity_filter(f))
             and not (year is not None and _is_year_filter(f))]
    if entity is not None:
        where.append({
            "Condition": {"In": {
                "Expressions": [_column(ENTITY_PROPERTY)],
                "Values": [[{"Literal": {"Value": f"'{entity}'"}}]],
            }}
        })
    if year is not None:
        where.append({
            "Condition": {"Comparison": {
                "ComparisonKind": 0,  # Equals
                "Left": _column(YEAR_PROPERTY),
                "Right": {"Literal": {"Value": f"{year}L"}},
            }}
        })
    cmd["Query"]["Where"] = where
    return payload


def build_payload(kind: str, entity: str | None = None,
                  year: int | None = None, count: int = DEFAULT_COUNT,
                  restart_tokens: list[str] | None = None) -> dict:
    """One page-fetch request body for ``kind`` — OrderBy for stable
    pagination, the window cursor, and the D3-rewritten filters."""
    if kind not in MODEL_IDS:
        raise ValueError(f"unknown record kind: {kind}")
    payload = _skeleton(kind)
    cmd = _command(payload)
    cmd["Query"]["OrderBy"] = [
        {"Direction": direction, "Expression": _column(prop)}
        for prop, direction in ORDER_BY[kind]
    ]
    window = cmd["Binding"]["DataReduction"]["Primary"]["Window"]
    window["Count"] = count if count > 0 else DEFAULT_COUNT
    if restart_tokens:
        window["RestartTokens"] = restart_tokens
    else:
        window.pop("RestartTokens", None)
    return inject_filters(payload, entity=entity, year=year)


def build_entities_payload(last_entity: str | None = None,
                           count: int = 200) -> dict:
    """S4: the distinct-values query behind the entity list —
    ``IncludeEmptyGroups`` on, restart tokens carry the LAST ENTITY
    NAME of the previous page (entity_mapping_crawler.py:36-121)."""
    payload = _skeleton("precatorios")
    cmd = _command(payload)
    cmd["Query"]["Select"] = [
        {**_column(ENTITY_PROPERTY), "Name": f"d.{ENTITY_PROPERTY}"}
    ]
    cmd["Binding"]["IncludeEmptyGroups"] = True
    window = cmd["Binding"]["DataReduction"]["Primary"]["Window"]
    window["Count"] = count
    if last_entity is not None:
        window["RestartTokens"] = [[f"'{last_entity}'"]]
    return payload


def build_timestamp_probe_payload() -> dict:
    """S5: the edital last-updated probe — a Min aggregation
    (Function 3) under a Top window (edital_crawler.py:250-313);
    the engine-side equivalent is ``ds.min("warc_ts")``."""
    payload = _skeleton("editais")
    cmd = _command(payload)
    cmd["Query"]["Select"] = [{
        "Aggregation": {"Expression": _column("data_atualizacao"),
                        "Function": 3},
        "Name": "Min(d.data_atualizacao)",
    }]
    cmd["Binding"]["DataReduction"]["Primary"] = {"Top": {}}
    return payload


def payload_for_url(url: str) -> dict:
    """Map a corpus page URL to the request body that would have
    produced that page.  URL shapes (dsr/synth.py:136,152):
    ``/powerbi/precatorios/<slug>/page/<k>`` and
    ``/powerbi/<kind>/page/<k>``.  Page 0 carries no restart tokens;
    page k > 0 threads the deterministic synthetic token the previous
    page returned (in the real system this is the opaque ``RT`` value
    from page k−1, carried verbatim)."""
    parts = urlsplit(url).path.strip("/").split("/")
    if not parts or parts[0] != "powerbi" or "page" not in parts:
        raise ValueError(f"not a corpus page URL: {url}")
    k = int(parts[-1])
    kind = parts[1]
    slug = parts[2] if kind == "precatorios" and len(parts) == 5 else None
    if kind == "entities":
        return build_entities_payload(
            last_entity=None if k == 0 else f"page{k - 1}-last"
        )
    tokens = None if k == 0 else [[f"'{slug or kind}|page{k}'"]]
    return build_payload(kind, entity=slug, restart_tokens=tokens)


def canonical_json(payload: dict) -> str:
    """Deterministic serialization (sorted keys, no whitespace) — the
    request-identity string whose hash keys caches and traces."""
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))
