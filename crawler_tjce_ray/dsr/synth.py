"""Deterministic synthetic corpus: Common-Crawl-style ``pages`` whose
``html`` payloads are DSR envelopes (FIXTURES.md F1/F2).

Everything is a pure function of ``(seed, page index)`` — no
wall-clock, no global RNG — so any subset of pages can be generated
independently inside ``map_batches`` and two runs agree byte-for-byte.

The corpus models the reference crawl surface:

* per-entity *precatórios* cursor chains (the primary dataset,
  examples/response.json shape — Sum(...)-wrapped descriptor names,
  dictionary-encoded strings, delta rows with inherit bitmasks, RT
  restart tokens chaining page k → k+1);
* one *editais* chain and one *pagamentos* chain (positional shapes);
* one *entity-list* chain (distinct-values pages);
* Zipf-skewed hosts with one dominant host (≥60% of urls) mirroring
  the reference's default-entity concentration (config.py:26) — the
  skew the frontier must handle explicitly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from crawler_tjce_ray.dsr import specs
from crawler_tjce_ray.functions.text import slugify

DOMINANT_HOST = "esaj.tjce.example.org"
MINOR_HOSTS = [
    "precatorios.tjpb.example.org",
    "portal.tjrn.example.org",
    "consulta.tjpi.example.org",
    "paineis.tjma.example.org",
]

_CITY_POOL = [
    "FORTALEZA", "SOBRAL", "JUAZEIRO DO NORTE", "MORADA NOVA", "TAUÁ",
    "QUIXERAMOBIM", "CRATO", "ITAPIPOCA", "MARACANAÚ", "CAUCAIA",
    "IGUATU", "ARACATI", "CANINDÉ", "CRATEÚS", "TIANGUÁ",
    "PACAJUS", "RUSSAS", "BATURITÉ", "CAMOCIM", "ACARAÚ",
]

NATUREZAS = ["Alimentar", "Comum"]
TIPOS = ["Preferencial", "Orçamentário"]
SITUACOES = ["Cadastrado", "Em Pagamento Parcelado", "Pago", "Provisionamento Total"]
EDITAL_STATUS = ["PAGO", "INDEFERIDO", "DEFERIDO", "EM ANALISE"]
MODALIDADES = ["ACORDOS", "CRONOLOGIA", "DISP. JUIZ ORIGEM", "SUPERPREFERENCIA"]

_WORDS_PT = (
    "precatório pagamento tribunal justiça ordem cronológica entidade devedora "
    "orçamento exercício natureza alimentar credor processo valor atualizado "
    "sentença trânsito julgado requisição ofício comarca vara fazenda pública"
).split()
_WORDS_EN = (
    "court payment order budget year creditor process value judgment "
    "public treasury district chronological list entity debtor final"
).split()


def entity_names(n_entities: int) -> list[str]:
    """Deterministic official entity names (accented, reference-style)."""
    names = ["ESTADO DO CEARÁ"]
    for i in range(1, n_entities):
        names.append(f"MUNICÍPIO DE {_CITY_POOL[(i - 1) % len(_CITY_POOL)]}"
                     + (f" {1 + (i - 1) // len(_CITY_POOL)}" if i - 1 >= len(_CITY_POOL) else ""))
    return names[:n_entities]


@dataclass(frozen=True)
class PagePlan:
    """One synthetic page: everything needed to generate it in isolation."""

    index: int          # global page index (the RNG key together with seed)
    url: str
    host: str
    kind: str           # precatorios | editais | pagamentos | entities
    entity: str         # official name ("" for non-entity kinds)
    entity_slug: str
    page_no: int        # 0-based position in its cursor chain
    chain_len: int      # pages in this chain (RT present iff page_no < chain_len-1)


def build_page_plan(
    n_entities: int = 12,
    total_pages: int = 60,
    seed: int = 42,
    dominant_share: float = 0.65,
) -> list[PagePlan]:
    """Driver-side page plan (one entry per page; small — entities and
    chains only, never rows).

    Precatório pages are split across entities by a Zipf-ish weight
    with entity 0 (dominant host) holding ``dominant_share`` of all
    urls; editais/pagamentos/entities chains get a fixed small share of
    the dominant host.
    """
    names = entity_names(n_entities)
    rng = np.random.default_rng([seed, 0xC0FFEE])

    aux_pages = max(1, total_pages // 20)
    prec_pages = max(n_entities, total_pages - 3 * aux_pages)

    # entity 0 takes the dominant share; the rest decays 1/(rank+1)
    weights = np.array([1.0 / (i + 1) for i in range(1, n_entities)])
    weights = (1 - dominant_share) * weights / weights.sum() if n_entities > 1 else np.array([])
    shares = np.concatenate([[dominant_share], weights])
    counts = np.maximum(1, np.floor(shares * prec_pages).astype(int))
    # entities 0..2 live on the dominant host, the rest round-robin minors
    hosts = [
        DOMINANT_HOST if i < max(1, n_entities // 4) else MINOR_HOSTS[i % len(MINOR_HOSTS)]
        for i in range(n_entities)
    ]

    plan: list[PagePlan] = []
    idx = 0
    for ent_i, name in enumerate(names):
        slug = slugify(name)
        chain = int(counts[ent_i])
        for k in range(chain):
            plan.append(
                PagePlan(
                    index=idx,
                    url=f"https://{hosts[ent_i]}/powerbi/precatorios/{slug}/page/{k}",
                    host=hosts[ent_i],
                    kind="precatorios",
                    entity=name,
                    entity_slug=slug,
                    page_no=k,
                    chain_len=chain,
                )
            )
            idx += 1
    for kind in ("editais", "pagamentos", "entities"):
        for k in range(aux_pages):
            plan.append(
                PagePlan(
                    index=idx,
                    url=f"https://{DOMINANT_HOST}/powerbi/{kind}/page/{k}",
                    host=DOMINANT_HOST,
                    kind=kind,
                    entity="",
                    entity_slug="",
                    page_no=k,
                    chain_len=aux_pages,
                )
            )
            idx += 1
    rng.shuffle([])  # keep rng in the signature-stable path (no-op)
    return plan


# ---------------------------------------------------------------------------
# row-value generation (pure in (seed, page index))
# ---------------------------------------------------------------------------

def _page_rng(seed: int, page_index: int) -> np.random.Generator:
    return np.random.default_rng([seed, 0x7C3E, page_index])


def _brl(value: float) -> str:
    s = f"{value:,.2f}".replace(",", "X").replace(".", ",").replace("X", ".")
    return f"R${s}"  # no space — matches the live ValorAtualFormatado dict values


def _processo(rng: np.random.Generator, year: int) -> str:
    return f"{int(rng.integers(1, 9_999_999)):07d}-{int(rng.integers(10, 99)):02d}.{year}.8.06.{int(rng.integers(0, 9999)):04d}"


def _delta_encode(raw_rows: list[list], schema_len: int) -> list[dict]:
    """Wire-encode rows: full base row then sparse delta rows with the
    inherit bitmask ``R`` (bit j set ⇔ column j equals the previous
    row's value — exactly the encoding the reference decodes,
    SURVEY.md §1.2)."""
    out = []
    prev = None
    for r in raw_rows:
        if prev is None:
            out.append({"C": list(r)})
        else:
            mask = 0
            sparse = []
            for j in range(schema_len):
                if r[j] == prev[j]:
                    mask |= 1 << j
                else:
                    sparse.append(r[j])
            # R is always present on delta rows (R absent means
            # "inherit everything" to the decoder, crawler/crawler.py:911-916)
            out.append({"C": sparse, "R": mask})
        prev = r
    return out


def generate_precatorios_envelope(
    plan: PagePlan, rows_per_page: int, seed: int, sum_wrapped: bool = False
) -> dict:
    """A precatórios DSR page in the examples/response.json shape.

    ``sum_wrapped=True`` reproduces the live API's ``Sum(...)``
    descriptor names (which trip the reference's dead-regex quirk);
    the default plain names make every column resolvable — the
    reference decoder produces the same output either way on the
    columns it can see, and the quirk itself is covered by the
    fixture conformance tests.
    """
    rng = _page_rng(seed, plan.index)
    n = rows_per_page
    year_base = 2020 + int(rng.integers(0, 6))

    processos = [_processo(rng, year_base + int(rng.integers(0, 3))) for _ in range(n)]
    anos = (year_base + rng.integers(0, 4, n)).tolist()
    nat_idx = rng.integers(0, len(NATUREZAS), n)
    dates_ms = (
        (np.datetime64("2018-01-01").astype("int64") * 86400_000)
        + rng.integers(0, 3000, n) * 86400_000
    )
    tipo_idx = rng.integers(0, len(TIPOS), n)
    valores = np.round(rng.uniform(100, 500_000, n), 2)
    ordens = (plan.page_no * rows_per_page + np.arange(1, n + 1)).tolist()
    sit_idx = rng.integers(0, len(SITUACOES), n)
    # a page usually spans few comarcas (dictionary reuse like the fixture)
    page_comarcas = rng.choice(len(_CITY_POOL), size=max(1, int(rng.integers(1, 4))), replace=False)
    com_idx = rng.choice(len(page_comarcas), n)
    atuais = np.round(valores * rng.uniform(1.0, 1.6, n), 2)

    d0 = processos
    d1 = NATUREZAS
    d2 = TIPOS
    d3 = SITUACOES
    d4 = [f"COMARCA DE {_CITY_POOL[c]}" for c in page_comarcas]
    d5 = [_brl(v) for v in atuais.tolist()]

    raw_rows = [
        [
            i,                       # G0 processo → D0 index
            int(anos[i]),            # G1 ano (Sum-wrapped → unmapped in decode)
            int(nat_idx[i]),         # G2 natureza → D1
            int(dates_ms[i]),        # G3 data epoch-ms
            int(tipo_idx[i]),        # G4 tipo → D2
            float(valores[i]),       # G5 valor_original (Sum-wrapped)
            int(ordens[i]),          # G6 ordem (Sum-wrapped)
            int(sit_idx[i]),         # G7 situacao → D3
            int(com_idx[i]),         # G8 comarca → D4
            i,                       # G9 valor_atual → D5 index
        ]
        for i in range(n)
    ]
    dm0 = _delta_encode(raw_rows, 10)
    dm0[0]["S"] = [
        {"N": "G0", "T": 1, "DN": "D0"},
        {"N": "G1", "T": 4},
        {"N": "G2", "T": 1, "DN": "D1"},
        {"N": "G3", "T": 7},
        {"N": "G4", "T": 1, "DN": "D2"},
        {"N": "G5", "T": 3},
        {"N": "G6", "T": 4},
        {"N": "G7", "T": 1, "DN": "D3"},
        {"N": "G8", "T": 1, "DN": "D4"},
        {"N": "G9", "T": 1, "DN": "D5"},
    ]

    ds: dict = {
        "N": "DS0",
        "ValueDicts": {"D0": d0, "D1": d1, "D2": d2, "D3": d3, "D4": d4, "D5": d5},
        "PH": [{"DM0": dm0}],
        "IC": plan.page_no < plan.chain_len - 1,
    }
    if plan.page_no < plan.chain_len - 1:
        last = raw_rows[-1]
        ds["RT"] = [[
            f"{last[6]}L",
            f"'{processos[-1]}'",
            f"{last[1]}L",
            f"'{NATUREZAS[last[2]]}'",
            f"datetime'{np.datetime64(last[3], 'ms')}'",
            f"'{TIPOS[last[4]]}'",
            f"{last[5]}D",
            f"'{SITUACOES[last[7]]}'",
            f"'{d4[last[8]]}'",
            f"'{d5[-1]}'",
        ]]
    return {
        "results": [{
            "jobId": f"synthetic-{plan.index}",
            "result": {"data": {
                "descriptor": {"Select": [
                    {"Kind": 1, "Value": f"G{i}", "Name": name}
                    for i, name in enumerate(
                        specs.PRECATORIO_SELECT_NAMES_SUM
                        if sum_wrapped
                        else specs.PRECATORIO_SELECT_NAMES_PLAIN
                    )
                ]},
                "dsr": {"DS": [ds], "Version": 2},
            }},
        }]
    }


def generate_editais_envelope(plan: PagePlan, rows_per_page: int, seed: int) -> dict:
    """An editais DSR page (ordem desc, positional 7-column shape)."""
    rng = _page_rng(seed, plan.index)
    n = rows_per_page
    total = plan.chain_len * rows_per_page
    # server orders Ordem DESC (crawler/edital_crawler.py:192-204)
    ordem_hi = total - plan.page_no * rows_per_page
    ordens = list(range(ordem_hi, ordem_hi - n, -1))
    anos = [str(2020 + int(a)) for a in rng.integers(0, 6, n)]
    nats = ["ALIMENTAR" if x else "COMUM" for x in rng.integers(0, 2, n)]
    dates = [
        (f"{int(m)}/{int(d)}/{2019 + int(y)}" if us else f"{int(d):02d}/{int(m):02d}/{2019 + int(y)}")
        for us, m, d, y in zip(
            rng.integers(0, 2, n), rng.integers(1, 13, n), rng.integers(1, 28, n), rng.integers(0, 6, n)
        )
    ]
    precs = [_processo(rng, 2019 + int(rng.integers(0, 6))) for _ in range(n)]
    stats = [EDITAL_STATUS[i] for i in rng.integers(0, len(EDITAL_STATUS), n)]
    vals = np.round(rng.uniform(1000, 2_000_000, n), 2)

    d0 = sorted(set(anos))
    d1 = ["ALIMENTAR", "COMUM"]
    d2 = sorted(set(dates))
    d3 = precs
    d4 = EDITAL_STATUS
    raw_rows = [
        [
            ordens[i],
            d0.index(anos[i]),
            d1.index(nats[i]),
            d2.index(dates[i]),
            i,
            d4.index(stats[i]),
            float(vals[i]),
        ]
        for i in range(n)
    ]
    dm0 = _delta_encode(raw_rows, 7)
    dm0[0]["S"] = [
        {"N": "G0", "T": 4},
        {"N": "G1", "T": 1, "DN": "D0"},
        {"N": "G2", "T": 1, "DN": "D1"},
        {"N": "G3", "T": 1, "DN": "D2"},
        {"N": "G4", "T": 1, "DN": "D3"},
        {"N": "G5", "T": 1, "DN": "D4"},
        {"N": "G6", "T": 3},
    ]
    ds: dict = {
        "N": "DS0",
        "ValueDicts": {"D0": d0, "D1": d1, "D2": d2, "D3": d3, "D4": d4},
        "PH": [{"DM0": dm0}],
        "IC": plan.page_no < plan.chain_len - 1,
    }
    if plan.page_no < plan.chain_len - 1:
        ds["RT"] = [[f"{ordens[-1]}L"]]
    return {"results": [{"result": {"data": {
        "descriptor": {"Select": [{"Kind": 1, "Value": f"G{i}", "Name": f"e.c{i}"} for i in range(7)]},
        "dsr": {"DS": [ds], "Version": 2},
    }}}]}


def generate_pagamentos_envelope(plan: PagePlan, rows_per_page: int, seed: int) -> dict:
    """A pagamentos DSR page (17-column positional shape).

    The decoder treats DM0 row 0 as schema-only
    (crawler/pagamentos_crawler.py:525-527), so the generator emits
    ``rows_per_page + 1`` wire rows and — to keep pages self-contained
    for distributed decode — makes row 1 a full-content delta (R=0).
    """
    rng = _page_rng(seed, plan.index)
    n = rows_per_page
    first_names = ["Maria", "José", "Ana", "Francisco", "Antônia", "João", "Noézia", "Raimundo"]
    last_names = ["da Silva", "Souza", "Almeida Alves", "de Menezes", "Ferreira", "dos Santos"]

    quant = rng.integers(1, 4, n + 1)
    mod_idx = rng.integers(0, len(MODALIDADES), n + 1)
    nat = ["" for _ in range(n + 1)]  # reference golden has blank natureza
    exer = [str(2018 + int(x)) for x in rng.integers(0, 7, n + 1)]
    dproto = [f"{int(m)}/{int(d)}/{2017 + int(y)}" for m, d, y in zip(
        rng.integers(1, 13, n + 1), rng.integers(1, 28, n + 1), rng.integers(0, 6, n + 1))]
    precs = [_processo(rng, 2017 + int(rng.integers(0, 6))) for _ in range(n + 1)]
    credores = [
        f"{first_names[int(a)]} {last_names[int(b)]}"
        for a, b in zip(rng.integers(0, len(first_names), n + 1), rng.integers(0, len(last_names), n + 1))
    ]
    tipos = ["A" if x else "C" for x in rng.integers(0, 2, n + 1)]
    dpag = [f"{int(m)}/{int(d)}/{2022 + int(y)}" for m, d, y in zip(
        rng.integers(1, 13, n + 1), rng.integers(1, 28, n + 1), rng.integers(0, 4, n + 1))]
    cpfs = [
        f"{int(a):03d}.{int(b):03d}.{int(c):03d}-{int(d):02d}"
        for a, b, c, d in zip(
            rng.integers(0, 1000, n + 1), rng.integers(0, 1000, n + 1),
            rng.integers(0, 1000, n + 1), rng.integers(0, 100, n + 1))
    ]
    bruto = np.round(rng.uniform(0, 300_000, n + 1), 2)
    prev_ = np.round(bruto * rng.uniform(0, 0.15, n + 1), 2)
    irrf = np.round(bruto * rng.uniform(0, 0.1, n + 1), 2)
    hono = np.round(bruto * rng.uniform(0, 0.2, n + 1), 2)
    vbc = np.round(rng.uniform(0, 50_000, n + 1), 2)
    rra = np.round(rng.uniform(0, 100, n + 1), 2)
    liq = np.round(bruto - prev_ - irrf - hono, 2)

    d = {
        "D0": MODALIDADES,
        "D1": [""],
        "D2": sorted(set(exer)),
        "D3": sorted(set(dproto)),
        "D4": precs,
        "D5": credores,
        "D6": ["A", "C"],
        "D7": sorted(set(dpag)),
        "D8": cpfs,
    }
    raw_rows = [
        [
            int(quant[i]), int(mod_idx[i]), 0, d["D2"].index(exer[i]),
            d["D3"].index(dproto[i]), i, i, d["D6"].index(tipos[i]),
            d["D7"].index(dpag[i]), i,
            float(bruto[i]), float(prev_[i]), float(irrf[i]), float(hono[i]),
            float(vbc[i]), float(rra[i]), float(liq[i]),
        ]
        for i in range(n + 1)
    ]
    dm0 = _delta_encode(raw_rows, 17)
    dm0[0]["S"] = (
        [{"N": "G0", "T": 4}]
        + [{"N": f"G{j}", "T": 1, "DN": f"D{j-1}"} for j in range(1, 10)]
        + [{"N": f"G{j}", "T": 3} for j in range(10, 17)]
    )
    # self-containment: force row 1 to carry every column (R absent, full C)
    if len(dm0) > 1:
        dm0[1] = {"C": list(raw_rows[1]), "R": 0}
    ds: dict = {
        "N": "DS0",
        "ValueDicts": d,
        "PH": [{"DM0": dm0}],
        "IC": plan.page_no < plan.chain_len - 1,
    }
    if plan.page_no < plan.chain_len - 1:
        ds["RT"] = [[f"{plan.page_no + 1}L"]]
    return {"results": [{"result": {"data": {
        "descriptor": {"Select": [{"Kind": 1, "Value": f"G{i}", "Name": f"p.c{i}"} for i in range(17)]},
        "dsr": {"DS": [ds], "Version": 2},
    }}}]}


def generate_entities_envelope(plan: PagePlan, rows_per_page: int, seed: int, n_entities: int = 12) -> dict:
    """An entity-list distinct-values page (G0 rows, name restart token)."""
    names = ["--- Selecione a Entidade"] + entity_names(n_entities)
    per = max(1, (len(names) + plan.chain_len - 1) // plan.chain_len)
    chunk = names[plan.page_no * per : (plan.page_no + 1) * per]
    ds: dict = {
        "N": "DS0",
        "PH": [{"DM0": [{"G0": f"'{n}'"} for n in chunk]}],
        "IC": plan.page_no < plan.chain_len - 1,
    }
    if plan.page_no < plan.chain_len - 1 and chunk:
        ds["RT"] = [[f"'{chunk[-1]}'"]]
    return {"results": [{"result": {"data": {"dsr": {"DS": [ds], "Version": 2}}}}]}


_GENERATORS = {
    "precatorios": generate_precatorios_envelope,
    "editais": generate_editais_envelope,
    "pagamentos": generate_pagamentos_envelope,
    "entities": generate_entities_envelope,
}


def generate_page(plan: PagePlan, rows_per_page: int, seed: int) -> dict:
    """One full ``pages`` row: url, warc_ts, html (DSR JSON bytes), text, lang."""
    rng = _page_rng(seed, plan.index + 1_000_000_007)
    envelope = _GENERATORS[plan.kind](plan, rows_per_page, seed)
    lang = "pt" if rng.random() < 0.85 else "en"
    words = _WORDS_PT if lang == "pt" else _WORDS_EN
    n_words = int(rng.integers(40, 200))
    text = " ".join(words[i] for i in rng.integers(0, len(words), n_words))
    warc_ts = np.datetime64("2025-01-01", "ms") + np.timedelta64(
        int(rng.integers(0, 180 * 86400)) * 1000, "ms"
    )
    return {
        "url": plan.url,
        "warc_ts": warc_ts.astype("datetime64[ms]").astype(object),
        "html": json.dumps(envelope, ensure_ascii=False).encode("utf-8"),
        "text": text,
        "lang": lang,
    }
