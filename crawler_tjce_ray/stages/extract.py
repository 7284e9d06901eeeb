"""Stateless extraction stages: pages (url, html) → typed record rows.

This is the M1-M6 parse stage of SURVEY.md §2.2 re-expressed as
``map_batches`` callables over zero-copy Arrow batches.  Pages are
self-contained (row 0 of every DSR page is a full base row), so the
stage needs no cross-batch state and parallelizes freely — the key
architectural difference from the reference's sequential loop
(crawler/crawler.py:556-677).

The callables are classes so the (tiny) setup — schema objects, the
pinned ``current_year`` — happens once per actor; they also work as
plain stateless tasks since they hold no mutable state.
"""

from __future__ import annotations

import json
from datetime import datetime

import pyarrow as pa

# orjson fast path with stdlib-exact fallback for big-int/NaN bodies
# (orjson silently floats >64-bit ints and rejects NaN/Infinity)
from crawler_tjce_ray.functions.jsonio import loads_exact as json_loads

from crawler_tjce_ray.dsr.decode import (
    decode_editais_columns,
    decode_editais_page,
    decode_pagamentos_columns,
    decode_pagamentos_page,
    decode_precatorios_columns,
    decode_precatorios_page,
)

_DECIMAL = pa.decimal128(18, 2)

PRECATORIO_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ordem", pa.int64()),
        ("processo", pa.string()),
        ("comarca", pa.string()),
        ("ano_orcamento", pa.int32()),
        ("natureza", pa.string()),
        ("data_cadastro", pa.timestamp("ms")),
        ("tipo_classificacao", pa.string()),
        ("valor_original", _DECIMAL),
        ("valor_atual", _DECIMAL),
        ("situacao", pa.string()),
    ]
)

EDITAL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ordem", pa.int64()),
        ("ano_orcamento", pa.int32()),
        ("natureza", pa.string()),
        ("data_cadastro", pa.string()),
        ("precatorio", pa.string()),
        ("status", pa.string()),
        ("valor", _DECIMAL),
    ]
)

PAGAMENTO_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("ordem", pa.int64()),
        ("quantidade", pa.int32()),
        ("modalidade", pa.string()),
        ("natureza", pa.string()),
        ("exercicio", pa.int32()),
        ("data_protocolo", pa.string()),
        ("precatorio", pa.string()),
        ("credor_beneficiario", pa.string()),
        ("tipo", pa.string()),
        ("data_pagamento", pa.string()),
        ("cpf_cnpj", pa.string()),
        ("valor_bruto", _DECIMAL),
        ("previdencia", _DECIMAL),
        ("irrf", _DECIMAL),
        ("honorarios", _DECIMAL),
        ("valor_bruto_contratual", _DECIMAL),
        ("rra", _DECIMAL),
        ("valor_liquido", _DECIMAL),
    ]
)


def classify_url(url: str) -> str | None:
    """Record type carried by a page url, or None for non-DSR pages."""
    for kind in ("precatorios", "editais", "pagamentos", "entities"):
        if f"/{kind}/" in url:
            return kind
    return None


class _ExtractBase:
    """Shared per-page JSON decode loop.

    The per-batch cost is dominated by ``json.loads`` of the ~50-500 KB
    envelopes; rows-per-page (≈500) times pages-per-batch stays well
    under block limits.  ``exercicio``-style int coercion happens via
    the Arrow schema cast at table construction.
    """

    schema: pa.Schema = None
    empty_marker_col = "ordem"

    def __init__(self, current_year: int | None = None):
        self.current_year = current_year or datetime.now().year
        self.pages_failed = 0  # corrupt-page counter (per actor/task)

    def decode_page(self, resp: dict) -> list[dict]:
        raise NotImplementedError

    def decode_page_columns(self, resp: dict) -> tuple[dict[str, list], int]:
        """Columnar decode: ``{field -> values list}`` + row count.

        Default implementation adapts ``decode_page``; kinds with a
        vectorized decoder override this.
        """
        rows = self.decode_page(resp)
        cols = {
            f.name: [r.get(f.name) for r in rows]
            for f in self.schema
            if f.name != "url"
        }
        return cols, len(rows)

    def _page_table(self, cols: dict[str, list], n: int, url: str) -> pa.Table:
        """Typed Arrow table built column-wise.

        ``Table.from_pylist`` pays ~60 µs/row of per-row dict protocol
        overhead; building each column with ``pa.array(values, type)``
        is ~25× faster at 384 rows/page (measured) and follows the same
        python→Arrow conversion rules, so the typed-conversion failure
        semantics (e.g. "-" landing in an int column fails the page)
        are unchanged.
        """
        arrays = []
        for field in self.schema:
            if field.name == "url":
                arrays.append(pa.array([url] * n, field.type))
            else:
                arrays.append(pa.array(cols[field.name], field.type))
        return pa.Table.from_arrays(arrays, schema=self.schema)

    def extract_parsed(self, pages: list[tuple[str, dict | None]]) -> pa.Table:
        """Already-parsed envelopes → typed record table.

        The fused fetch actor parses each page ONCE (for outlink
        discovery) and hands the parsed dict here — no second
        ``json.loads`` and no intermediate Arrow copy of the html
        bytes.  A ``None`` doc marks a body that failed to parse.
        """
        tables: list[pa.Table] = []
        for url, resp in pages:
            # a corrupt page must never poison the batch (at corpus
            # scale malformed bodies are a certainty): skip and count,
            # mirroring the reference's drop-invalid-row behavior.
            # The TYPED Arrow conversion happens per page INSIDE the
            # guard — e.g. a delta row whose exhausted-C default "-"
            # lands in an int column (a faithful reference behavior,
            # edital_crawler.py:600) fails conversion for that page
            # only, not for every page in the batch.
            try:
                if resp is None:
                    raise ValueError("unparseable page body")
                cols, n = self.decode_page_columns(resp)
                tables.append(self._page_table(cols, n, url))
            except Exception:
                self.pages_failed += 1
                continue
        if not tables:
            return pa.Table.from_pylist([], schema=self.schema)
        return pa.concat_tables(tables)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages: list[tuple[str, dict | None]] = []
        urls = batch["url"]
        htmls = batch["html"]
        for i in range(len(batch)):
            try:
                resp = json_loads(htmls[i].as_py())
            except Exception:
                resp = None
            pages.append((urls[i].as_py(), resp))
        return self.extract_parsed(pages)


class ExtractPrecatorios(_ExtractBase):
    schema = PRECATORIO_SCHEMA

    # cross-page finalized-string memo bound: dictionary vocabularies
    # (comarca/situacao/natureza/processo strings) are far smaller
    # than this in practice; the cap only guards a pathological corpus
    _MEMO_MAX = 500_000

    def __init__(self, current_year: int | None = None):
        super().__init__(current_year)
        # per-actor state, built once (the actor-pool contract): the
        # cross-page finalize memo lives for the actor's lifetime
        self._memo: dict = {}

    def decode_page(self, resp):
        rows, _ = decode_precatorios_page(resp, 0, self.current_year)
        return rows

    def decode_page_columns(self, resp):
        # vectorized decode (NumPy R-mask + memoized finalize);
        # equivalence with decode_page pinned by tests/test_decode_columnar.py
        if sum(len(m) for m in self._memo.values()) > self._MEMO_MAX:
            self._memo.clear()
        cols, _ = decode_precatorios_columns(
            resp, 0, self.current_year, memo=self._memo
        )
        return cols, len(cols["ordem"])


class ExtractEditais(_ExtractBase):
    schema = EDITAL_SCHEMA

    _MEMO_MAX = 500_000

    def __init__(self, current_year: int | None = None):
        super().__init__(current_year)
        self._memo: dict = {}  # cross-page formatted-ValueDict cache

    def decode_page(self, resp):
        # in-page sort by ordem asc (the reference's final sort,
        # crawler/edital_crawler.py:630-631, applied page-locally;
        # global order is re-established by assign_global_ordem)
        return sorted(decode_editais_page(resp), key=lambda r: r.get("ordem", 0))

    def decode_page_columns(self, resp):
        if sum(len(m) for m in self._memo.values()) > self._MEMO_MAX:
            self._memo.clear()
        cols = decode_editais_columns(resp, memo=self._memo)
        n = len(cols["ordem"])
        # same stable in-page ordem sort as decode_page
        order = sorted(range(n), key=lambda i: cols["ordem"][i])
        return {f: [v[i] for i in order] for f, v in cols.items()}, n


class ExtractPagamentos(_ExtractBase):
    schema = PAGAMENTO_SCHEMA

    _MEMO_MAX = 500_000

    def __init__(self, current_year: int | None = None):
        super().__init__(current_year)
        self._memo: dict = {}  # cross-page formatted-ValueDict cache

    def decode_page(self, resp):
        return decode_pagamentos_page(resp, 0)

    def decode_page_columns(self, resp):
        if sum(len(m) for m in self._memo.values()) > self._MEMO_MAX:
            self._memo.clear()
        cols = decode_pagamentos_columns(resp, 0, memo=self._memo)
        return cols, len(cols["ordem"])


def filter_kind(batch: pa.Table, kind: str) -> pa.Table:
    """Vectorized url-substring filter for one record type."""
    import pyarrow.compute as pc

    return batch.filter(pc.match_substring(batch["url"], f"/{kind}/"))
