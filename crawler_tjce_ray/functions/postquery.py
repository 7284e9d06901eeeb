"""Post-query row options: the reference API's ``apply_filters`` /
``sort_rows`` surface (main.py:696-737) re-expressed as vectorized
Dataset stages, wired to CLI flags.

Reference semantics preserved exactly:

* ``ano_min``/``ano_max`` bound ``ano_orcamento`` (ints, inclusive);
* ``valor_min``/``valor_max`` bound ``valor_atual`` (float compare);
* ``natureza`` is a case-insensitive equality;
* ``sort_rows`` is a *stable* sort on one field — ties keep the
  prior (ordem-ascending) order, which here is made explicit with a
  secondary ``ordem`` key since a distributed sort is not stable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: filterable fields exist on the precatório record only
FILTER_KIND = "precatorios"


def apply_filters(
    ds,
    ano_min: int | None = None,
    ano_max: int | None = None,
    valor_min: float | None = None,
    valor_max: float | None = None,
    natureza: str | None = None,
):
    """Vectorized per-batch filter; a no-op when no filter is set."""
    if all(v is None for v in (ano_min, ano_max, valor_min, valor_max, natureza)):
        return ds

    def filt(t: pa.Table) -> pa.Table:
        mask = pa.array([True] * t.num_rows, pa.bool_())
        if ano_min is not None:
            mask = pc.and_(mask, pc.greater_equal(t["ano_orcamento"], int(ano_min)))
        if ano_max is not None:
            mask = pc.and_(mask, pc.less_equal(t["ano_orcamento"], int(ano_max)))
        if valor_min is not None or valor_max is not None:
            valor = pc.cast(t["valor_atual"], pa.float64())
            if valor_min is not None:
                mask = pc.and_(mask, pc.greater_equal(valor, float(valor_min)))
            if valor_max is not None:
                mask = pc.and_(mask, pc.less_equal(valor, float(valor_max)))
        if natureza is not None:
            mask = pc.and_(
                mask, pc.equal(pc.utf8_lower(t["natureza"]), natureza.lower())
            )
        return t.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def sort_rows(ds, sort_by: str | None, order: str = "asc"):
    """Stable single-field sort (reference: ``sorted(key=..., reverse)``
    over ordem-ascending rows).  Secondary ``ordem`` key reproduces the
    stability a distributed sort does not guarantee."""
    if not sort_by:
        return ds
    descending = order.lower() == "desc"
    keys = [sort_by] if sort_by == "ordem" else [sort_by, "ordem"]
    return ds.sort(keys, descending=[descending] + [False] * (len(keys) - 1))
