"""CSV display-row converters (the K1-K5 sink formatting).

Canonical storage is typed Parquet; these converters produce the
reference's CSV display views (dd/MM/yyyy dates, ``R$ 1.234,56``
currency, ``"-"`` → ``""`` blanking) and are applied inside a final
``map_batches`` before ``write_csv``.
"""

from __future__ import annotations

from decimal import Decimal

from crawler_tjce_ray.dsr.specs import (
    EDITAL_CSV_FIELDS,
    PAGAMENTO_CSV_FIELDS,
    PRECATORIO_CSV_FIELDS,
)
from crawler_tjce_ray.functions.dates import render_date_ddmmyyyy
from crawler_tjce_ray.functions.numeric import format_currency_brl


def precatorio_to_csv_row(row: dict) -> dict:
    """Parity: ``PrecatoriosCrawler.write_csv`` (crawler/crawler.py:1134-1162)."""
    out = {f: row.get(f) for f in PRECATORIO_CSV_FIELDS}
    out["data_cadastro"] = render_date_ddmmyyyy(row.get("data_cadastro"))
    for f in ("valor_original", "valor_atual"):
        v = out.get(f)
        if isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        elif v is None:
            out[f] = format_currency_brl(0.0)
    return out


def edital_to_csv_row(row: dict) -> dict:
    """Parity: ``save_editais`` (crawler/edital_crawler.py:690-717):
    Decimal → currency; any remaining ``"-"`` blanks to ``""``."""
    out = {}
    for f in EDITAL_CSV_FIELDS:
        v = row.get(f, "-")
        if f == "valor" and isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        else:
            # None (schema-absent field → Arrow null) blanks like "-"
            out[f] = "" if v is None or v == "-" else str(v)
    return out


def entity_to_csv_row(row: dict) -> dict:
    """Parity: ``save_entities`` (schemas/entity_mapping_crawler.py:284-310):
    single ``entidade`` column."""
    return {"entidade": str(row.get("entidade", row.get("entity", "")))}


def pagamento_to_csv_row(row: dict) -> dict:
    """Parity: ``save_pagamentos`` (crawler/pagamentos_crawler.py:665-710).

    Note the reference writes 17 columns — ``ordem`` is carried in the
    normalized rows but not in the CSV.
    """
    out = {}
    for f in PAGAMENTO_CSV_FIELDS:
        v = row.get(f, "-")
        if isinstance(v, Decimal):
            out[f] = format_currency_brl(float(v))
        else:
            out[f] = "" if v is None or v == "-" else str(v)
    return out


# ---------------------------------------------------------------------------
# CSV writers (K1-K4): canonical records Dataset → reference display CSV
# ---------------------------------------------------------------------------

#: per-kind (converter, field order, encoding).  Encodings mirror the
#: reference exactly: precatórios plain utf-8 (crawler/crawler.py:1119),
#: editais/pagamentos/entities utf-8-sig with BOM
#: (edital_crawler.py:695, pagamentos_crawler.py:~670,
#: entity_mapping_crawler.py:293).
CSV_SINKS = {
    "precatorios": (precatorio_to_csv_row, PRECATORIO_CSV_FIELDS, "utf-8"),
    "editais": (edital_to_csv_row, EDITAL_CSV_FIELDS, "utf-8-sig"),
    "pagamentos": (pagamento_to_csv_row, PAGAMENTO_CSV_FIELDS, "utf-8-sig"),
    "entities": (entity_to_csv_row, ["entidade"], "utf-8-sig"),
}


# ---------------------------------------------------------------------------
# K6 analog: post-write artifact hooks
# (reference: services/pinata_uploader.py:10-159 — after the CSV is
# written, POST it to Pinata/IPFS and record the returned CID)
# ---------------------------------------------------------------------------

_POST_WRITE_HOOKS: list = []


def register_post_write_hook(fn):
    """Register ``fn(path, kind, n_rows)`` to run after every
    single-file CSV write.  Hooks run in registration order; an
    exception propagates (the reference likewise surfaces upload
    failures).  Returns ``fn`` so it can be used as a decorator."""
    _POST_WRITE_HOOKS.append(fn)
    return fn


def clear_post_write_hooks() -> None:
    _POST_WRITE_HOOKS.clear()


def manifest_hook(path: str, kind: str, n_rows: int) -> dict:
    """Default artifact hook: writes ``<path>.manifest.json`` with the
    sha256 content address, byte size, row count and kind — the
    offline analog of the reference's pinned-CID record (a CID is a
    content hash; sha256 is the sandbox-reproducible equivalent)."""
    import hashlib
    import json
    import os

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    manifest = {
        "file": os.path.basename(path),
        "kind": kind,
        "rows": int(n_rows),
        "bytes": os.path.getsize(path),
        "sha256": h.hexdigest(),
    }
    with open(path + ".manifest.json", "w", encoding="utf-8") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


class PinataUploader:
    """K6 parity shell for the reference's Pinata/IPFS upload
    (``services/pinata_uploader.py:10-159``: multipart POST of the
    finished CSV to ``pinFileToIPFS``, keyed by a JWT, returning the
    CID).  This environment has no network, so the HTTP transport is
    injected: ``post_fn(filename, content_bytes, jwt) -> dict`` must
    return a Pinata-shaped ``{"IpfsHash": ...}`` response.  Without an
    injected transport the hook raises at call time with a clear
    message instead of silently pretending to pin."""

    GATEWAY = "https://gateway.pinata.cloud/ipfs/"

    def __init__(self, jwt: str | None = None, post_fn=None):
        self.jwt = jwt
        self.post_fn = post_fn
        self.pinned: list[dict] = []

    def __call__(self, path: str, kind: str, n_rows: int) -> dict:
        import os

        if self.post_fn is None:
            raise RuntimeError(
                "PinataUploader has no transport: network is unavailable "
                "in this environment — inject post_fn(filename, content, "
                "jwt) to enable uploads (reference "
                "services/pinata_uploader.py)."
            )
        with open(path, "rb") as f:
            resp = self.post_fn(os.path.basename(path), f.read(), self.jwt)
        cid = resp["IpfsHash"]
        record = {
            "file": os.path.basename(path),
            "kind": kind,
            "rows": int(n_rows),
            "cid": cid,
            "url": self.GATEWAY + cid,
        }
        self.pinned.append(record)
        return record


def write_display_csv(ds, kind: str, out_file: str) -> int:
    """Write one reference-shaped CSV display file from a records
    Dataset.  Returns the row count.

    The *formatting* runs distributed (``map_batches`` row converters);
    only the final serialization is driver-side, because the reference
    contract is a single ordered file — the scale path is
    ``write_display_csv_dir`` (partitioned ``ds.write_csv``), with this
    single-file view reserved for bounded result sets.  An empty input
    still writes the header row (reference quirk, K2:
    edital_crawler.py:698-702)."""
    import csv

    import pandas as pd

    convert, fields, encoding = CSV_SINKS[kind]

    def to_display(df: pd.DataFrame) -> pd.DataFrame:
        rows = [convert(r) for r in df.to_dict("records")]
        return pd.DataFrame(rows, columns=fields, dtype=object)

    if hasattr(ds, "map_batches"):  # Dataset
        display = ds.map_batches(to_display, batch_format="pandas").to_pandas()
    else:  # small pandas result
        display = to_display(ds)
    with open(out_file, "w", newline="", encoding=encoding) as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        for row in display.to_dict("records"):
            writer.writerow(row)
    for hook in _POST_WRITE_HOOKS:
        hook(out_file, kind, len(display))
    return len(display)


def write_display_csv_dir(ds, kind: str, out_dir: str) -> None:
    """Scale path: distributed partitioned CSV (one part per block) of
    the same display rows — resumable layout, no driver materialize.

    Post-write hooks (the K6/Pinata analog) fire per part file, so
    every artifact of the partitioned path is manifested/pinned just
    like the single-file path's output."""
    import glob
    import os

    import pandas as pd

    convert, fields, _ = CSV_SINKS[kind]

    def to_display(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [convert(r) for r in df.to_dict("records")], columns=fields,
            dtype=object,
        )

    ds.map_batches(to_display, batch_format="pandas").write_csv(out_dir)
    if _POST_WRITE_HOOKS:
        for part in sorted(glob.glob(os.path.join(out_dir, "*"))):
            if not os.path.isfile(part):
                continue
            with open(part, encoding="utf-8") as f:
                n_rows = max(0, sum(1 for _ in f) - 1)  # minus header
            for hook in _POST_WRITE_HOOKS:
                hook(part, kind, n_rows)
