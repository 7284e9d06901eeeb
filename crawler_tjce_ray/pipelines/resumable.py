"""Resumable bulk extraction: one output partition per input shard,
skip-finished semantics.

The crawl path checkpoints per wave (pipelines/crawl.py); this is the
equivalent contract for OFFLINE bulk extraction over an existing pages
corpus: output is laid out as ``out_dir/shard=<input-file-stem>/``
with a ``_SUCCESS`` marker per shard, so a killed run redoes only
unfinished shards — never one giant file, never a full restart
(SURVEY §7 "Resumable output").

Each shard is one Ray task (read shard → filter kind → DSR extract →
write partition → marker).  Shards are independent, so a 100 TB corpus
is just more tasks; the scheduler pipelines them.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray

from crawler_tjce_ray.stages.extract import (
    ExtractEditais,
    ExtractPagamentos,
    ExtractPrecatorios,
)

_EXTRACTORS = {
    "precatorios": ExtractPrecatorios,
    "editais": ExtractEditais,
    "pagamentos": ExtractPagamentos,
}


def _list_shards(pages_path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(pages_path):
        for name in files:
            if name.endswith(".parquet"):
                out.append(os.path.join(root, name))
    return sorted(out)


def _shard_dir(out_dir: str, shard_path: str) -> str:
    stem = os.path.splitext(os.path.basename(shard_path))[0]
    return os.path.join(out_dir, f"shard={stem}")


@ray.remote(num_cpus=1)
def _extract_shard(shard_path: str, kind: str, year: int | None,
                   dest: str) -> int:
    """Process one input shard to one output partition, atomically
    (tmp file + rename + marker)."""
    import pyarrow.parquet as pq

    t = pq.read_table(shard_path, columns=["url", "html"])
    t = t.filter(pc.match_substring(t["url"], f"/{kind}/"))
    out = _EXTRACTORS[kind](year)(t) if t.num_rows else pa.table({})
    os.makedirs(dest, exist_ok=True)
    tmp = os.path.join(dest, "part-0.parquet.tmp")
    final = os.path.join(dest, "part-0.parquet")
    if out.num_rows:
        pq.write_table(out, tmp)
        os.replace(tmp, final)
    with open(os.path.join(dest, "_SUCCESS"), "w") as f:
        f.write(str(out.num_rows))
    return out.num_rows


def extract_records_resumable(
    pages_path: str, kind: str, out_dir: str, current_year: int | None = None
) -> dict:
    """Run (or resume) bulk extraction.  Returns
    ``{"shards_total", "shards_skipped", "shards_done", "rows"}``."""
    shards = _list_shards(pages_path)
    todo, skipped = [], 0
    for s in shards:
        dest = _shard_dir(out_dir, s)
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            skipped += 1
        else:
            todo.append((s, dest))
    refs = [
        _extract_shard.remote(s, kind, current_year, dest)
        for s, dest in todo
    ]
    rows = sum(ray.get(refs)) if refs else 0
    return {
        "shards_total": len(shards),
        "shards_skipped": skipped,
        "shards_done": len(todo),
        "rows": rows,
    }


def read_records(out_dir: str):
    """Read the resumable output back as a Dataset (only completed
    shards — partial shards have no final part file)."""
    import ray.data as rd

    parts = []
    for root, _dirs, files in os.walk(out_dir):
        if "_SUCCESS" in files and "part-0.parquet" in files:
            parts.append(os.path.join(root, "part-0.parquet"))
    return rd.read_parquet(sorted(parts)) if parts else rd.from_items([])
