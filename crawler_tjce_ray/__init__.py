"""crawler_tjce_ray — a Ray-Data-native rebuild of the data-processing
capabilities of fernandozoomp/crawler-tjce.

The reference is a single-process Flask/requests crawler for the TJCE
(Ceará state court) Power BI "precatórios" panels.  This package
re-expresses every behaviour it has — the DSR wire-format decode, the
deterministic normalizer battery, the restart-token crawl-ordering
protocol, and the CSV/report sinks — as Ray Data pipelines:

* ``functions``  — pure, deterministic scalar/vectorized kernels
  (byte-identical to the reference semantics, quirks preserved).
* ``dsr``        — the Power BI DSR page decoder (dictionary + delta
  row encoding) and a seeded synthetic corpus generator.
* ``sources``    — Common-Crawl-style ``pages`` Parquet reader/writer.
* ``stages``     — map_batches stages: stateless extract, stateful
  fetch/politeness/URL-seen actor stages.
* ``state``      — cuckoo-filter URL-seen set, frontier table,
  checkpoint/resume.
* ``pipelines``  — end-to-end pipelines: flagship extract, the wave
  crawl loop, plus the relational / dedup / similarity / text-analysis
  operator suite exercised by the driver's DuckDB oracle.

Nothing in this package calls ``ray.init()``; sessions are owned by
the caller (bench.py, CLI scripts, test fixtures, or the driver).
"""

__version__ = "0.1.0"
