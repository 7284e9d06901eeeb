"""Driver emulation: run the FIRST 50 registry entries at sf0.01
through Ray AND DuckDB, compare rows/schema/strict value hash exactly
like the external driver (sorted columns, raw string equality)."""
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=int(sys.argv[1]) if len(sys.argv) > 1 else 16,
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = E.queries()
sql = E.oracle_sql()
window = list(qs)[:50]

results = {}
for name in window:
    t0 = time.time()
    try:
        mine = qs[name](SF_DIR)
        if hasattr(mine, "to_pandas"):
            mine = mine.to_pandas()
        if name not in sql:
            results[name] = {"err": "no_oracle", "rows": len(mine)}
            print(f"{name}: rows-only ({len(mine)} rows) [{time.time()-t0:.1f}s]")
            continue
        ref = con.execute(sql[name]).df()
        a = mine[sorted(mine.columns)].reset_index(drop=True)
        b = ref[sorted(ref.columns)].reset_index(drop=True)
        rows_match = len(a) == len(b)
        schema_match = list(a.columns) == list(b.columns)
        sa = a.astype(str).sort_values(list(a.columns), kind="mergesort").reset_index(drop=True)
        sb = b.astype(str).sort_values(list(b.columns), kind="mergesort").reset_index(drop=True)
        hash_match = bool(rows_match and schema_match and sa.equals(sb))
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "rows": len(a), "oracle_rows": len(b)}
        flag = "OK" if hash_match else "FAIL"
        print(f"{name}: {flag} ({len(a)} vs {len(b)} rows) [{time.time()-t0:.1f}s]")
        if not hash_match:
            if rows_match and schema_match:
                neq = (sa != sb).any(axis=0)
                print("  diverging cols:", list(sa.columns[neq]))
                for c in sa.columns[neq][:3]:
                    m = (sa[c] != sb[c])
                    print(f"  {c}: mine={sa[c][m].head(3).tolist()} oracle={sb[c][m].head(3).tolist()}")
            else:
                print("  cols:", list(a.columns), "vs", list(b.columns))
    except Exception as ex:
        results[name] = {"err": f"{type(ex).__name__}: {ex}"}
        print(f"{name}: ERROR {type(ex).__name__}: {ex}")

n_ok = sum(1 for r in results.values() if r.get("hash_match"))
n_ro = sum(1 for r in results.values() if r.get("err") == "no_oracle")
print(f"\n=== {n_ok}/50 strict green, {n_ro} rows-only, "
      f"{50 - n_ok - n_ro} failing ===")
with open("/tmp/window_sweep.json", "w") as f:
    json.dump(results, f, indent=1)
ray.shutdown()
