#!/usr/bin/env python
"""Driver-mimic: run the FIRST 50 catalog entries (the driver's sample)
at a given sf_dir and compare each against its DuckDB oracle with the
driver's protocol — row count, sorted-column-name schema, and an
order-insensitive value hash over columns sorted by name.

Usage: python tools/driver_mimic.py [sf_dir] [--limit N] [--only a,b,c]
Prints one status line per entry and a summary; exit 1 on any failure.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _value_hash(df) -> str:
    import pandas as pd

    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str).tolist()
        elif str(s.dtype).startswith("float"):
            vals = [f"{v:.10g}" if pd.notna(v) else "nan" for v in s]
        else:
            vals = s.astype(str).tolist()
        h.update(col.encode())
        for v in vals:
            h.update(str(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    limit = 50
    only = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sql = entrymod.oracle_sql()
    names = only if only else list(qs)[:limit]

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    n_fail = 0
    for name in names:
        t0 = time.monotonic()
        try:
            ray_df = _to_pandas(qs[name](sf_dir))
            if name not in sql:
                results[name] = {"err": "no_oracle", "rows": len(ray_df)}
                print(f"  {name:<32} NO_ORACLE rows={len(ray_df)}")
                continue
            sql_df = con.execute(sql[name]).df()
            rows_ok = len(ray_df) == len(sql_df)
            schema_ok = sorted(map(str, ray_df.columns)) == sorted(map(str, sql_df.columns))
            hash_ok = schema_ok and rows_ok and _value_hash(ray_df) == _value_hash(sql_df)
            ok = rows_ok and schema_ok and hash_ok
            n_fail += 0 if ok else 1
            results[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                             "hash_match": hash_ok, "rows": len(ray_df),
                             "oracle_rows": len(sql_df)}
            dt = time.monotonic() - t0
            print(f"  {name:<32} {'OK' if ok else 'FAIL'}"
                  f" rows={len(ray_df)}/{len(sql_df)}"
                  f" schema={schema_ok} hash={hash_ok} ({dt:.1f}s)")
        except Exception as e:
            n_fail += 1
            results[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"  {name:<32} ERROR {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()

    print(json.dumps({"checked": len(names), "failures": n_fail, "sf_dir": sf_dir}))
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
