#!/usr/bin/env python3
"""Simulate the driver's correctness gate.

Runs every ``queries()`` entry at the given sf and, where an ``oracle_sql()``
entry exists, runs the DuckDB oracle over the same parquet tables and compares
row count, schema (column names) and a value hash (columns sorted by name,
rows sorted by all columns, values stringified).

Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time


def normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: json.dumps(v, sort_keys=True, default=str))
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df) -> str:
    norm = normalize(df)
    payload = norm.to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def main() -> int:
    # usage: check_contract.py [sf_dir] [query_name ...] — names restrict
    # the run to those queries (fast single-query iteration)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="error", log_to_driver=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        queries = {k: v for k, v in queries.items() if k in only}
    report = {}
    fails = 0
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            report[name] = {"status": "ERROR", "error": repr(e)[:300]}
            fails += 1
            print(f"  {name}: ERROR {e!r}")
            continue
        dt = round(time.perf_counter() - t0, 2)
        entry = {"rows": len(ours), "cols": sorted(ours.columns), "sec": dt}
        if name in oracles:
            oracle = con.execute(oracles[name]).df()
            ok_rows = len(ours) == len(oracle)
            ok_cols = sorted(ours.columns) == sorted(oracle.columns)
            ok_hash = ok_rows and ok_cols and value_hash(ours) == value_hash(oracle)
            entry.update(
                oracle_rows=len(oracle),
                rows_match=ok_rows,
                schema_match=ok_cols,
                hash_match=ok_hash,
                status="OK" if ok_hash else "MISMATCH",
            )
            if not ok_hash:
                fails += 1
        else:
            entry["status"] = "rows-only" if len(ours) >= 0 else "EMPTY"
        report[name] = entry
        print(f"  {name}: {entry['status']} rows={entry['rows']} ({dt}s)")

    print(json.dumps(report, indent=1, default=str))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
