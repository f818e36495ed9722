"""Driver-style self-check: run every queries() entry at a given SF dir and
compare rows/schema/values against oracle_sql() via DuckDB, mimicking the
round harness (sort columns by name, sort rows, value-compare).

Usage: python tools/selfcheck.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)

    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    report, n_bad = {}, 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = _to_df(fn(sf_dir))
            entry = {"rows": int(len(got)), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                exp = con.execute(oracles[name]).df()
                g, e = _canon(got), _canon(exp)
                entry["rows_match"] = len(g) == len(e)
                entry["schema_match"] = list(g.columns) == list(e.columns)
                entry["values_match"] = bool(
                    entry["rows_match"] and entry["schema_match"] and g.equals(e)
                )
                if not entry["values_match"]:
                    n_bad += 1
                    if entry["rows_match"] and entry["schema_match"]:
                        diff_cols = [
                            c for c in g.columns if not g[c].equals(e[c])
                        ]
                        entry["diff_cols"] = diff_cols
            else:
                entry["oracle"] = None
        except Exception as exc:  # noqa: BLE001 - report, don't die
            entry = {"error": f"{type(exc).__name__}: {exc}"}
            n_bad += 1
        report[name] = entry
        status = entry.get("error") or (
            "ok" if entry.get("values_match", True) else "MISMATCH"
        )
        print(f"{name:28s} {status}", flush=True)

    print(json.dumps(report, indent=1, sort_keys=True))
    print(f"\n{n_bad} problem(s) across {len(report)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
