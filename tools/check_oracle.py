"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet, and compares
row count + column names + order-insensitive values (exact string match
after canonical float formatting, which is stricter than a hash with
tolerance).

Usage:  python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from akumuli_spark.session import get_spark  # noqa: E402
from akumuli_spark.sources.testdata import TABLES  # noqa: E402


def canon_rows(df) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        canon = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                canon.append("<null>")
            elif isinstance(v, float):
                canon.append(f"{v:.9g}")
            elif isinstance(v, (np.integer, int)):
                canon.append(str(int(v)))
            else:
                canon.append(str(v))
        rows.append(tuple(canon))
    return sorted(rows), cols


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if vanilla:
        # reproduce the driver's conditions: a SparkSession with none of
        # the engine confs (exercises the ensure_engine_confs guard)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "FAIL"
            print(f"{status}  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = canon_rows(sdf)
        d_rows, d_cols = canon_rows(ddf)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns spark={s_cols} duckdb={d_cols}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            example = next((a, b) for a, b in zip(s_rows, d_rows) if a != b)
            print(f"FAIL  {name}: {bad}/{len(s_rows)} row mismatches, e.g.\n"
                  f"      spark : {example[0]}\n      duckdb: {example[1]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
