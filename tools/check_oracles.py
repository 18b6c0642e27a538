"""Simulate the driver's correctness gate locally: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from dexspark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Uniformly sortable + cross-engine-comparable value encoding."""
    if v is None:
        return ("n", "")
    if isinstance(v, Decimal):
        # exact: normalized fixed-point string, so decimal aggregates
        # keep their designed exactness (scale differences like 5.00 vs
        # 5.0000 canonicalize equal; sub-float64 differences DON'T)
        return ("d", format(v.normalize(), "f"))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("num", round(v, 9))
    if isinstance(v, int):
        return ("num", float(v)) if abs(v) < 2**52 else ("i", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, str):
        return ("s", v)
    return ("o", str(v))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spark_rows = sdf.collect()
        spark_cols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_rows)} rows)")
            continue
        duck = con.sql(oracles[name])
        duck_cols = [c for c in duck.columns]
        duck_rows = duck.fetchall()
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)] if ok_cols else []
        s_vals = sorted(tuple(canon(r[i]) for i in s_idx) for r in spark_rows)
        d_vals = (
            sorted(tuple(canon(r[i]) for i in d_idx) for r in duck_rows)
            if ok_cols
            else []
        )
        ok = ok_cols and len(spark_rows) == len(duck_rows) and s_vals == d_vals
        status = "OK " if ok else "FAIL"
        print(
            f"{name}: {status} spark={len(spark_rows)} duck={len(duck_rows)} "
            f"cols_match={ok_cols}"
        )
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"  spark cols: {spark_cols}\n  duck cols:  {duck_cols}")
            else:
                for s, d in zip(s_vals, d_vals):
                    if s != d:
                        print(f"  first diff:\n   spark: {s}\n   duck:  {d}")
                        break
                if len(s_vals) != len(d_vals):
                    sset, dset = set(s_vals), set(d_vals)
                    print(f"   only-spark: {list(sset - dset)[:2]}")
                    print(f"   only-duck:  {list(dset - sset)[:2]}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
