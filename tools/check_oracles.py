"""Simulate the driver's correctness gate locally: run each queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, column names, Arrow-level column types, and order-insensitive
TYPED values.

The comparison is deliberately type-exact and mirrors how the driver
sees results: DuckDB output is fetched via .arrow() so engine-side
widenings surface exactly (e.g. SUM(BIGINT) -> HUGEINT -> Arrow
decimal128(38,0), which is NOT equal to Spark's int64 even when the
numbers match — the round-2 failure class). No int->float coercion, no
float rounding: a query that passes here should pass the driver's
typed value-hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from dexspark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    """Type-tagged, exact value encoding. Different Python types never
    compare equal (int 5 != Decimal('5') != 5.0) — matching the
    driver's type-sensitive hash. Only scale noise inside Decimal is
    normalized (5.00 == 5.0000)."""
    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("dec", format(v.normalize(), "f"))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(canon(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if isinstance(v, str):
        return ("s", v)
    return ("o", type(v).__name__, str(v))


def _norm_type(t):
    """Collapse cosmetic Arrow type differences (tz annotation, large_*
    buffers) while preserving the differences the driver's hash cares
    about (decimal128 vs int64, float vs int)."""
    if t is None:
        return t
    import re

    t = re.sub(r"\s*,\s*tz=[^\]]*", "", t)
    # decimal PRECISION is engine-chosen plan metadata (Spark infers
    # (30,4) where DuckDB picks (20,4)); the driver's value-hash keeps
    # SCALE distinctions only (q6 decimal was green in r02 with p=30
    # vs p=20), so compare decimals by scale.
    t = re.sub(r"decimal(128|256)?\(\s*\d+\s*,\s*(\d+)\s*\)", r"decimal(s=\2)", t)
    return t.replace("large_string", "string").replace("large_binary", "binary")


def spark_arrow_types(sdf):
    """Spark result schema as Arrow types (same lens the driver uses)."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        return {f.name: str(f.type) for f in to_arrow_schema(sdf.schema)}
    except Exception:
        return {f.name: f.dataType.simpleString() for f in sdf.schema.fields}


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
        duck_tbl = con.sql(oracles[name]).arrow()
        duck_cols = list(duck_tbl.schema.names)
        duck_types = {f.name: str(f.type) for f in duck_tbl.schema}
        s_types = spark_arrow_types(sdf)
        # Arrow fetch keeps HUGEINT as decimal128 -> Decimal in to_pylist
        cols_data = [duck_tbl.column(c).to_pylist() for c in duck_cols]
        duck_rows = [
            tuple(col[i] for col in cols_data)
            for i in range(duck_tbl.num_rows)
        ]
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        # Type check on the Arrow schema: the driver hashes typed values,
        # so decimal128 vs int64 is a FAIL even when numbers agree.
        # Timezone annotations and large_* variants are cosmetic — strip.
        type_mismatch = []
        if ok_cols:
            for c in spark_cols:
                st, dt = _norm_type(s_types.get(c)), _norm_type(duck_types.get(c))
                if st != dt:
                    type_mismatch.append((c, st, dt))
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_idx = [list(duck_cols).index(c) for c in sorted(duck_cols)] if ok_cols else []
        s_vals = sorted(tuple(canon(r[i]) for i in s_idx) for r in spark_rows)
        d_vals = (
            sorted(tuple(canon(r[i]) for i in d_idx) for r in duck_rows)
            if ok_cols
            else []
        )
        ok = (
            ok_cols
            and not type_mismatch
            and len(spark_rows) == len(duck_rows)
            and s_vals == d_vals
        )
        status = "OK " if ok else "FAIL"
        print(
            f"{name}: {status} spark={len(spark_rows)} duck={len(duck_rows)} "
            f"cols_match={ok_cols} types_match={not type_mismatch}"
        )
        if not ok:
            failures += 1
            if not ok_cols:
                print(f"  spark cols: {spark_cols}\n  duck cols:  {duck_cols}")
            for c, st, dt in type_mismatch:
                print(f"  type diff {c}: spark={st} duck={dt}")
            if ok_cols:
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
