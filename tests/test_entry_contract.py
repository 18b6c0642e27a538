"""Driver-contract drift guard: __spark_entry__ stays well-formed.

The driver's correctness gate pairs every queries() entry with its
oracle_sql() string; a key added to one side but not the other ships
a silent rows-only downgrade. No Spark session needed — this is pure
surface checking, cheap enough to run on every pytest invocation.
"""

import importlib
import sys

sys.path.insert(0, "/root/repo")
entry_mod = importlib.import_module("__spark_entry__")


def test_queries_and_oracles_in_lockstep():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )
    assert len(q) >= 104


def test_shapes():
    q = entry_mod.queries()
    assert all(callable(v) for v in q.values())
    o = entry_mod.oracle_sql()
    assert all(isinstance(v, str) and v.strip() for v in o.values())
    assert callable(entry_mod.entry)


def test_oracle_sql_mentions_no_spark_only_syntax():
    """Oracles must be DuckDB-runnable ANSI SQL: cheap lint for the
    obvious Spark-isms that DuckDB rejects."""
    for name, sql in entry_mod.oracle_sql().items():
        low = sql.lower()
        for bad in ("lateral view", "array<", "posexplode", "xxhash64("):
            assert bad not in low, f"{name}: spark-only syntax {bad!r}"
