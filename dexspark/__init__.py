"""dexspark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Reimagines the ingest→validate→route pipeline of
CDCgov ``data-exchange-routing`` (reference: blob-created event stream →
router → validate → routed copy, see SURVEY.md §2) as a Spark-first
change-event replay system:

    ordered change log (lsn, op, key..., payload...)
      → micro-batch (foreachBatch)
      → vectorized validation + quarantine channel
      → max-LSN-per-key dedup (salted two-phase aggregate)
      → copy-on-write MERGE into a bucketed snapshot table (dexspark.lake)
      → lineage + metrics committed atomically with the data

Everything is DataFrame / built-in-function based; Python row loops and
per-row UDFs are never on the hot path (Arrow pandas UDFs only where
vectorized semantics require them).
"""

__version__ = "0.1.0"

from dexspark.session import get_spark  # noqa: F401
