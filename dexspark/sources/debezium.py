"""Debezium-envelope change-log adapter.

≙ the reference's event ingestion boundary (EventSchema.kt:4-10,
AzureBlobCreateEventMesage.kt:3-12): a third-party wire format parsed
with minimal schema-on-read — "there are more fields in the message,
but these are the only ones we care about". The de-facto standard for
binlog/WAL shippers is the Debezium JSON envelope::

    {"payload": {"before": ..., "after": ..., "source": {"lsn": ...},
                 "op": "c|u|d|r", "ts_ms": ...}}

This module maps that envelope onto the engine's change-event schema
(sources/changelog.py LOG_DDL) entirely with JVM-side expressions
(``from_json``/``to_json`` + struct ops — no Python in the row path):

- ``op``: c (create) and r (snapshot read) → I; u → U; d → D. Any
  other op — Debezium's t (truncate) / m (message) — or an
  unparseable line yields a NULL-op row the validation stage
  quarantines with a reason, instead of killing the tail (≙ the
  reference's routed parse errors, FnRouter.kt:98-104).
- row payload: from ``after`` for I/U; for D the key columns are
  taken from ``before`` (Debezium's REPLICA IDENTITY DEFAULT delete
  events carry only the key) with ``after`` as fallback.
- ``lsn``: ``source.lsn`` — the producer's WAL position, the engine's
  total order.
- timestamps: Debezium's default temporal encoding is
  ``io.debezium.time.MicroTimestamp`` — epoch **microseconds** as
  int64 — restored to TimestampType via ``timestamp_micros``.

Scale notes: the envelope is JSON lines — per-file parallel, row
parse cost like any JSON source; at 10^10 events convert segments to
parquet once at the edge and keep the lake in columnar form. The
parse is a single ``from_json`` projection: no shuffle, no UDF, and
corrupt lines degrade to quarantined rows rather than task failures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, _parse_datatype_string

from dexspark.sources.changelog import PAYLOAD_DDL

# key columns every envelope must identify a row by (the MERGE key)
KEY_COLS = ("conv_id", "turn_idx")


def _payload_fields(extra_ddl: str | None) -> list[tuple[str, str]]:
    ddl = PAYLOAD_DDL if not extra_ddl else f"{PAYLOAD_DDL}, {extra_ddl}"
    out = []
    for part in ddl.split(","):
        name, typ = part.strip().split(" ", 1)
        out.append((name, typ.strip()))
    return out


def envelope_schema(extra_payload_ddl: str | None = None) -> StructType:
    """Schema for ``from_json`` over the envelope. ``ts`` rides as
    epoch-micros int64 (MicroTimestamp); everything else keeps its
    engine type. Unknown envelope fields are ignored by construction
    (explicit schema — the tolerant parse)."""
    fields = []
    for name, typ in _payload_fields(extra_payload_ddl):
        fields.append(f"{name}: {'long' if typ == 'timestamp' else typ}")
    image = ", ".join(fields)
    ddl = (
        f"payload struct<before: struct<{image}>, after: struct<{image}>, "
        "source: struct<lsn: long, ts_ms: long>, op: string, ts_ms: long>"
    )
    return _parse_datatype_string(ddl)


def to_debezium(log: DataFrame, extra_payload_ddl: str | None = None) -> DataFrame:
    """Engine events → one envelope JSON line per event (column
    ``value``). The synthesis half of the adapter: lets tests and the
    oracle ship a deterministic log through the real wire format.
    Delete envelopes carry a key-only ``before`` and no ``after``
    (REPLICA IDENTITY DEFAULT); I/U carry ``after`` only."""
    fields = _payload_fields(extra_payload_ddl)

    def image(cols: list[tuple[str, str]]) -> Column:
        parts = []
        for name, typ in cols:
            c = F.col(name)
            if typ == "timestamp":
                c = F.unix_micros(c)
            parts.append(c.alias(name))
        return F.struct(*parts)

    key_fields = [(n, t) for n, t in fields if n in KEY_COLS]
    is_del = F.col("op") == "D"
    envelope = F.struct(
        F.when(is_del, image(key_fields)).alias("before"),
        F.when(~is_del, image(fields)).alias("after"),
        F.struct(
            F.col("lsn").alias("lsn"),
            F.unix_millis(F.col("ts")).alias("ts_ms"),
        ).alias("source"),
        F.when(is_del, F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
    ).alias("payload")
    return log.select(F.to_json(F.struct(envelope)).alias("value"))


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    extra_payload_ddl: str | None = None,
) -> DataFrame:
    """Envelope JSON lines → engine change events (LOG_DDL minus
    ``batch_seq`` — segmenting into batches is the tail's concern, not
    the wire format's). Works on batch AND streaming DataFrames (pure
    projection). Corrupt lines → all-NULL rows for quarantine."""
    fields = _payload_fields(extra_payload_ddl)
    p = F.from_json(F.col(value_col), envelope_schema(extra_payload_ddl))
    p = p.getField("payload")
    op_raw = p.getField("op")
    op = (
        F.when(op_raw.isin("c", "r"), "I")
        .when(op_raw == "u", "U")
        .when(op_raw == "d", "D")
        .otherwise(F.lit(None).cast("string"))
    )
    after, before = p.getField("after"), p.getField("before")
    cols = [p.getField("source").getField("lsn").alias("lsn"), op.alias("op")]
    for name, typ in fields:
        a, b = after.getField(name), before.getField(name)
        c = F.coalesce(a, b) if name in KEY_COLS else F.when(op != "D", a)
        if typ == "timestamp":
            c = F.timestamp_micros(c)
        cols.append(c.cast(typ).alias(name))
    return df.select(*cols)


def read_debezium(
    spark: SparkSession,
    path: str,
    streaming: bool = False,
    extra_payload_ddl: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail a directory of envelope JSON-lines segments (batch or
    Structured-Streaming file source)."""
    r = (spark.readStream if streaming else spark.read).schema(
        _parse_datatype_string("value string")
    )
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = r.format("text").load(path)
    return parse_debezium(raw, extra_payload_ddl=extra_payload_ddl)
