"""Change-log source adapters.

≙ the reference's event ingestion boundary: Event Hub JSON messages
parsed with minimal schema-on-read — "there are more fields in the
message, but these are the only ones we care about"
(AzureBlobCreateEventMesage.kt:3, EventSchema.kt:4-10) — and the blob
file trigger (RouteIngestedFile.cs:23-26). Here the change log is a
directory of ordered segments in parquet (compact, splittable — the
default) or JSON lines (interop with binlog/WAL shippers that emit
JSON, e.g. Debezium-style feeds).

Schema-on-read: only the declared columns are projected out of JSON
events; extra fields in the payload are ignored, missing ones surface
as NULLs for the validation stage to quarantine — exactly the
reference's tolerant parse. Both readers serve batch and Structured
Streaming; the streaming variant discovers new segment files per
micro-batch in order (the "tail").

Scale notes: JSON is the slow path (row parse, not columnar) — at
10^10 events land segments as parquet; the JSON reader exists for
interop and is per-file parallel like any file source. Explicit
schemas everywhere: schema inference would scan the data twice and
can drift between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType, _parse_datatype_string

PAYLOAD_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
LOG_DDL = "lsn long, op string, batch_seq long, " + PAYLOAD_DDL
LOG_FIELDS = [f.strip().split(" ")[0] for f in LOG_DDL.split(",")]


def log_schema(extra_ddl: str | None = None) -> StructType:
    """Change-event schema; ``extra_ddl`` appends evolved payload
    columns (e.g. ``"model string"``) for schema-evolving logs."""
    ddl = LOG_DDL if not extra_ddl else f"{LOG_DDL}, {extra_ddl}"
    return _parse_datatype_string(ddl)


def _reader(spark: SparkSession, fmt: str, schema: StructType, streaming: bool):
    r = (spark.readStream if streaming else spark.read).schema(schema)
    if fmt == "parquet":
        return r.format("parquet")
    if fmt == "json":
        # tolerant parse: unknown fields ignored by the explicit
        # schema; corrupt lines become all-NULL rows that the
        # validation stage rejects with a reason, instead of killing
        # the job (≙ the reference's routed parse errors,
        # FnRouter.kt:98-104)
        return r.format("json").option("mode", "PERMISSIVE")
    raise ValueError(f"unsupported change-log format: {fmt!r}")


def read_log(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    return _reader(spark, fmt, schema or log_schema(), False).load(path)


def read_log_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    r = _reader(spark, fmt, schema or log_schema(), True)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.load(path)
