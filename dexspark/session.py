"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for the sandbox (local[N], single JVM) but every knob
is the one you would also set on a 1000-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, dynamic coalesce)
- Arrow execution on (vectorized pandas UDF transfer)
- shuffle partitions sized to cores locally; on a real cluster this
  should be ~2-3x total executor cores (AQE coalesces the excess)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dexspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local[N] → N concurrent tasks; shuffle partitions = N keeps every
    # stage fully parallel without tiny-partition overhead at test scale.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else int(n)

    # Python workers must import dexspark to unpickle library closures
    # (mapInPandas fns etc.). Put the package's parent dir on the
    # workers' PYTHONPATH so driving the library from any cwd works —
    # the local-mode analogue of shipping the package via
    # ``spark-submit --py-files dexspark.zip`` on a real cluster.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wpp = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in wpp.split(os.pathsep):
        wpp = f"{pkg_parent}{os.pathsep}{wpp}" if wpp else pkg_parent

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.executorEnv.PYTHONPATH", wpp)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("DEXSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
