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


def _physical_cores() -> int | None:
    """Distinct physical cores from sysfs topology (None if unknown)."""
    try:
        base = "/sys/devices/system/cpu"
        cores: set[tuple[str, str]] = set()
        for d in os.listdir(base):
            if not (d.startswith("cpu") and d[3:].isdigit()):
                continue
            cid = os.path.join(base, d, "topology", "core_id")
            pkg = os.path.join(base, d, "topology", "physical_package_id")
            if os.path.exists(cid):
                with open(cid) as fh:
                    core = fh.read().strip()
                pkgid = "0"
                if os.path.exists(pkg):
                    with open(pkg) as fh:
                        pkgid = fh.read().strip()
                cores.add((pkgid, core))
        return len(cores) or None
    except OSError:
        return None


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

    # SMT awareness: when local[N] oversubscribes the physical cores
    # (N threads > cores, e.g. 32 hardware threads on 16 cores), cap
    # concurrency at one task per PHYSICAL core via spark.task.cpus —
    # whole-stage-codegen'd stages are CPU-bound and two sibling
    # hyperthreads fight for the same execution units (measured here:
    # 16M-event replay 57.4s -> 39.3s at local[32]). Virtualized
    # guests often present hyperthreads as distinct cores, hiding the
    # topology from sysfs — bench.py therefore ALSO runs an empirical
    # concurrency probe and passes the result via DEXSPARK_TASK_CPUS /
    # extra_conf. Real clusters size executors to physical cores and
    # are unaffected (task_cpus stays 1).
    task_cpus = os.environ.get("DEXSPARK_TASK_CPUS")
    if task_cpus is None:
        n_str = master[master.find("[") + 1 : master.find("]")] if "[" in master else "0"
        n_threads = os.cpu_count() or 0 if n_str == "*" else int(n_str or 0)
        phys = _physical_cores()
        task_cpus = str(max(1, n_threads // phys)) if phys and n_threads > phys else "1"

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
        # INT96 (the legacy default) carries no parquet min/max stats,
        # which would blind the manifest-level data skipping
        # (lake/stats.py) for timestamp columns; micros is also the
        # modern interoperable representation
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.task.cpus", task_cpus)
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
