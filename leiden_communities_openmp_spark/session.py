"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (local[N], single JVM) but every setting is the one
we'd ship on a 1000-executor cluster: AQE on (runtime re-planning +
skew-join splitting for hub vertices), Arrow for every pandas-UDF exchange,
shuffle partitions sized to cores (cluster: to total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """min(48g, ~70% of MemAvailable): big hosts get the heap the cached
    edge partitions + shuffle buffers need in local mode; small hosts still
    get a JVM that can start (a fixed 48g default OOM-kills containers)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(min(48, int(avail_gb * 0.7)), 1)}g"
    except OSError:
        pass
    return "8g"


def _apply_engine_confs(builder, shuffle_partitions: int):
    """The engine's scale configs, shared by the local factory and the
    spark-submit entry (main.py): AQE + skew-join, Arrow batching tuned for
    the mapInPandas feeds, explicit broadcast budget."""
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4.1's Arrow batch writer enforces maxBytesPerBatch by
        # calling ArrowWriter.sizeInBytes() PER ROW (a full buffer-size
        # walk: BatchedPythonArrowInput.underBatchSizeLimit) — ~8.5 µs/row
        # of pure overhead that serialises every mapInPandas feed at
        # ~3.5M rows/s regardless of cores. Int.MaxValue is special-cased
        # to skip the walk; batch size is then bounded by records only
        # (65536 rows ≈ 1-2 MB for edge tuples, ≈ 64 MB for ~1 KB html
        # rows — still executor-safe).
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "2147483647")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )


def get_spark(app_name: str = "leiden-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = _apply_engine_confs(
        SparkSession.builder.master(f"local[{cpus}]").appName(app_name),
        shuffle_partitions,
    )
    builder = (
        builder
        # local mode: driver heap IS the executor heap — size it for the
        # cached edge partitions + shuffle buffers, not the 1g default;
        # capped to available memory (SPARK_GRAFT_DRIVER_MEM overrides)
        .config("spark.driver.memory", _default_driver_mem())
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def get_spark_submit(app_name: str = "leiden-spark",
                     shuffle_partitions: int | None = None) -> SparkSession:
    """Session for ``spark-submit`` runs (main.py): NO master / memory
    overrides — cluster size, executor memory, and deploy mode belong to
    the submit command line. Only the engine's plan-level configs are
    applied; shuffle partitions default to the cluster's default
    parallelism (total executor cores) rather than a local guess."""
    builder = SparkSession.builder.appName(app_name)
    if shuffle_partitions is not None:
        builder = _apply_engine_confs(builder, shuffle_partitions)
        return builder.getOrCreate()
    spark = _apply_engine_confs(builder, 8).getOrCreate()
    par = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(par, 8)))
    return spark
