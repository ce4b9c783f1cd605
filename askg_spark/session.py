"""SparkSession factory with scale-oriented defaults.

All defaults here are chosen for the 100 TB / 1000-executor target and
merely *tested* on local[N]:

  * AQE on (runtime join-strategy switching, partition coalescing,
    skew-join splitting) — the reference hand-schedules everything
    single-threaded; we let the engine re-plan at runtime instead.
  * Arrow on for all pandas UDF / mapInPandas exchange.
  * shuffle partitions sized to cores locally; on a real cluster this is
    overridden by --conf (AQE coalesces down, so over-provisioning is
    cheap; under-provisioning is not).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.session.timeZone": "UTC",
    # deterministic float formatting in checksums
    "spark.sql.legacy.allowNegativeScaleOfDecimal": "true",
    "spark.ui.enabled": "false",
    # NB: honored only when the JVM is launched by this process (plain
    # `python` entrypoints); under spark-submit pass --driver-memory.
    # local[32] is one JVM doing all executor work — size accordingly.
    "spark.driver.memory": os.environ.get("ASKG_DRIVER_MEM", "48g"),
}


def get_spark(
    app_name: str = "askg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores); on a real cluster pass None and set master via spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("ASKG_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is None:
        # 4x the session's actual parallelism: the salted quadratic
        # joins hash (key, salt) combos into shuffle partitions —
        # over-provisioning smooths collision imbalance and AQE
        # coalesces the small ones back for free; under-provisioning
        # serializes the hot pair-generation tasks. Derive cores from
        # the local[N] master (not os.cpu_count) so a local[8] session
        # is not drowned in 16 task waves per stage.
        m = master or ""
        digits = "".join(c for c in m if c.isdigit())
        ncores = int(digits) if digits else (os.cpu_count() or 8)
        shuffle_partitions = int(
            os.environ.get("ASKG_SHUFFLE_PARTITIONS", 4 * ncores))
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
