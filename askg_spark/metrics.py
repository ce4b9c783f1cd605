"""Per-partition lineage + throughput metrics (SURVEY §4.5).

Nothing built-in produces row-level lineage, so each materialized stage
emits (stage, partition_id, rows, run_id) rows computed with
spark_partition_id() — one narrow aggregation, no extra shuffle beyond
the count itself.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, functions as F


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def partition_lineage(df: DataFrame, stage: str, run_id: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("long"),
            F.col("rows").cast("long"),
            F.lit(run_id).alias("run_id"),
        )
    )


class StageTimer:
    """Wall-clock + row throughput per stage, printed and collected."""

    def __init__(self) -> None:
        self.records: list[dict] = []

    def time(self, stage: str, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        self.records.append({"stage": stage, "sec": round(dt, 3)})
        return out
