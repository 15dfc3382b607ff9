"""SparkSession factory with scale-aware defaults.

All engine code is session-agnostic; this helper is used by tests/bench and
``__spark_entry__``. AQE + Arrow are on by default: AQE handles skew-join
splitting and runtime coalescing (SURVEY.md §4), Arrow batches feed the
vectorized pandas UDFs (the engine's "codegen story").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import ScaleConfig


def get_spark(app_name: str = "arekit-r335-spark",
              master: str | None = None,
              scale: ScaleConfig | None = None) -> SparkSession:
    scale = scale or ScaleConfig()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[*]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(scale.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(scale.max_records_per_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in scale.extra_conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
