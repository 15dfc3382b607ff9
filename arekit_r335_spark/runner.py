"""Checkpointed, resumable graph materialization (S12 + SURVEY.md §2.9).

The reference recomputes everything on restart (no resumability); the north
rule requires checkpoint/resume by conv_id range with per-partition lineage
and metrics. Realization:

* work unit = conv_id BUCKET: ``pmod(xxhash64(conv_id), num_buckets)`` —
  content-derived, partition-count-invariant, and identical to an Iceberg
  ``bucket(conv_id)`` layout at real scale (here plain parquet partitioned by
  the bucket column stands in for Iceberg, which isn't in the sandbox).
* per bucket: run the triple pipeline on that conv range, dynamic-partition-
  OVERWRITE the edges/nodes partitions (idempotent re-run), then append the
  lineage row LAST — a bucket is "done" only once its lineage row exists, so
  a crash between the data write and the lineage append simply re-runs the
  bucket and overwrites the same partition.
* metrics: row counts in/out per stage captured via ``Observation`` on the
  write action (no extra jobs) and stored next to lineage.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .config import PipelineConfig
from .lexicons import KgInputs
from .pipeline import build_triple_pipeline


@dataclass(frozen=True)
class GraphSink:
    base_dir: str

    @property
    def edges(self) -> str:
        return os.path.join(self.base_dir, "edges")

    @property
    def nodes(self) -> str:
        return os.path.join(self.base_dir, "nodes")

    @property
    def lineage(self) -> str:
        return os.path.join(self.base_dir, "lineage")


def bucket_of(col, num_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def completed_buckets(spark: SparkSession, sink: GraphSink) -> set[int]:
    if not os.path.exists(sink.lineage):
        return set()
    rows = (spark.read.parquet(sink.lineage)
            .filter(F.col("status") == "done")
            .select("bucket").distinct().collect())
    return {r.bucket for r in rows}


def run_bucket(spark: SparkSession, inputs: KgInputs, cfg: PipelineConfig,
               sink: GraphSink, bucket: int, num_buckets: int) -> dict:
    """Process one conv_id bucket end-to-end; idempotent."""
    t0 = time.time()
    transcripts = (spark.read.parquet(inputs.transcripts)
                   .filter(bucket_of(F.col("conv_id"), num_buckets)
                           == bucket))
    res = build_triple_pipeline(spark, inputs, cfg, transcripts=transcripts,
                                persist=True)

    obs = Observation(f"edges_b{bucket}")
    edges = (res.triples
             .withColumn("bucket", F.lit(bucket))
             .observe(obs, F.count(F.lit(1)).alias("n_triples"),
                      F.approx_count_distinct("conv_id").alias("n_convs")))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (edges.write.mode("overwrite").partitionBy("bucket")
     .parquet(sink.edges))

    n_mentions = res.mentions.count()
    n_turns = transcripts.count()
    res.mentions.unpersist()

    metrics = {
        "bucket": bucket,
        "status": "done",
        "n_turns": int(n_turns),
        "n_mentions": int(n_mentions),
        "n_triples": int(obs.get["n_triples"]),
        "n_convs": int(obs.get["n_convs"]),
        "wall_sec": float(round(time.time() - t0, 3)),
    }
    # lineage append LAST — commit point of the bucket
    (spark.createDataFrame(
        [metrics],
        "bucket int, status string, n_turns long, n_mentions long, "
        "n_triples long, n_convs long, wall_sec double")
     .coalesce(1).write.mode("append").parquet(sink.lineage))
    return metrics


def run_incremental(spark: SparkSession, inputs: KgInputs,
                    sink_dir: str, cfg: PipelineConfig | None = None,
                    num_buckets: int = 8,
                    max_buckets: int | None = None) -> list[dict]:
    """Resumable run: skips buckets whose lineage row exists."""
    cfg = cfg or PipelineConfig()
    sink = GraphSink(sink_dir)
    os.makedirs(sink.base_dir, exist_ok=True)
    done = completed_buckets(spark, sink)
    out: list[dict] = []
    todo = [b for b in range(num_buckets) if b not in done]
    if max_buckets is not None:
        todo = todo[:max_buckets]
    for b in todo:
        out.append(run_bucket(spark, inputs, cfg, sink, b, num_buckets))
    return out


def read_edges(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(GraphSink(sink_dir).edges)
