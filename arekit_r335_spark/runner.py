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

import logging
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
    def nodes_partial(self) -> str:
        return os.path.join(self.base_dir, "nodes_partial")

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
    # n_turns rides as an Observation on the scan (no dedicated count job:
    # the value is captured by whichever action first materializes the parse
    # — the eager checkpoint, or the edges write when checkpointing is off)
    tobs = Observation(f"turns_b{bucket}")
    transcripts = (spark.read.parquet(inputs.transcripts)
                   .filter(bucket_of(F.col("conv_id"), num_buckets)
                           == bucket)
                   .observe(tobs, F.count(F.lit(1)).alias("n_turns")))
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

    # per-bucket node partials: group-level rollup of this bucket's mentions
    # (the cross-bucket canonical merge happens once in finalize_nodes —
    # partials keep the per-bucket unit idempotent and restart-safe)
    nobs = Observation(f"nodes_b{bucket}")
    # n_mentions rides on the partial write's scan of the mention table —
    # together with n_turns above this removes the round-2 runner's two
    # dedicated per-bucket count() jobs (one job per write, as S12 intends)
    mobs = Observation(f"mentions_b{bucket}")
    partial = (res.mentions
               .observe(mobs, F.count(F.lit(1)).alias("n_mentions"))
               .groupBy("group_key")
               .agg(F.min("value").alias("canon_value"),
                    F.count("*").cast("long").alias("n_mentions"))
               .withColumn("bucket", F.lit(bucket))
               .observe(nobs, F.count(F.lit(1)).alias("n_groups")))
    (partial.write.mode("overwrite").partitionBy("bucket")
     .parquet(sink.nodes_partial))

    n_mentions = int(mobs.get["n_mentions"])
    n_turns = int(tobs.get["n_turns"])

    metrics = {
        "bucket": bucket,
        "status": "done",
        "n_turns": int(n_turns),
        "n_mentions": int(n_mentions),
        "n_triples": int(obs.get["n_triples"]),
        "n_convs": int(obs.get["n_convs"]),
        "n_groups": int(nobs.get["n_groups"]),
        "wall_sec": float(round(time.time() - t0, 3)),
    }
    # lineage append LAST — commit point of the bucket
    (spark.createDataFrame(
        [metrics],
        "bucket int, status string, n_turns long, n_mentions long, "
        "n_triples long, n_convs long, n_groups long, wall_sec double")
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


def finalize_nodes(spark: SparkSession, inputs: KgInputs,
                   sink_dir: str) -> int:
    """Cross-bucket canonical node table (S12): merge the per-bucket group
    partials, run connected components over the alias evidence (J7b), and
    OVERWRITE ``nodes`` with one row per canonical entity:

        (canon_id, group_keys, canon_value, n_mentions)

    Idempotent — safe to re-run after any number of incremental buckets.
    """
    from .lexicons import load_synonym_seed
    from .operators.canonical import connected_components, group_alias_edges
    from .operators.grouping import seed_groups_df

    sink = GraphSink(sink_dir)
    partials = spark.read.parquet(sink.nodes_partial)
    groups = (partials.groupBy("group_key")
              .agg(F.min("canon_value").alias("canon_value"),
                   F.sum("n_mentions").cast("long").alias("n_mentions")))

    seed_df = seed_groups_df(spark, load_synonym_seed(inputs.synonyms))
    # Existence must be checked through Spark, not os.path: the aliases path
    # may be remote (s3://, hdfs://) where os.path.exists is always False —
    # which would silently run CC with zero edges and leave the node table
    # unmerged on cluster runs (ADVICE r1).
    aliases = None
    if inputs.aliases:
        try:
            aliases = spark.read.parquet(inputs.aliases)
        except Exception as e:  # AnalysisException: PATH_NOT_FOUND
            logging.getLogger(__name__).warning(
                "no alias evidence at %s (%s): canonicalization runs on "
                "seed-group identity only", inputs.aliases,
                type(e).__name__)
    comps = connected_components(
        group_alias_edges(groups.select(F.col("group_key"),
                                        F.col("canon_value").alias("value")),
                          aliases, seed_df))
    nodes = (groups
             .join(comps.withColumnRenamed("node", "group_key"),
                   "group_key", "left")
             .withColumn("canon_id",
                         F.coalesce(F.col("component"), F.col("group_key")))
             .groupBy("canon_id")
             .agg(F.array_sort(F.collect_set("group_key")).alias("group_keys"),
                  F.min("canon_value").alias("canon_value"),
                  F.sum("n_mentions").cast("long").alias("n_mentions")))
    nodes.write.mode("overwrite").parquet(sink.nodes)
    return spark.read.parquet(sink.nodes).count()


def read_edges(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(GraphSink(sink_dir).edges)


def read_nodes(spark: SparkSession, sink_dir: str) -> DataFrame:
    return spark.read.parquet(GraphSink(sink_dir).nodes)
