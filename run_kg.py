"""spark-submit entrypoint for the KG construction pipeline (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage (cluster):
    zip -r arekit_r335_spark.zip arekit_r335_spark
    spark-submit --py-files arekit_r335_spark.zip run_kg.py \
        --input-dir  s3://.../kg_inputs \
        --sink-dir   s3://.../kg_graph \
        --num-buckets 4096 [--max-buckets N] [--no-finalize]

Usage (sandbox):
    python run_kg.py --input-dir data/sf0.001 --sink-dir /tmp/kg_out \
        --num-buckets 8

Session conf (master, executors, shuffle partitions, AQE) comes from
spark-submit / spark-defaults; this script only sets what the engine
requires (Arrow). Resume: re-running with the same --sink-dir skips buckets
whose lineage row exists; interrupt at any point loses at most the
in-flight bucket (its partitions are dynamic-overwritten on retry).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", required=True,
                    help="fixture/input dir (KgInputs layout)")
    ap.add_argument("--sink-dir", required=True, help="graph sink dir")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--max-buckets", type=int, default=None,
                    help="process at most N pending buckets (checkpointed)")
    ap.add_argument("--no-finalize", action="store_true",
                    help="skip the canonical-nodes finalize pass")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from arekit_r335_spark.lexicons import KgInputs
    from arekit_r335_spark.runner import finalize_nodes, run_incremental

    spark = (SparkSession.builder
             .appName("arekit-r335-kg")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    inputs = KgInputs.at(args.input_dir)
    metrics = run_incremental(spark, inputs, args.sink_dir,
                              num_buckets=args.num_buckets,
                              max_buckets=args.max_buckets)
    out = {"buckets_processed": len(metrics), "metrics": metrics}
    if not args.no_finalize:
        out["n_canonical_nodes"] = finalize_nodes(spark, inputs,
                                                  args.sink_dir)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
