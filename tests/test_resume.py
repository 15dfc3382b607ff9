"""Checkpoint/resume + lineage tests (runner.py): a restart mid-run loses no
completed conv_id bucket; re-running is idempotent; resumed output equals a
one-shot run."""

import os

from arekit_r335_spark.lexicons import KgInputs
from arekit_r335_spark.runner import (GraphSink, completed_buckets,
                                      read_edges, run_incremental)

NB = 4


def _edge_set(spark, sink_dir):
    return {tuple(r) for r in
            read_edges(spark, sink_dir)
            .select("conv_id", "s_ent_id", "t_ent_id", "label")
            .collect()}


def test_resume_equals_oneshot(spark, sf0001_dir, tmp_path):
    inputs = KgInputs.at(sf0001_dir)

    oneshot = str(tmp_path / "oneshot")
    run_incremental(spark, inputs, oneshot, num_buckets=NB)
    full = _edge_set(spark, oneshot)
    assert full

    resumed = str(tmp_path / "resumed")
    # simulate a crash after two buckets
    first = run_incremental(spark, inputs, resumed, num_buckets=NB,
                            max_buckets=2)
    assert len(first) == 2
    assert completed_buckets(spark, GraphSink(resumed)) == {0, 1}

    # restart: only the remaining buckets run
    second = run_incremental(spark, inputs, resumed, num_buckets=NB)
    assert sorted(m["bucket"] for m in second) == [2, 3]

    assert _edge_set(spark, resumed) == full


def test_rerun_is_noop(spark, sf0001_dir, tmp_path):
    inputs = KgInputs.at(sf0001_dir)
    sink = str(tmp_path / "sink")
    run_incremental(spark, inputs, sink, num_buckets=2)
    again = run_incremental(spark, inputs, sink, num_buckets=2)
    assert again == []


def test_lineage_metrics(spark, sf0001_dir, tmp_path):
    inputs = KgInputs.at(sf0001_dir)
    sink = str(tmp_path / "sink")
    metrics = run_incremental(spark, inputs, sink, num_buckets=2)
    assert all(m["status"] == "done" for m in metrics)
    assert sum(m["n_turns"] for m in metrics) > 0
    assert sum(m["n_triples"] for m in metrics) > 0
    lineage = spark.read.parquet(GraphSink(sink).lineage)
    assert lineage.count() == 2
    assert os.path.exists(GraphSink(sink).edges)
