"""Streaming EP1 kill -9 / resume evidence at sf1x8 (VERDICT r4 item 8).

Protocol (same discipline as the batch crash-resume evidence in
BASELINE.md):

1. stage the sf1x8 transcripts as 16 conversation-complete parquet files
   (hash-repartitioned on conv_id — the stream's per-conv semantics
   contract), maxFilesPerTrigger=4 -> 4 micro-batches;
2. phase A: ``stream_triples_to_sink`` in a pinned local[8] subprocess,
   SIGKILL mid-stream (after ``--kill-after`` seconds);
3. phase B: the same command resumes from the checkpoint — committed
   batches are skipped, the in-flight batch replays with the same
   batch_id and dynamically overwrites its own partition (the
   idempotent-write contract in streaming/stream.py);
4. verify: streamed triples == batch-pipeline triples on the same input,
   as SETS and as MULTISETS (exact duplicate-free row equality via
   groupBy-count antijoin both ways), plus batch/partition counts.

Writes BENCH_STREAM_RESUME.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORES = 8
SF = "sf1x8"
N_FILES = 16

STAGE = "/tmp/stream_resume_in"
OUT = "/tmp/stream_resume_out"
CK = "/tmp/stream_resume_ck"


def _spark(app: str):
    os.sched_setaffinity(0, set(range(CORES)))
    from arekit_r335_spark.config import ScaleConfig
    from arekit_r335_spark.session import get_spark
    s = get_spark(app_name=app, master=f"local[{CORES}]",
                  scale=ScaleConfig(shuffle_partitions=2 * CORES))
    s.sparkContext.setLogLevel("ERROR")
    return s


def child_stage() -> None:
    from pyspark.sql import functions as F
    from arekit_r335_spark.datagen import repo_data_dir
    data_dir = repo_data_dir(SF)
    spark = _spark("stage-stream-input")
    (spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
     .repartition(N_FILES, F.col("conv_id"))
     .write.mode("overwrite").parquet(STAGE))
    spark.stop()


def child_stream() -> None:
    from arekit_r335_spark.datagen import repo_data_dir
    from arekit_r335_spark.lexicons import KgInputs
    from arekit_r335_spark.streaming.stream import stream_triples_to_sink
    data_dir = repo_data_dir(SF)
    spark = _spark("stream-resume")
    q = stream_triples_to_sink(spark, KgInputs.at(data_dir), STAGE, OUT, CK)
    q.awaitTermination()
    spark.stop()


def child_verify(out_json: str) -> None:
    from arekit_r335_spark.config import PipelineConfig
    from arekit_r335_spark.datagen import repo_data_dir
    from arekit_r335_spark.lexicons import KgInputs
    from arekit_r335_spark.pipeline import build_triple_pipeline
    data_dir = repo_data_dir(SF)
    spark = _spark("stream-resume-verify")
    cols = ["conv_id", "turn_idx", "s_ent_id", "t_ent_id", "label"]

    streamed = spark.read.parquet(OUT)
    batches = sorted(r["batch_id"] for r in
                     streamed.select("batch_id").distinct().collect())
    s = streamed.select(*cols).groupBy(*cols).count()
    b = (build_triple_pipeline(spark, KgInputs.at(data_dir),
                               PipelineConfig(), persist=False)
         .triples.select(*cols).groupBy(*cols).count())
    extra = s.join(b, cols + ["count"], "left_anti").count()
    missing = b.join(s, cols + ["count"], "left_anti").count()
    with open(out_json, "w") as f:
        json.dump({"streamed_rows": streamed.count(),
                   "batch_ids": batches,
                   "multiset_extra": extra,
                   "multiset_missing": missing}, f)
    spark.stop()


def main() -> int:
    if "--child" in sys.argv:
        which = sys.argv[sys.argv.index("--child") + 1]
        if which == "stage":
            child_stage()
        elif which == "stream":
            child_stream()
        else:
            child_verify(sys.argv[sys.argv.index("--child") + 2])
        return 0

    kill_after = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
    me = os.path.abspath(__file__)
    for d in (STAGE, OUT, CK):
        shutil.rmtree(d, ignore_errors=True)

    subprocess.run([sys.executable, me, "--child", "stage"], check=True)

    # phase A: stream, SIGKILL mid-run
    t0 = time.time()
    p = subprocess.Popen([sys.executable, me, "--child", "stream"])
    time.sleep(kill_after)
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    committed_after_kill = sorted(
        int(d.split("=")[1]) for d in os.listdir(OUT)
        if d.startswith("batch_id=")) if os.path.isdir(OUT) else []

    # phase B: same command, resumes from checkpoint
    t1 = time.time()
    subprocess.run([sys.executable, me, "--child", "stream"], check=True)
    resume_s = round(time.time() - t1, 1)

    subprocess.run([sys.executable, me, "--child", "verify",
                    "/tmp/stream_resume_verify.json"], check=True)
    with open("/tmp/stream_resume_verify.json") as f:
        v = json.load(f)

    result = {"sf": SF, "master": f"local[{CORES}] (pinned)",
              "n_input_files": N_FILES, "kill_after_s": kill_after,
              "partitions_on_disk_after_kill": committed_after_kill,
              "resume_wall_s": resume_s,
              "total_wall_s": round(time.time() - t0, 1), **v,
              "exactly_once": v["multiset_extra"] == 0
              and v["multiset_missing"] == 0}
    with open(os.path.join(REPO, "BENCH_STREAM_RESUME.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
