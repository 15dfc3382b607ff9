"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9 extension; the streaming form of
the batch ``events_sessionize`` query).

Semantics match the batch lag-window formulation exactly for CLOSED
sessions: a session closes when a later event of the same user arrives more
than ``gap_sec`` after the previous one; the closing batch emits
``(user_id, session_seq, n_events, first_event, duration_sec)`` with the
same values the batch query produces. The user's trailing session stays in
state (a stream cannot know it ended — flush policy is a deployment choice:
event-time timeout or end-of-stream drain).

State per user: (session_seq, last_es, start_es, n_events, first_event) —
a few longs; the state store is keyed by user_id, so cardinality = active
users, not events.
"""

from __future__ import annotations

from pyspark.sql.types import LongType, StructField, StructType

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("first_event", LongType()),
    StructField("duration_sec", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("session_seq", LongType()),
    StructField("last_es", LongType()),
    StructField("start_es", LongType()),
    StructField("n_events", LongType()),
    StructField("first_event", LongType()),
])


def make_sessionizer(gap_sec: int = 1800):
    """Returns the applyInPandasWithState function. Events inside one batch
    are sorted by (ts, event_id) per user — the same total order the batch
    window uses; state carries the open session across batches."""
    import pandas as pd

    def fn(key, pdfs, state):
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        es_arr = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
        ev_arr = rows["event_id"].astype("int64").tolist()
        if state.exists:
            seq, last_es, start_es, n, first_ev = state.get
        else:
            seq, last_es, start_es, n, first_ev = 0, None, None, 0, None
        out = []
        user = int(key[0])
        for es, ev in zip(es_arr, ev_arr):
            if last_es is None or es - last_es > gap_sec:
                if n > 0:
                    out.append((user, seq, n, first_ev, last_es - start_es))
                seq += 1
                start_es = es
                n = 0
                first_ev = ev
            n += 1
            first_ev = min(first_ev, ev)
            last_es = es
        state.update((seq, last_es, start_es, n, first_ev))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_seq", "n_events",
                              "first_event", "duration_sec"])

    return fn


def sessionize_stream(spark, stream_dir: str, out_dir: str,
                      checkpoint_dir: str, gap_sec: int = 1800,
                      schema: str | None = None):
    """readStream(events) -> stateful sessionization -> parquet sink."""
    schema = schema or ("event_id long, user_id long, ts timestamp, "
                        "value double")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    sessions = (stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer(gap_sec), SESSION_SCHEMA, STATE_SCHEMA,
        outputMode="append", timeoutConf="NoTimeout"))
    return (sessions.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .format("parquet").option("path", out_dir)
            .start())
