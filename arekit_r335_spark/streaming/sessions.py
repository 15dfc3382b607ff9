"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.9 extension; the streaming form of
the batch ``events_sessionize`` query).

Semantics match the batch lag-window formulation exactly for CLOSED
sessions **under in-order cross-batch arrival** (each user's events reach
later micro-batches with event times >= their previous batch's maximum —
true for replayed/partition-ordered sources like Kafka-per-user-key or the
availableNow file replay the tests use): a session closes when a later
event of the same user arrives more than ``gap_sec`` after the previous
one; the closing batch emits ``(user_id, session_seq, n_events,
first_event, duration_sec)`` with the same values the batch query produces.
The user's trailing session stays in state (a stream cannot know it ended —
flush policy is a deployment choice: event-time timeout or end-of-stream
drain).

Cross-batch LATE data (an event older than the user's state high-water
mark) degrades predictably rather than corrupting state: the event merges
into the open session (never reopens a closed one) and the high-water mark
is clamped monotone (``last_es = max(last_es, es)``), so a late straggler
can neither move the gap reference backwards (spuriously splitting the next
in-order event into a new session) nor produce a negative duration.
Exact-late-data semantics would need event-time timeouts + a watermark
(hold each session open until ``watermark > last_es + gap``) — the
documented trade is bounded state and per-batch emission instead.

State per user: (session_seq, last_es, start_es, n_events, first_event) —
a few longs; the state store is keyed by user_id, so cardinality = active
users, not events.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, LongType, StructField, StructType

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
            # monotone high-water mark: a cross-batch late event (es <
            # last_es) merges into the open session but must not drag the
            # gap reference backwards or yield negative durations
            last_es = es if last_es is None else max(last_es, es)
        state.update((seq, last_es, start_es, n, first_ev))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_seq", "n_events",
                              "first_event", "duration_sec"])

    return fn


EVENT_STATE_SCHEMA = StructType([
    StructField("session_seq", LongType()),
    StructField("es_arr", ArrayType(LongType())),
    StructField("ev_arr", ArrayType(LongType())),
])


def make_sessionizer_event_time(gap_sec: int = 1800):
    """EXACT gap-sessionization under bounded disorder — the watermark-based
    upgrade of ``make_sessionizer``: a session is emitted only once the
    EVENT-TIME WATERMARK passes ``last_es + gap_sec``, at which point no
    admissible event (always > watermark; later rows are watermark-filtered)
    can merge into or split it — so out-of-order arrival within the
    watermark delay produces byte-identical sessions to the batch query,
    including the trailing session once the watermark passes it.

    State per user: the still-open tail of the event stream (events whose
    session is not yet watermark-closed) plus the emitted-session counter —
    bounded by gap+delay worth of events per user, not the stream. Timeout:
    ``EventTimeTimeout`` set at ``max(es)+gap``, so idle users flush through
    the state store without waiting for their next event."""
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            seq, es_pend, ev_pend = state.get
            es_pend, ev_pend = list(es_pend), list(ev_pend)
        else:
            seq, es_pend, ev_pend = 0, [], []
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            es_new = (rows["ts"].astype("int64") // 1_000_000_000).tolist()
            ev_new = rows["event_id"].astype("int64").tolist()
            pend = sorted(zip(es_pend, ev_pend)) + sorted(
                zip(es_new, ev_new))
            pend.sort()
        else:
            pend = sorted(zip(es_pend, ev_pend))
        wm = state.getCurrentWatermarkMs() // 1000

        out = []
        user = int(key[0])
        # split pending events into gap-delimited sessions, emit every
        # session the watermark has sealed (last_es + gap < wm)
        sessions: list[list[tuple[int, int]]] = []
        for e in pend:
            if sessions and e[0] - sessions[-1][-1][0] <= gap_sec:
                sessions[-1].append(e)
            else:
                sessions.append([e])
        remaining: list[tuple[int, int]] = []
        for sess in sessions:
            last_es = sess[-1][0]
            if last_es + gap_sec < wm and not remaining:
                seq += 1
                first_es = sess[0][0]
                out.append((user, seq, len(sess),
                            min(ev for _, ev in sess), last_es - first_es))
            else:
                remaining.extend(sess)
        if remaining:
            state.update((seq, [e for e, _ in remaining],
                          [v for _, v in remaining]))
            state.setTimeoutTimestamp((remaining[-1][0] + gap_sec) * 1000
                                      + 1000)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_seq", "n_events",
                              "first_event", "duration_sec"])

    return fn


def sessionize_stream_event_time(spark, stream_dir: str, out_dir: str,
                                 checkpoint_dir: str, gap_sec: int = 1800,
                                 watermark_delay: str = "1 hour",
                                 schema: str | None = None,
                                 max_files_per_trigger: int | None = None):
    """readStream(events) -> watermarked, event-time-timeout sessionization
    -> parquet sink. Exact under disorder bounded by ``watermark_delay``."""
    schema = schema or ("event_id long, user_id long, ts timestamp, "
                        "value double")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(stream_dir).withWatermark("ts", watermark_delay)
    sessions = (stream.groupBy("user_id").applyInPandasWithState(
        make_sessionizer_event_time(gap_sec), SESSION_SCHEMA,
        EVENT_STATE_SCHEMA, outputMode="append",
        timeoutConf="EventTimeTimeout"))
    return (sessions.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .format("parquet").option("path", out_dir)
            .start())


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
