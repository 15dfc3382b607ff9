"""The parse stage: one Arrow-batched pandas UDF per turn (SURVEY.md §2.10).

This single UDF realizes the reference's whole per-sentence text-parser
pipeline (T1 split, S8 entity detect, T2/T8 tokenizer, T4/T5 frame scan,
T6 negation — see ``textproc.py`` for exact semantics + citations) and emits a
compact struct instead of a heterogeneous object stream:

    (n_terms, mentions[(pos,value)], frames[(pos,frame_id,negated)],
     terms[(kind,text)]?)

``with_terms=False`` is the hot path for triple extraction: only mention/frame
positions and the term count travel through the shuffle — at 100 TB the term
stream itself (the bulk of the bytes) is never materialized. The full term
stream is only produced for sample serialization (EP2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                               StringType, StructField, StructType)

from ..config import PipelineConfig
from ..lexicons import FramesLexicon
from . import textproc as tp

MENTION_T = StructType([
    StructField("pos", IntegerType()),
    StructField("value", StringType()),
])
FRAME_T = StructType([
    StructField("pos", IntegerType()),
    StructField("frame_id", StringType()),
    StructField("negated", BooleanType()),
])
TERM_T = StructType([
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("aux", StringType()),   # frame terms: matched variant phrase
])

PARSE_SCHEMA = StructType([
    StructField("n_terms", IntegerType()),
    StructField("mentions", ArrayType(MENTION_T)),
    StructField("frames", ArrayType(FRAME_T)),
])
PARSE_SCHEMA_FULL = StructType(
    PARSE_SCHEMA.fields + [StructField("terms", ArrayType(TERM_T))])


def make_parse_udf(frames: FramesLexicon, cfg: PipelineConfig,
                   with_terms: bool = False):
    """Build the parse pandas UDF. Lexicons are captured in the closure and
    shipped once per executor with the serialized task (they are KB-sized;
    for MB-sized lexicons switch to ``SparkContext.broadcast``)."""
    variants = dict(frames.variants)
    max_len = frames.max_variant_len
    neg = frozenset(w.lower() for w in cfg.negation_words)
    schema = PARSE_SCHEMA_FULL if with_terms else PARSE_SCHEMA

    def _parse_batch(texts: pd.Series) -> pd.DataFrame:
        n_terms, mentions, frames_out, terms_out = [], [], [], []
        for text in texts:
            terms = tp.parse_turn(text if isinstance(text, str) else "",
                                  variants, max_len, neg)
            n_terms.append(len(terms))
            mentions.append([{"pos": i, "value": t.text}
                             for i, t in enumerate(terms) if t.kind == tp.E])
            frames_out.append([{"pos": i, "frame_id": t.text,
                                "negated": bool(t.negated)}
                               for i, t in enumerate(terms) if t.kind == tp.F])
            if with_terms:
                terms_out.append([{"kind": t.kind, "text": t.text,
                                   "aux": t.aux} for t in terms])
        data = {"n_terms": pd.Series(n_terms, dtype="int32"),
                "mentions": mentions, "frames": frames_out}
        if with_terms:
            data["terms"] = terms_out
        return pd.DataFrame(data)

    return pandas_udf(_parse_batch, schema)


def parse_transcripts(transcripts, frames: FramesLexicon, cfg: PipelineConfig,
                      with_terms: bool = False):
    """transcripts(conv_id, turn_idx, role, text, ...) ->
    parsed(conv_id, turn_idx, role, n_terms, mentions, frames[, terms]).

    Column-pruned projection: only (conv_id, turn_idx, role, text) are read
    from the scan; Catalyst pushes this into the parquet reader.
    """
    udf = make_parse_udf(frames, cfg, with_terms)

    # Distribute the parse stage: a compact parquet scan can yield far fewer
    # input splits than cores (at real scale the Iceberg table is bucketed by
    # conv_id and this becomes a no-op repartition to the bucket count).
    # Hashing by conv_id also pre-aligns the downstream per-conv windows.
    spark = transcripts.sparkSession
    parallelism = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if transcripts.rdd.getNumPartitions() < parallelism:
        transcripts = transcripts.repartition(parallelism, "conv_id")

    cols: list[Column] = [F.col("conv_id"), F.col("turn_idx"), F.col("role")]
    return (transcripts
            .select(*cols, udf(F.col("text")).alias("p"))
            .select(*cols, F.col("p.*")))
