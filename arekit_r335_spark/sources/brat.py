"""S1/S2/S3 — BRAT annotation ingestion as DataFrame operators.

Reference: ``contrib/source/brat/annot.py`` parses ``.ann`` lines —
``T<id>\\t<TYPE> <begin> <end>\\t<value>`` entities (annot.py:16-34) and
``R<id>\\t<TYPE> Arg1:T<s> Arg2:T<t>`` relations (annot.py:37-48);
``sentences_reader.py:57-106`` assigns entities to sentences by char-offset
containment, dropping boundary-crossers.

Spark realization: ``spark.read.text`` + regexp projections; the
entity-to-sentence assignment is a range join expressed with equi-join on
doc + interval predicates (Catalyst pushes them into the join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_ann_lines(raw: DataFrame, doc_col: str = "doc_id") -> dict:
    """raw: (doc_id, value) lines of .ann files ->
    {'entities': (doc_id, ann_id, ent_type, begin, end, value),
     'relations': (doc_id, rel_id, rel_type, src_ann_id, tgt_ann_id)}"""
    v = F.col("value")
    ent = (raw.filter(v.startswith("T"))
           .select(
               F.col(doc_col),
               F.regexp_extract(v, r"^T(\d+)", 1).cast("long").alias("ann_id"),
               F.regexp_extract(v, r"^T\d+\t(\S+) ", 1).alias("ent_type"),
               F.regexp_extract(v, r"^T\d+\t\S+ (\d+)", 1).cast("long")
                .alias("begin"),
               F.regexp_extract(v, r"^T\d+\t\S+ \d+[ ;]*(\d+)\t", 1)
                .cast("long").alias("end"),
               F.lower(F.regexp_extract(v, r"\t([^\t]+)$", 1)).alias("value"))
           .filter(F.col("ann_id").isNotNull()))
    rel = (raw.filter(v.startswith("R"))
           .select(
               F.col(doc_col),
               F.regexp_extract(v, r"^R(\d+)", 1).cast("long").alias("rel_id"),
               F.regexp_extract(v, r"^R\d+\t(\S+)", 1).alias("rel_type"),
               F.regexp_extract(v, r"Arg1:T(\d+)", 1).cast("long")
                .alias("src_ann_id"),
               F.regexp_extract(v, r"Arg2:T(\d+)", 1).cast("long")
                .alias("tgt_ann_id")))
    return {"entities": ent, "relations": rel}


def assign_entities_to_sentences(entities: DataFrame,
                                 sentences: DataFrame) -> DataFrame:
    """S3 range join: keep entities fully inside one sentence span
    (``sentences_reader.py:90-98`` drops boundary-crossing entities)."""
    e, s = entities.alias("e"), sentences.alias("s")
    return (e.join(s, (F.col("e.doc_id") == F.col("s.doc_id"))
                   & (F.col("e.begin") >= F.col("s.ind_begin"))
                   & (F.col("e.end") <= F.col("s.ind_end")))
            .select("e.*", F.col("s.sent_ind").alias("sent_ind")))


def sentences_with_offsets(docs: DataFrame, doc_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """S2 — one sentence per line with char spans ``ind_begin/ind_end``
    (``BratDocumentSentencesReader._parse_sentences``,
    ``sentences_reader.py:109-128``: offsets advance by line length + 1 for
    the newline). Output: (doc_id, sent_ind, sent_text, ind_begin, ind_end)."""
    from pyspark.sql import Window
    lines = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
         .alias("sent_ind", "sent_text"))
    w = (Window.partitionBy("doc_id").orderBy("sent_ind")
         .rowsBetween(Window.unboundedPreceding, -1))
    begin = F.coalesce(F.sum(F.length("sent_text") + 1).over(w),
                       F.lit(0)).cast("long")
    return (lines
            .withColumn("ind_begin", begin)
            .withColumn("ind_end",
                        (F.col("ind_begin") + F.length("sent_text"))
                        .cast("long")))


def predefined_from_brat(relations: DataFrame, entities_in_sents: DataFrame,
                         label_map: dict[str, str],
                         supported: tuple[str, ...] | None = None) -> DataFrame:
    """J5 — ``PredefinedTextOpinionAnnotator`` semantics
    (``contrib/utils/pipelines/text_opinion/annot/predefined.py:12-88``):
    BRAT relations resolve Arg1/Arg2 to in-document entities via inner joins
    (unresolvable = dropped nested entities, ``__convert_opinion_id:44-60``),
    relation types map through the label formatter, unsupported labels are
    filtered (``:73``)."""
    lm = [(k, v) for k, v in sorted(label_map.items())]
    spark = relations.sparkSession
    lmdf = spark.createDataFrame(lm, "rel_type string, label string")
    src = entities_in_sents.select(
        F.col("doc_id"), F.col("ann_id").alias("src_ann_id"),
        F.col("value").alias("s_value"), F.col("sent_ind").alias("s_sent"))
    tgt = entities_in_sents.select(
        F.col("doc_id"), F.col("ann_id").alias("tgt_ann_id"),
        F.col("value").alias("t_value"), F.col("sent_ind").alias("t_sent"))
    out = (relations
           .join(F.broadcast(lmdf), "rel_type")
           .join(src, ["doc_id", "src_ann_id"])
           .join(tgt, ["doc_id", "tgt_ann_id"]))
    if supported is not None:
        out = out.filter(F.col("label").isin(list(supported)))
    return out.select("doc_id", "rel_id", "src_ann_id", "tgt_ann_id",
                      "s_value", "t_value", "s_sent", "t_sent", "label")


def merge_overlapping_entities(entities: DataFrame) -> DataFrame:
    """J13 — compound-entity overlap merge: sort by (begin asc, length desc)
    and keep only interval-island roots (``brat/sentence.py:41-69`` keeps the
    first/widest entity of each overlapping run). Window realization: an
    entity survives iff its begin is strictly greater than the running max
    ``end`` of all previous entities in (begin, -length) order."""
    from pyspark.sql import Window
    w = (Window.partitionBy("doc_id")
         .orderBy(F.col("begin").asc(), (F.col("end") - F.col("begin")).desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max_end = F.max("end").over(w)
    return (entities
            .withColumn("__pme", prev_max_end)
            .filter(F.col("__pme").isNull() | (F.col("begin") > F.col("__pme")))
            .drop("__pme"))
