"""Mention table construction: J1/W1 positions + doc-scoped entity ids.

Reference semantics re-expressed relationally:

* ``ind_in_doc`` — index of the term in the flattened per-document term
  stream (``EntityServiceProvider.__calculate_entity_positions``,
  ``common/news/parsed/providers/entity_service.py:152-168``): a cumulative
  sum of per-turn term counts (window over conv) plus the in-turn position.
* ``ent_id`` — ``DocumentEntity.IdInDocument`` (``common/news/entity.py:4-16``):
  0-based document enumeration order = ``row_number() over (partition by
  conv_id order by turn_idx, pos) - 1``. Content-derived, so
  partition-count-invariant (SURVEY.md §4 determinism note).

Scale notes: both windows partition by ``conv_id`` — one hash shuffle on the
document key, reused by both window operators (same partitioning). Documents
are bounded (conversations), so no per-key blowup; skewed giant convs are
still one task each, which is fine because per-conv work is linear here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_offsets(parsed: DataFrame) -> DataFrame:
    """Add ``term_offset`` = #terms in all previous turns of the conv."""
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    return parsed.withColumn(
        "term_offset",
        F.coalesce(F.sum("n_terms").over(w), F.lit(0)).cast("long"))


def mentions_table(parsed: DataFrame) -> DataFrame:
    """Explode per-turn mention arrays into the central mentions DF:

    (conv_id, turn_idx, ent_id, pos_in_turn, ind_in_doc, value)
    """
    m = (turn_offsets(parsed)
         .select("conv_id", "turn_idx", "term_offset",
                 F.explode("mentions").alias("m"))
         .select("conv_id", "turn_idx",
                 F.col("m.pos").alias("pos_in_turn"),
                 (F.col("term_offset") + F.col("m.pos")).alias("ind_in_doc"),
                 F.col("m.value").alias("value")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "pos_in_turn")
    return m.withColumn("ent_id", (F.row_number().over(w) - 1).cast("long"))


def frames_table(parsed: DataFrame) -> DataFrame:
    """Exploded frame hits: (conv_id, turn_idx, pos_in_turn, ind_in_doc,
    frame_id, negated) — T10 of SURVEY.md §1."""
    return (turn_offsets(parsed)
            .select("conv_id", "turn_idx", "term_offset",
                    F.explode("frames").alias("f"))
            .select("conv_id", "turn_idx",
                    F.col("f.pos").alias("pos_in_turn"),
                    (F.col("term_offset") + F.col("f.pos")).alias("ind_in_doc"),
                    F.col("f.frame_id").alias("frame_id"),
                    F.col("f.negated").alias("negated")))
