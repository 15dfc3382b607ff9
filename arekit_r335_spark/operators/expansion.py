"""J6 — doc-level opinions -> mention-level text opinions, plus the
text-opinion filter chain (J10/J11/J12) and cross-annotator dedup (J9).

Reference: ``TextOpinionPairsProvider.iter_from_opinion``
(``common/news/parsed/providers/text_opinion_pairs.py:46-78``): every mention
whose synonym group matches the opinion's source group is crossed with every
mention matching the target group (skipping identical mentions). Then each
TextOpinion passes the filter chain of
``contrib/utils/pipelines/text_opinion/extraction.py:25-50``:

* J10 same-sentence (``filters/limitation.py:17-24``);
* J11 strict window ``t_dist < terms_per_context`` + distinct ends
  (``common/data/input/sample.py:28-62`` — note STRICT ``<`` here versus the
  INCLUSIVE ``<=`` bound at candidate time, both reproduced);
* J12 optional entity-type whitelist (``filters/entity_based.py:9-28``);
* J9 cross-annotator dedup on the mention-pair id, predefined first
  (``extraction.py:41-46``).

Spark realization: two equi-joins on ``(conv_id, group)``. Groups are Zipfian
(hot entities) — the join keys carry conv_id which bounds each key's row count
by the conversation size, and AQE skew-join covers the rest (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig


def expand_to_text_opinions(doc_opinions: DataFrame, mentions: DataFrame,
                            cfg: PipelineConfig) -> DataFrame:
    """doc_opinions(conv_id, s_group, t_group, label, priority) x mentions ->
    filtered mention-level triples."""
    m_src = mentions.select(
        F.col("conv_id"), F.col("group_key").alias("s_group"),
        F.col("ent_id").alias("s_ent_id"), F.col("turn_idx").alias("s_turn"),
        F.col("ind_in_doc").alias("s_ind"), F.col("value").alias("s_value"),
        F.col("pos_in_turn").alias("s_pos"))
    m_tgt = mentions.select(
        F.col("conv_id"), F.col("group_key").alias("t_group"),
        F.col("ent_id").alias("t_ent_id"), F.col("turn_idx").alias("t_turn"),
        F.col("ind_in_doc").alias("t_ind"), F.col("value").alias("t_value"),
        F.col("pos_in_turn").alias("t_pos"))

    ops = doc_opinions.select("conv_id", "s_group", "t_group", "label",
                              "priority")

    expanded = (ops
                .join(m_src, ["conv_id", "s_group"])
                .join(m_tgt, ["conv_id", "t_group"]))

    # J10 + J11 filter chain (also drops identical ends)
    flt = ((F.col("s_ent_id") != F.col("t_ent_id"))
           & (F.col("s_turn") == F.col("t_turn"))
           & (F.abs(F.col("s_ind") - F.col("t_ind")) < cfg.terms_per_context))
    return expanded.filter(flt)


def dedup_across_annotators(text_opinions: DataFrame) -> DataFrame:
    """J9 — one row per mention pair, lowest priority (predefined) wins."""
    w = (Window.partitionBy("conv_id", "s_ent_id", "t_ent_id")
         .orderBy("priority"))
    return (text_opinions
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn"))


def triples_schema_select(text_opinions: DataFrame) -> DataFrame:
    """Stable output projection of mention-level (subj, pred, obj) triples."""
    return text_opinions.select(
        "conv_id",
        F.col("s_turn").alias("turn_idx"),
        "s_ent_id", "t_ent_id",
        "s_value", "t_value",
        "s_group", "t_group",
        "label",
        (F.abs(F.col("s_ind") - F.col("t_ind"))).alias("term_dist"),
    )
