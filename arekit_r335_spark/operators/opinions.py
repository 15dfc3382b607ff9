"""Document-level opinion formation: J4 (predefined), J8 (registration
dedup/loop rejection), J9 (cross-annotator priority).

Reference: ``OpinionCollection.__register_opinion``
(``common/opinions/collection.py:105-150``) — reject loops
(source group == target group), keep the FIRST opinion per synonym-pair key;
``AlgorithmBasedOpinionAnnotator._annot_collection_core``
(``common/opinions/annot/algo_based.py:33-49``) — skip synonymous duplicates.

Arrival order is replaced by explicit deterministic priority columns
(SURVEY.md §4 determinism note): ``seq`` for the seed file order inside one
document, annotator ``priority`` across annotators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRI_PREDEFINED = 0
PRI_FRAMES = 1
PRI_NOLABEL = 2


def predefined_doc_opinions(seed: DataFrame, seed_groups: DataFrame) -> DataFrame:
    """F4 seed table -> deduped doc-level opinions with group keys.

    seed: (conv_id, source_value, target_value, label, seq). Values are
    lowercased like the ``Opinion`` ctor (``common/opinions/base.py:14-15``);
    groups via open-world keys (the seed collection is not read-only in the
    canonical wiring, ``rusentrel/extract_text_opinions.py:42-46``).
    """
    from .grouping import with_group_key

    o = (seed
         .withColumn("s_value", F.lower(F.col("source_value")))
         .withColumn("t_value", F.lower(F.col("target_value"))))
    o = with_group_key(o, seed_groups, "s_value", "s_group")
    o = with_group_key(o, seed_groups, "t_value", "t_group")
    # loop rejection + keep-first by seed order (J8)
    w = Window.partitionBy("conv_id", "s_group", "t_group").orderBy("seq")
    return (o.filter(F.col("s_group") != F.col("t_group"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("conv_id", "s_group", "t_group", "s_value", "t_value",
                    "label"))


def nolabel_doc_opinions(pairs: DataFrame, no_label: str) -> DataFrame:
    """Candidate pairs -> deduped constant-label doc opinions (J8).

    The label is constant, so keep-first == distinct on the synonym-pair key;
    representative values are the lexicographically-first pair values (used
    only for reporting — expansion is group-driven, ``text_opinion_pairs.py:52-56``).
    """
    return (pairs.filter(F.col("s_group") != F.col("t_group"))
            .groupBy("conv_id", "s_group", "t_group")
            .agg(F.min("s_value").alias("s_value"),
                 F.min("t_value").alias("t_value"))
            .withColumn("label", F.lit(no_label)))


def union_annotators(predefined: DataFrame, nolabel: DataFrame,
                     frame_ops: DataFrame | None = None) -> DataFrame:
    """U1 — stack annotator outputs with explicit priority (predefined first,
    ``contrib/utils/pipelines/sources/rusentrel/extract_text_opinions.py:50-54``;
    the frame-connotation annotator sits between predefined and nolabel)."""
    p = predefined.withColumn("priority", F.lit(PRI_PREDEFINED))
    n = nolabel.withColumn("priority", F.lit(PRI_NOLABEL))
    if frame_ops is None:
        return p.unionByName(n)
    f = frame_ops.withColumn("priority", F.lit(PRI_FRAMES))
    return p.unionByName(f).unionByName(n)
