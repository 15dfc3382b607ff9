"""Turn-local EP1 — the one-shuffle physical strategy for ``dist_in_sents=0``.

The reference's canonical configuration confines candidate pairs to a single
sentence (``rusentrel/extract_text_opinions.py:25``: ``dist_in_sentences=0``)
and text opinions to a single sentence too (J10,
``filters/limitation.py:17-24``). Everything EP1 computes is therefore local
to one conversation, and pair enumeration is local to one *turn* — so instead
of relational self-joins keyed on ``(conv_id, turn_idx)`` / ``(conv_id,
group)`` (each a cluster-wide shuffle), this module expresses EP1 with:

* ONE hash exchange of the input by ``conv_id`` (at 100 TB: a no-op scan of
  an Iceberg table bucketed by ``conv_id``);
* per-turn pair enumeration as JVM higher-order array functions over the
  parse output (whole-stage codegen, zero shuffle);
* windows and aggregations that all reuse the conv_id partitioning — Spark
  satisfies ``ClusteredDistribution`` on any superset of the partition keys
  (``EnsureRequirements``), so ``groupBy(conv_id, s_group, t_group)`` and
  ``Window.partitionBy(conv_id, …)`` add Sorts, not Exchanges;
* opinion->mention expansion (J6) as a conv_id-only equi-join against a
  per-conversation mention array — co-partitioned, no exchange (AQE may
  still pick broadcast for a small opinion side, also exchange-free on the
  big side).

Semantics are identical to the relational operators (``pairs.py``,
``opinions.py``, ``expansion.py``) — both paths are checked against the
reference-transcription oracle by ``tests/test_pipeline_parity.py``. The
relational path remains the general implementation for ``dist_in_sents > 0``.

Skew note: a conversation is one row in the expansion join; per-conv work is
O(|opinions| x |mentions|) but conversations are bounded (north rule's unit
of locality), and the pair stage is bounded per turn. Giant-conversation
skew therefore shows up only as row-size variance, which AQE's coalescing
smooths; there is no hot JOIN KEY to salt in this strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig


def annotated_parsed(parsed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """parse output (mentions annotated with group/type) ->
    + ``term_offset`` (J1/W1 cumulative term count) and mention array ``ms``
    with doc-scoped ``ind_in_doc`` and ``ent_id``.

    ``ent_id`` replicates ``DocumentEntity.IdInDocument``
    (``common/news/entity.py:4-16``): enumeration order over (turn_idx, pos)
    = mentions-so-far offset + index within the turn's mention array. The
    J12 whitelist filter (``filters/entity_based.py:9-28``) is applied AFTER
    id/position assignment, preserving the reference numbering.
    """
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    df = (parsed
          .withColumn("term_offset",
                      F.coalesce(F.sum("n_terms").over(w), F.lit(0))
                      .cast("long"))
          .withColumn("ment_offset",
                      F.coalesce(F.sum(F.size("mentions")).over(w), F.lit(0))
                      .cast("long")))
    to, mo = F.col("term_offset"), F.col("ment_offset")
    ms = F.transform(
        "mentions",
        lambda m, i: F.struct(
            m["pos"].alias("pos_in_turn"),
            (to + m["pos"]).cast("long").alias("ind_in_doc"),
            (mo + i).cast("long").alias("ent_id"),
            m["value"].alias("value"),
            m["group_key"].alias("group_key"),
            m["ent_type"].alias("ent_type")))
    if cfg.entity_type_whitelist is not None:
        wl = F.array(*[F.lit(t) for t in cfg.entity_type_whitelist])
        ms = F.filter(ms, lambda m: F.array_contains(wl, m["ent_type"]))
    return df.withColumn("ms", ms)


def mentions_rows(annotated: DataFrame) -> DataFrame:
    """Flat mention table (same schema as ``mentions.mentions_table`` +
    ``group_key``/``ent_type``); explode is narrow — conv_id partitioning
    is preserved."""
    return (annotated
            .select("conv_id", "turn_idx", F.explode("ms").alias("m"))
            .select("conv_id", "turn_idx",
                    F.col("m.pos_in_turn").alias("pos_in_turn"),
                    F.col("m.ind_in_doc").alias("ind_in_doc"),
                    F.col("m.ent_id").alias("ent_id"),
                    F.col("m.value").alias("value"),
                    F.col("m.group_key").alias("group_key"),
                    F.col("m.ent_type").alias("ent_type")))


def _pair_array(ms: Column, cfg: PipelineConfig) -> Column:
    """J2/J3 per-turn: directed cross product of the turn's mentions with the
    identical-mention skip (``pair_based.py:49-50``) and the INCLUSIVE term
    distance bound (``pair_based.py:63-65``); within one turn the doc-level
    term distance equals the in-turn position distance."""
    pairs = F.flatten(F.transform(
        ms, lambda s: F.transform(ms, lambda t: F.struct(
            s["ent_id"].alias("s_ent_id"), t["ent_id"].alias("t_ent_id"),
            s["ind_in_doc"].alias("s_ind"), t["ind_in_doc"].alias("t_ind"),
            s["value"].alias("s_value"), t["value"].alias("t_value"),
            s["group_key"].alias("s_group"), t["group_key"].alias("t_group")))))
    if cfg.dist_in_terms_bound is not None:
        bound = F.lit(cfg.dist_in_terms_bound)
        return F.filter(pairs, lambda p: (
            (p["s_ent_id"] != p["t_ent_id"])
            & (F.abs(p["s_ind"] - p["t_ind"]) <= bound)))
    return F.filter(pairs, lambda p: p["s_ent_id"] != p["t_ent_id"])


def nolabel_doc_opinions_local(annotated: DataFrame,
                               cfg: PipelineConfig) -> DataFrame:
    """J8 over per-turn pair arrays: loop filter + dedup by synonym-pair key.
    The groupBy keys are a superset of conv_id -> no exchange; identical
    output contract to ``opinions.nolabel_doc_opinions``."""
    p = (annotated
         .select("conv_id", F.explode(_pair_array(F.col("ms"), cfg))
                 .alias("p"))
         .select("conv_id",
                 F.col("p.s_group").alias("s_group"),
                 F.col("p.t_group").alias("t_group"),
                 F.col("p.s_value").alias("s_value"),
                 F.col("p.t_value").alias("t_value")))
    return (p.filter(F.col("s_group") != F.col("t_group"))
            .groupBy("conv_id", "s_group", "t_group")
            .agg(F.min("s_value").alias("s_value"),
                 F.min("t_value").alias("t_value"))
            .withColumn("label", F.lit(cfg.no_label)))


def frame_doc_opinions_local(annotated: DataFrame, cfg: PipelineConfig,
                             polarity: dict[str, str]) -> DataFrame:
    """J4b (operators/connotation.py) in turn-local form: the pair array and
    the frame array live in the SAME parse row, so votes are a nested HOF
    fold — zero additional shuffles; only (conv, s_group, t_group, vote)
    rows leave the turn, and the vote aggregation reuses the conv_id
    partitioning (superset clustering)."""
    from .connotation import polarity_map_col

    pol_map = polarity_map_col(polarity)
    to = F.col("term_offset")
    pairs = F.filter(
        _pair_array(F.col("ms"), cfg),
        lambda p: ((p["s_ind"] < p["t_ind"])
                   & (p["s_group"] != p["t_group"])))

    def vote_of(p):
        def step(acc, f):
            pol = F.element_at(pol_map, f["frame_id"])
            f_ind = (to + f["pos"]).cast("long")
            dv = (F.when(pol == "pos", 1).otherwise(-1)
                  * F.when(f["negated"], -1).otherwise(1))
            return acc + F.coalesce(
                F.when((f_ind > p["s_ind"]) & (f_ind < p["t_ind"])
                       & pol.isNotNull(), dv),
                F.lit(0))
        return F.aggregate(F.col("frames"), F.lit(0).cast("long"), step)

    per_pair = F.transform(
        pairs, lambda p: F.struct(
            p["s_group"].alias("s_group"), p["t_group"].alias("t_group"),
            p["s_value"].alias("s_value"), p["t_value"].alias("t_value"),
            vote_of(p).alias("vote")))
    rows = (annotated
            .select("conv_id", F.explode(per_pair).alias("p"))
            .select("conv_id", "p.s_group", "p.t_group", "p.s_value",
                    "p.t_value", "p.vote")
            .filter(F.col("vote") != 0))
    agg = (rows.groupBy("conv_id", "s_group", "t_group")
           .agg(F.sum("vote").alias("__vote"),
                F.min("s_value").alias("s_value"),
                F.min("t_value").alias("t_value")))
    return (agg.filter(F.col("__vote") != 0)
            .withColumn("label", F.when(F.col("__vote") > 0, F.lit("pos"))
                        .otherwise(F.lit("neg")))
            .drop("__vote"))


def conv_mentions(annotated: DataFrame) -> DataFrame:
    """One row per conversation: flattened mention array across turns, with
    turn_idx folded into each element (input of the expansion join)."""
    per_turn = F.transform(
        "ms", lambda m: F.struct(
            F.col("turn_idx").alias("turn_idx"),
            m["pos_in_turn"].alias("pos_in_turn"),
            m["ind_in_doc"].alias("ind_in_doc"),
            m["ent_id"].alias("ent_id"),
            m["value"].alias("value"),
            m["group_key"].alias("group_key")))
    # element order inside ``cms`` is arbitrary (collect_list) and
    # semantically irrelevant: ids/positions are content-derived and the
    # expansion product is order-free.
    return (annotated
            .select("conv_id", per_turn.alias("tms"))
            .groupBy("conv_id")
            .agg(F.flatten(F.collect_list("tms")).alias("cms")))


def expand_to_text_opinions_local(doc_opinions: DataFrame,
                                  conv_ms: DataFrame,
                                  cfg: PipelineConfig) -> DataFrame:
    """J6 + J10/J11 as a conv_id equi-join + per-row array products.

    For each doc opinion, source mentions = conv mentions whose group matches
    s_group, targets likewise (``text_opinion_pairs.py:52-72``); the J10
    same-turn and J11 strict-window filters prune the product
    (``limitation.py:17-24``, ``sample.py:28-62``). Output schema matches
    ``expansion.expand_to_text_opinions``.
    """
    j = doc_opinions.join(conv_ms, "conv_id")
    src = F.filter(F.col("cms"), lambda m: m["group_key"] == F.col("s_group"))
    tgt = F.filter(F.col("cms"), lambda m: m["group_key"] == F.col("t_group"))
    prod = F.flatten(F.transform(
        src, lambda s: F.transform(tgt, lambda t: F.struct(
            s["turn_idx"].alias("s_turn"), t["turn_idx"].alias("t_turn"),
            s["ent_id"].alias("s_ent_id"), t["ent_id"].alias("t_ent_id"),
            s["ind_in_doc"].alias("s_ind"), t["ind_in_doc"].alias("t_ind"),
            s["value"].alias("s_value"), t["value"].alias("t_value"),
            s["pos_in_turn"].alias("s_pos"), t["pos_in_turn"].alias("t_pos")))))
    keep = F.filter(prod, lambda p: (
        (p["s_ent_id"] != p["t_ent_id"])
        & (p["s_turn"] == p["t_turn"])
        & (F.abs(p["s_ind"] - p["t_ind"]) < F.lit(cfg.terms_per_context))))
    return (j.select("conv_id", "s_group", "t_group", "label", "priority",
                     F.explode(keep).alias("p"))
            .select("conv_id", "s_group", "t_group", "label", "priority",
                    F.col("p.s_turn").alias("s_turn"),
                    F.col("p.t_turn").alias("t_turn"),
                    F.col("p.s_ent_id").alias("s_ent_id"),
                    F.col("p.t_ent_id").alias("t_ent_id"),
                    F.col("p.s_ind").alias("s_ind"),
                    F.col("p.t_ind").alias("t_ind"),
                    F.col("p.s_value").alias("s_value"),
                    F.col("p.t_value").alias("t_value"),
                    F.col("p.s_pos").alias("s_pos"),
                    F.col("p.t_pos").alias("t_pos")))
