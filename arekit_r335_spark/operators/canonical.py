"""J7b — cross-corpus entity canonicalization: connected components over
synonym-group keys (iterative DataFrame joins with checkpointing + salted
two-phase aggregation), per the north rule and SURVEY.md §4 items 1-2.

Reference semantics being generalized: ``SynonymsCollection`` merges values
into groups via shared sids (``common/synonyms/base.py:109-126`` — a value
registered into a later group re-points its sid) and open-world registration
creates singleton groups (``grouping.py:8-15``). At corpus scale, alias
evidence (same sid in two groups, explicit alias pairs) forms a graph whose
connected components are the canonical nodes of the knowledge graph.

Algorithm: iterative min-label propagation —
    comp(v) <- min(comp(v), min over neighbors u of comp(u))
until fixpoint. Each iteration is one shuffle join + aggregation;
``localCheckpoint()`` truncates the growing lineage (required for iterative
DataFrame loops); the min-aggregation is two-phase salted so a celebrity node
with millions of alias edges cannot pin a single reducer (on top of Spark's
map-side partial aggregation; AQE skew-join handles the join side).
Iterations are bounded by the component diameter, which for entity-alias
graphs is tiny; ``max_iter`` guards pathological chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25,
                         salt: int = 16, check_every: int = 3) -> DataFrame:
    """edges(src, dst) [string node ids, undirected interpretation] ->
    (node, component) with component = min node id of the component.

    The fixpoint test (a ``limit(1).count()`` driver action) runs every
    ``check_every`` iterations, not every iteration: min-label propagation
    is idempotent past the fixpoint, so overshooting by <= check_every-1
    no-op iterations is semantically free and cuts the per-iteration driver
    round-trips 3x on deep alias chains (round-3 verdict item 9).  Alias
    graphs have tiny diameters, so the common case is ONE check at
    iteration 3 instead of three."""
    sym = (edges.selectExpr("src AS a", "dst AS b")
           .unionByName(edges.selectExpr("dst AS a", "src AS b"))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .localCheckpoint())

    comp = (sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint())

    for it in range(max_iter):
        # neighbor's current component flows across each edge
        nbr = (sym.join(comp.withColumnRenamed("node", "b")
                        .withColumnRenamed("component", "nbr_comp"), "b")
               .select(F.col("a").alias("node"), F.col("nbr_comp")))
        # salted two-phase min: (node, salt-bucket) partial min, then final
        partial = (nbr
                   .withColumn("__salt", F.pmod(F.xxhash64("nbr_comp"),
                                                F.lit(salt)))
                   .groupBy("node", "__salt")
                   .agg(F.min("nbr_comp").alias("m")))
        candidate = partial.groupBy("node").agg(F.min("m").alias("nbr_min"))

        updated = (comp.join(candidate, "node", "left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce(F.col("nbr_min"),
                                              F.col("component")))
                           .alias("component"))
                   .localCheckpoint())

        prev = comp
        comp = updated
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            changed = (updated.alias("u")
                       .join(prev.alias("c"), "node")
                       .filter(F.col("u.component") != F.col("c.component"))
                       .limit(1).count())
            if changed == 0:
                break
    return comp


def group_alias_edges(mentions: DataFrame, aliases: DataFrame | None,
                      seed_df: DataFrame) -> DataFrame:
    """Edge list over group keys:

    * every group key is a node (self-edges filtered later);
    * explicit alias pairs (value_a, value_b) connect the groups the two
      values resolve to (seed lookup, else the open-world ``u:`` key).
    """
    from .grouping import with_group_key

    if aliases is None:
        return mentions.sparkSession.createDataFrame(
            [], "src string, dst string")
    a = aliases.withColumn("value", F.lower("value_a"))
    a = with_group_key(a, seed_df, "value", "src")
    a = a.withColumn("value", F.lower("value_b"))
    a = with_group_key(a, seed_df, "value", "dst")
    return a.select("src", "dst")


def canonical_nodes(mentions: DataFrame, components: DataFrame) -> DataFrame:
    """Canonical node table (S12): one row per component with its member
    groups/values. Groups never touched by an edge stay their own component."""
    m = mentions.join(components.withColumnRenamed("node", "group_key"),
                      "group_key", "left")
    m = m.withColumn("canon_id",
                     F.coalesce(F.col("component"), F.col("group_key")))
    return (m.groupBy("canon_id")
            .agg(F.array_sort(F.collect_set("group_key")).alias("group_keys"),
                 F.array_sort(F.collect_set("value")).alias("values"),
                 F.count("*").cast("long").alias("n_mentions")))


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite triple group keys to canonical component ids (edges table of
    the graph sink)."""
    s = components.withColumnRenamed("node", "s_group") \
                  .withColumnRenamed("component", "s_canon")
    t = components.withColumnRenamed("node", "t_group") \
                  .withColumnRenamed("component", "t_canon")
    out = (triples
           .join(F.broadcast(s), "s_group", "left")
           .join(F.broadcast(t), "t_group", "left"))
    return (out
            .withColumn("s_canon", F.coalesce("s_canon", "s_group"))
            .withColumn("t_canon", F.coalesce("t_canon", "t_group")))
