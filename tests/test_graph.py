"""Graph-analytics operator tests (operators/graph.py): triangle
enumeration on known graphs, degree-profile reconciliation, and the
per-conversation entity-cap guard.  Exact values at sf0.01 are pinned by
the DuckDB oracles (kg_node_degrees / kg_cooccurrence / kg_triangles)."""

from pyspark.sql import functions as F

from arekit_r335_spark.operators.graph import (
    conv_entity_sets, cooccurrence, node_degrees, triangles)


def _und(spark, edges):
    return spark.createDataFrame(edges, "u string, v string")


def test_triangles_k4(spark):
    """Complete graph on 4 vertices: C(4,3) = 4 triangles, each once."""
    vs = ["a", "b", "c", "d"]
    e = [(x, y) for i, x in enumerate(vs) for y in vs[i + 1:]]
    got = sorted(map(tuple, triangles(_und(spark, e)).collect()))
    assert got == [("a", "b", "c"), ("a", "b", "d"),
                   ("a", "c", "d"), ("b", "c", "d")]


def test_triangles_triangle_free(spark):
    """Stars and paths have no triangles (hub fan-out must not fake any)."""
    star = [("hub", f"s{i}") for i in range(20)]
    path = [(f"p{i}", f"p{i+1}") for i in range(10)]
    assert triangles(_und(spark, star + path)).count() == 0


def test_triangles_normalizes_input(spark):
    """Duplicate edges, reversed orientation, and self-loops collapse."""
    e = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
         ("a", "c"), ("a", "a")]
    got = sorted(map(tuple, triangles(_und(spark, e)).collect()))
    assert got == [("a", "b", "c")]


def test_triangles_hub_plus_triangle(spark):
    """A hub attached to one real triangle: exactly the closed wedges
    count, no spurious hub wedges survive the closing semi-join."""
    e = [("hub", f"s{i}") for i in range(15)]
    e += [("hub", "x"), ("hub", "y"), ("x", "y")]
    got = sorted(map(tuple, triangles(_und(spark, e)).collect()))
    assert got == [("hub", "x", "y")]


def test_node_degrees_reconcile(spark):
    edges = spark.createDataFrame(
        [("a", "b", "pos", 3), ("a", "b", "neg", 2),
         ("a", "c", "pos", 1), ("b", "a", "pos", 4)],
        "src string, dst string, label string, n_ops long")
    rows = {r.node: r for r in node_degrees(edges).collect()}
    assert rows["a"].out_deg == 2 and rows["a"].n_out_ops == 6
    assert rows["a"].in_deg == 1 and rows["a"].n_in_ops == 4
    assert rows["b"].out_deg == 1 and rows["b"].in_deg == 1
    # c never appears as src: zero-filled, not dropped
    assert rows["c"].out_deg == 0 and rows["c"].in_deg == 1
    # degree mass reconciles: sum(n_out_ops) == sum(n_in_ops) == total ops
    assert sum(r.n_out_ops for r in rows.values()) == 10
    assert sum(r.n_in_ops for r in rows.values()) == 10


def test_cooccurrence_lift(spark):
    ents = spark.createDataFrame(
        [("c1", "x"), ("c1", "y"), ("c2", "x"), ("c2", "y"),
         ("c3", "x"), ("c3", "z")],
        "conv_id string, canon string")
    got = {(r.e_a, r.e_b): r for r in cooccurrence(ents).collect()}
    xy = got[("x", "y")]
    assert xy.n_pair == 2 and xy.n_a == 3 and xy.n_b == 2
    assert xy.n_convs == 3
    assert abs(xy.lift - (2 * 3) / (3 * 2)) < 1e-12
    xz = got[("x", "z")]
    assert xz.n_pair == 1 and xz.lift == (1 * 3) / (3 * 1)
    assert ("y", "z") not in got


def test_conv_entity_cap_drops_degenerate_docs(spark):
    mentions = spark.createDataFrame(
        [("big", f"e{i}") for i in range(30)] + [("ok", "e1"), ("ok", "e2")],
        "conv_id string, group_key string")
    comps = spark.createDataFrame([], "node string, component string")
    ents = conv_entity_sets(mentions, comps, max_entities_per_conv=10)
    got = set(r.conv_id for r in ents.collect())
    assert got == {"ok"}


def test_triangles_match_sql_oracle_fixture(spark, tmp_path):
    """Random-ish deterministic graph: degree-ordered enumeration equals
    the naive three-way self-join enumeration."""
    import itertools
    vs = [f"v{i:02d}" for i in range(14)]
    e = [(a, b) for a, b in itertools.combinations(vs, 2)
         if (len(a + b) * 7 + ord(a[-1]) * 3 + ord(b[-1])) % 5 < 2]
    und = set(e)
    naive = sorted(
        (a, b, c) for a, b, c in itertools.combinations(sorted(vs), 3)
        if {(a, b), (a, c), (b, c)} <= und)
    got = sorted(map(tuple, triangles(_und(spark, e)).collect()))
    assert got == naive and len(naive) > 0
