"""Deterministic k-means over the embeddings table (Lloyd, fixed
iterations) — the corpus-curation / IVF-training clustering primitive.

Engine-exact determinism (the hard part — naive k-means is NOT
reproducible across engines because float sums over unordered rows are
order-dependent, and one ulp near a decision boundary flips a whole
cluster):

* seeds = the k rows minimizing (md5(vec_id), vec_id) — the knn_ivf
  centroid discipline: content-derived, no RNG;
* all arithmetic runs in the 1e6-QUANTIZED integer coordinate space:
  per-dimension centroid numerators are INTEGER sums (commutative and
  associative — identical regardless of row order or partitioning), and
  the centroid double is then the same single exact IEEE division in
  both engines (sum / count, both operands exactly representable);
* distances fold sequentially over dimensions (``F.aggregate`` over
  ``zip_with`` == DuckDB ``list_sum(list_transform(...))``, the pattern
  proven bit-identical by the knn oracles) and the argmin runs on the
  0-dp ROUNDED distance (an integer in e6^2 units, ~1e13 << 2^53) with a
  cluster-index tie-break.

Scale shape: each iteration is ONE combinable groupBy over the corpus
(count + dim integer sums per cluster — no explode, dim+1 aggregates in
one pass) followed by a k-row collect (centroids are driver-sized by
construction, exactly like the IVF centroid pick); assignment is a pure
per-row expression against k literal centroids (k*dim literals in the
plan — the LSH-planes discipline, fine for dictionary-sized k). Total:
``n_iter + 1`` corpus passes, no shuffle wider than k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantized(emb_col):
    """1e6-quantized integer coordinates: the exact summation domain."""
    return F.transform(emb_col,
                       lambda x: F.round(x.cast("double") * 1e6, 0)
                       .cast("long"))


def _dist_key(e6_col, centroid: list[float]):
    """Sequential-fold squared L2 distance (e6 units) to a literal
    centroid, rounded to a long (cross-engine-stable comparisons)."""
    c = F.array(*[F.lit(v) for v in centroid])
    d = F.aggregate(
        F.zip_with(e6_col, c,
                   lambda x, y: (x.cast("double") - y)
                   * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    return F.round(d, 0).cast("long")


def _assign_col(e6_col, centroids: list[list[float]]):
    """cluster = argmin over literal centroids of (dist_key, index)."""
    pairs = F.array(*[
        F.struct(_dist_key(e6_col, c).alias("d"),
                 F.lit(i).alias("i"))
        for i, c in enumerate(centroids)])
    return F.array_min(pairs)["i"].cast("int")


def seed_centroids(embeddings: DataFrame, k: int) -> list[list[float]]:
    """The k rows minimizing (md5(vec_id), vec_id), as e6-unit doubles:
    deterministic, content-derived, TakeOrdered on the driver (k rows)."""
    rows = (embeddings
            .select("vec_id", _quantized(F.col("embedding")).alias("e6"))
            .withColumn("__h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("__h", "vec_id")
            .limit(k)
            .collect())
    return [[float(v) for v in r.e6] for r in rows]


def kmeans_assign(embeddings: DataFrame, k: int = 8, n_iter: int = 3,
                  dim: int = 64) -> DataFrame:
    """(vec_id, cluster) after ``n_iter`` Lloyd updates from the
    deterministic seeds (the returned assignment uses the FINAL
    centroids, so ``n_iter + 1`` assignment passes total).  Empty
    clusters keep their previous centroid (the standard fixed-k
    convention; deterministic)."""
    e = embeddings.select(
        "vec_id", _quantized(F.col("embedding")).alias("e6"))
    e = e.localCheckpoint(eager=False)   # n_iter+1 passes over the same rows
    cents = seed_centroids(embeddings, k)
    for _ in range(n_iter):
        assigned = e.withColumn("cluster", _assign_col(F.col("e6"), cents))
        stats = (assigned.groupBy("cluster")
                 .agg(F.count("*").alias("n"),
                      *[F.sum(F.col("e6")[d]).alias(f"s{d}")
                        for d in range(dim)])
                 .collect())
        new = list(cents)                 # empty cluster -> previous centroid
        for r in stats:
            sums = [r[f"s{d}"] for d in range(dim)]
            # the "same exact IEEE division in both engines" claim needs
            # both operands exactly representable as doubles: Python's
            # int/int is correctly rounded from the EXACT integer, while
            # DuckDB casts the sum to double first — those differ once
            # |sum| >= 2^53 (~1e10 e6-quantized unit-norm rows per
            # cluster). Assert the bound so the guarantee fails loudly
            # instead of drifting by one ulp at extreme scale.
            assert all(abs(s) < (1 << 53) for s in sums), (
                "k-means centroid integer sum exceeds 2^53: the "
                "cross-engine exact-division guarantee no longer holds "
                "at this cluster size; shard the corpus or raise the "
                "quantization step")
            new[r["cluster"]] = [s / r["n"] for s in sums]
        cents = new
    return e.select("vec_id",
                    _assign_col(F.col("e6"), cents).alias("cluster"))


def kmeans_profile(embeddings: DataFrame, k: int = 8, n_iter: int = 3,
                   dim: int = 64) -> DataFrame:
    """Cluster profile of the final assignment: (cluster, n_vectors,
    min_vec_id) — sizes plus a stable member witness per cluster."""
    a = kmeans_assign(embeddings, k, n_iter, dim)
    return (a.groupBy("cluster")
            .agg(F.count("*").cast("long").alias("n_vectors"),
                 F.min("vec_id").cast("long").alias("min_vec_id")))
