"""C1-C5 — data folding / CV split operators.

Reference: ``common/folding/*`` + ``contrib/utils/cv/splitters/*``. Folding
is a doc_id -> {train/test/...} assignment; here a ``folds`` DataFrame
``(conv_id, data_type [, fold])``. Seeded RNG shuffles are replaced with
md5-order determinism (partition-count-invariant; SURVEY.md §4 item 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRAIN, TEST, DEV, ETALON = "train", "test", "dev", "etalon"


def no_folding(docs: DataFrame, data_type: str = TRAIN,
               doc_col: str = "conv_id") -> DataFrame:
    """C1 — all docs belong to every provided type (nofold.py:4-15)."""
    return docs.select(doc_col).distinct().withColumn(
        "data_type", F.lit(data_type))


def fixed_folding(assignments: list[tuple[str, str]], spark) -> DataFrame:
    """C2 — explicit (doc, data_type) map (fixed.py:14-42)."""
    return spark.createDataFrame(assignments,
                                 "conv_id string, data_type string")


def cv_folding(docs: DataFrame, n_folds: int = 3,
               doc_col: str = "conv_id",
               check_empty: bool = True) -> DataFrame:
    """C3 — the seeded-shuffle equal-chunk splitter
    (splitters/default.py:6-52) re-stated distributed: fold = hash-mod over
    a base-16-parsed md5 prefix. An ntile over a GLOBAL md5 order would give
    exact-equal chunk sizes but moves the whole doc set into one task to
    number it (a single-partition window — the scale-killer shape); hash-mod
    is map-only, partition-count-invariant, and equally balanced in
    expectation, which is all the CV contract needs. Output (doc, fold).

    Unlike the reference's equal chunks, hash-mod CAN leave a fold empty on a
    small doc set (and ``cv_fold_state`` on an empty test fold would silently
    yield an empty test split) — ``check_empty`` runs one cheap setup-time
    groupBy over the doc ids (CV setup is once-per-experiment; the doc-id set
    is the same size the reference's C4 splitter collects to the driver) and
    warns naming the empty folds. Disable for latency-critical plan building."""
    hex15 = F.substring(F.md5(F.col(doc_col).cast("string")), 1, 15)
    out = (docs.select(doc_col).distinct()
           .select(F.col(doc_col),
                   (F.conv(hex15, 16, 10).cast("long") % n_folds)
                   .cast("int").alias("fold")))
    if check_empty:
        sizes = {r.fold: r.n for r in
                 out.groupBy("fold").agg(F.count("*").alias("n")).collect()}
        empty = sorted(set(range(n_folds)) - set(sizes))
        if empty:
            import logging
            logging.getLogger(__name__).warning(
                "cv_folding: fold(s) %s are EMPTY for this %d-doc set "
                "(hash-mod over %d folds) — downstream cv_fold_state would "
                "yield an empty test split; use fewer folds or the "
                "reference-style equal chunks for tiny corpora",
                empty, sum(sizes.values()), n_folds)
    return out


def cv_fold_state(folds: DataFrame, test_fold: int) -> DataFrame:
    """C5 — one CV state: chunk k = test, rest = train (two_class.py:41-77)."""
    return folds.select(
        folds.columns[0],
        F.when(F.col("fold") == test_fold, F.lit(TEST))
         .otherwise(F.lit(TRAIN)).alias("data_type"))


def stat_balanced_cv_folding(doc_stats: DataFrame, n_folds: int = 3,
                             doc_col: str = "conv_id",
                             weight_col: str = "n_sents") -> DataFrame:
    """C4 — size-balanced folds (splitters/statistical.py:7-54): greedy
    argmin-of-load assignment over docs sorted by weight desc. Per-doc stats
    are tiny (one row per document) -> collected and assigned on the driver,
    exactly like the reference, then returned as a DataFrame."""
    rows = (doc_stats.select(doc_col, weight_col)
            .orderBy(F.col(weight_col).desc(), F.col(doc_col))
            .collect())
    loads = [0] * n_folds
    assign = []
    for r in rows:
        k = min(range(n_folds), key=lambda i: (loads[i], i))
        loads[k] += r[weight_col]
        assign.append((r[doc_col], k))
    return doc_stats.sparkSession.createDataFrame(
        assign, f"{doc_col} string, fold int")


def united_folding(*foldings: DataFrame) -> DataFrame:
    """U2 — merge foldings (united.py:27-46)."""
    out = foldings[0]
    for f in foldings[1:]:
        out = out.unionByName(f)
    return out
