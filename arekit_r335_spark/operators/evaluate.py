"""Evaluation operators — J14/J15 comparison joins + A4-A7 metrics.

Reference semantics (transcribed relationally):

* ``OpinionBasedComparator.calc_diff`` (``common/evaluation/comparators/
  opinions.py:18-84``): Extraction mode = full outer join keyed by the
  synonym-pair id (misses get NULL labels); Classification mode = inner join
  driven from the etalon side (extra test rows are an error in the reference;
  relationally they simply vanish from the inner join).
* per-doc per-class P/R (``metrics_pr.py:5-35``): P = TP/|test rows of class|,
  R = TP/|etalon rows of class|, empty-set convention: 0.0 when the doc's
  ETALON has opinions of that class else 1.0 (``two_class_prf.py:50-66``
  passes has_pos/has_neg of the etalon as answer_exist).
* accuracy (``metrics_acc.py:4-8``): |comparison true| / max(|rows|, 1e-5).
* macro aggregation (``two_class_prf.py:86-114``): P/R/acc averaged over
  docs, THEN F1 = macro over the two classes (f1 = 0 when p*r == 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACTION = "extraction"
CLASSIFICATION = "classification"


def compare_opinions(etalon: DataFrame, test: DataFrame,
                     mode: str = EXTRACTION,
                     keys: tuple[str, ...] = ("conv_id", "s_group", "t_group"),
                     strict: bool = True) -> DataFrame:
    """J14 — comparison table: keys + etalon_label + test_label + comparison.

    Inputs are doc-level opinion DFs with a ``label`` column, already deduped
    on the key (OpinionCollection invariant).

    Classification mode replicates the reference's strictness
    (``comparators/opinions.py:48-54``): a test opinion absent from the
    etalon "could not be possible, since we perform classification of
    already provided opinions" and raises — here a left-anti count-and-raise
    (one driver-sized action; eval collections are per-doc small). Etalon
    rows absent from the test side are skipped, exactly like the reference's
    ``continue`` at ``opinions.py:31-32`` (the inner join). ``strict=False``
    downgrades the error to the silent inner-join drop."""
    e = etalon.select(*keys, F.col("label").alias("etalon_label"))
    t = test.select(*keys, F.col("label").alias("test_label"))
    if mode == CLASSIFICATION and strict:
        extra = t.join(e, list(keys), "left_anti")
        sample = extra.limit(3).collect()
        if sample:
            n = extra.count()
            shown = ", ".join(str(tuple(r[k] for k in keys)) for r in sample)
            raise ValueError(
                f"Classification mode: {n} test opinion(s) not found in the "
                f"etalon collection (e.g. {shown}) — the reference raises "
                "here (comparators/opinions.py:48-54)")
    how = "full_outer" if mode == EXTRACTION else "inner"
    joined = e.join(t, list(keys), how)
    return joined.withColumn(
        "comparison",
        F.coalesce(F.col("etalon_label") == F.col("test_label"),
                   F.lit(False)))


def compare_context_opinions(etalon: DataFrame, test: DataFrame,
                             mode: str = EXTRACTION) -> DataFrame:
    """J15 — same, keyed by the mention-level context id
    (``text_opinions.py:16-25``: doc, context, source id, target id)."""
    return compare_opinions(
        etalon, test, mode,
        keys=("conv_id", "turn_idx", "s_ent_id", "t_ent_id"))


def per_doc_class_prf(cmp: DataFrame, labels: tuple[str, ...] = ("pos", "neg"),
                      doc_col: str = "conv_id") -> DataFrame:
    """A4 — per-document, per-class precision/recall with the reference's
    empty-set conventions. Output: (doc, label, prec, rec, tp, n_test, n_etalon,
    answer_exist)."""
    per_label = []
    for lab in labels:
        is_tp = (F.col("comparison") & (F.col("test_label") == lab)).cast("long")
        agg = cmp.groupBy(doc_col).agg(
            F.sum(is_tp).alias("tp"),
            F.sum((F.col("test_label") == lab).cast("long")).alias("n_test"),
            F.sum((F.col("etalon_label") == lab).cast("long")).alias("n_etalon"),
        ).withColumn("label", F.lit(lab))
        per_label.append(agg)
    out = per_label[0]
    for df in per_label[1:]:
        out = out.unionByName(df)
    answer_exist = F.col("n_etalon") > 0
    prec = F.when(F.col("n_test") != 0, F.col("tp") / F.col("n_test")) \
            .otherwise(F.when(answer_exist, F.lit(0.0)).otherwise(F.lit(1.0)))
    rec = F.when(F.col("n_etalon") != 0, F.col("tp") / F.col("n_etalon")) \
           .otherwise(F.when(answer_exist, F.lit(0.0)).otherwise(F.lit(1.0)))
    return out.select(F.col(doc_col).alias("doc"), "label",
                      prec.alias("prec"), rec.alias("rec"),
                      "tp", "n_test", "n_etalon",
                      answer_exist.alias("answer_exist"))


def per_doc_accuracy(cmp: DataFrame, doc_col: str = "conv_id") -> DataFrame:
    """A7 — per-doc accuracy with the 1e-5 guard of metrics_acc.py."""
    return (cmp.groupBy(doc_col)
            .agg((F.sum(F.col("comparison").cast("long"))
                  / F.greatest(F.count("*").cast("double"), F.lit(1e-5)))
                 .alias("acc"))
            .select(F.col(doc_col).alias("doc"), "acc"))


def macro_result(per_doc: DataFrame, acc: DataFrame,
                 labels: tuple[str, ...] = ("pos", "neg")) -> dict:
    """A6 — macro-average per-doc P/R over documents, then per-class F1 and
    the final macro F1 (exact reference arithmetic on driver-side scalars —
    the per-doc table is already tiny)."""
    rows = (per_doc.groupBy("label")
            .agg(F.avg("prec").alias("p"), F.avg("rec").alias("r"))
            .collect())
    by_label = {r["label"]: (r["p"], r["r"]) for r in rows}
    acc_macro = acc.agg(F.avg("acc")).first()[0] or 0.0

    def f1_single(p, r):
        return 2 * p * r / (p + r) if p * r != 0 else 0

    out = {"acc": acc_macro}
    f1s = []
    for lab in labels:
        p, r = by_label.get(lab, (0.0, 0.0))
        f1 = f1_single(p, r)
        out[f"{lab}_prec"], out[f"{lab}_recall"], out[f"f1_{lab}"] = p, r, f1
        f1s.append(f1)
    out["f1"] = sum(f1s) / len(f1s) if f1s else 0.0
    return out


def micro_prf(cmp: DataFrame, labels: tuple[str, ...] = ("pos", "neg")) -> DataFrame:
    """A5 — corpus micro P/R over classes (metrics_pr.py:38-55), as a 1-row DF
    with the reference's 1e-5 zero-guards."""
    is_lab_test = F.col("test_label").isin(*labels)
    is_lab_et = F.col("etalon_label").isin(*labels)
    agg = cmp.agg(
        F.sum((F.col("comparison") & is_lab_test).cast("long")).alias("tp"),
        F.sum(is_lab_test.cast("long")).alias("n_test"),
        F.sum(is_lab_et.cast("long")).alias("n_etalon"))
    return agg.select(
        "tp", "n_test", "n_etalon",
        (F.col("tp") / F.greatest(F.col("n_test").cast("double"), F.lit(1e-5)))
        .alias("prec_micro"),
        (F.col("tp") / F.greatest(F.col("n_etalon").cast("double"), F.lit(1e-5)))
        .alias("rec_micro"))
