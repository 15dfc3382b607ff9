"""Evaluator (J14/A4-A7) and aggregation (A1/A2) unit tests, mirroring the
reference's conventions (tests/contrib/utils/test_eval.py): self-comparison
scores F1 = 1.0; empty-class P/R conventions of metrics_pr.py:17-35."""

import pytest
from pyspark.sql import functions as F

from arekit_r335_spark.operators.aggregate import (
    AVERAGE, FIRST_APPEARED, fill_opinion_collection, linkages_to_opinions)
from arekit_r335_spark.operators.evaluate import (
    CLASSIFICATION, EXTRACTION, compare_opinions, macro_result,
    per_doc_accuracy, per_doc_class_prf)

OPS_SCHEMA = "conv_id string, s_group string, t_group string, label string"


def _ops(spark, rows):
    return spark.createDataFrame(rows, OPS_SCHEMA)


def evaluate(spark, etalon_rows, test_rows, mode=EXTRACTION):
    cmp = compare_opinions(_ops(spark, etalon_rows), _ops(spark, test_rows),
                           mode)
    per_doc = per_doc_class_prf(cmp)
    acc = per_doc_accuracy(cmp)
    return macro_result(per_doc, acc)


def test_self_comparison_is_perfect(spark):
    rows = [("d1", "g1", "g2", "pos"), ("d1", "g2", "g3", "neg"),
            ("d2", "g1", "g3", "pos")]
    res = evaluate(spark, rows, rows, CLASSIFICATION)
    assert res["f1"] == pytest.approx(1.0, abs=1e-10)
    assert res["acc"] == pytest.approx(1.0, abs=1e-10)


def test_extraction_mode_counts_misses_and_extras():
    pass  # covered in test_extraction_prf below


def test_extraction_prf(spark):
    etalon = [("d1", "g1", "g2", "pos"), ("d1", "g2", "g3", "neg")]
    test = [("d1", "g1", "g2", "pos"),           # TP (pos)
            ("d1", "g3", "g4", "neg")]           # extra (neg FP); miss of g2_g3
    res = evaluate(spark, etalon, test, EXTRACTION)
    # pos: P=1/1, R=1/1; neg: P=0/1, R=0/1 -> f1_pos=1, f1_neg=0, f1=0.5
    assert res["pos_prec"] == pytest.approx(1.0)
    assert res["pos_recall"] == pytest.approx(1.0)
    assert res["neg_prec"] == pytest.approx(0.0)
    assert res["neg_recall"] == pytest.approx(0.0)
    assert res["f1"] == pytest.approx(0.5)
    # acc: 3 cmp rows, 1 true
    assert res["acc"] == pytest.approx(1 / 3)


def test_empty_class_conventions(spark):
    # doc has NO neg opinions in etalon and none predicted:
    # answer_exist=False -> P=R=1.0 for neg (metrics_pr.py:17-20,31-35)
    etalon = [("d1", "g1", "g2", "pos")]
    test = [("d1", "g1", "g2", "pos")]
    res = evaluate(spark, etalon, test, EXTRACTION)
    assert res["neg_prec"] == pytest.approx(1.0)
    assert res["neg_recall"] == pytest.approx(1.0)
    assert res["f1"] == pytest.approx(1.0)

    # etalon HAS neg but test predicted none -> P=0 (exists, none selected)
    etalon2 = [("d1", "g1", "g2", "neg")]
    test2 = [("d1", "g1", "g2", "pos")]
    res2 = evaluate(spark, etalon2, test2, EXTRACTION)
    assert res2["neg_prec"] == pytest.approx(0.0)
    assert res2["neg_recall"] == pytest.approx(0.0)


def test_classification_mode_inner_join(spark):
    etalon = [("d1", "g1", "g2", "pos"), ("d1", "g2", "g3", "neg")]
    test = [("d1", "g1", "g2", "neg")]  # wrong label; second etalon missing
    cmp = compare_opinions(_ops(spark, etalon), _ops(spark, test),
                           CLASSIFICATION)
    rows = cmp.collect()
    assert len(rows) == 1          # missing etalon row skipped in this mode
    assert rows[0]["comparison"] is False


def test_classification_mode_raises_on_extra_test_rows(spark):
    """Reference strictness (comparators/opinions.py:48-54): a test opinion
    absent from the etalon is an error in Classification mode — classifying
    an opinion that was never provided 'could not be possible'."""
    etalon = [("d1", "g1", "g2", "pos")]
    test = [("d1", "g1", "g2", "pos"),
            ("d1", "g9", "g8", "neg")]   # never in the etalon
    with pytest.raises(ValueError, match="not found in the etalon"):
        compare_opinions(_ops(spark, etalon), _ops(spark, test),
                         CLASSIFICATION)
    # non-strict downgrade: silent inner-join drop
    cmp = compare_opinions(_ops(spark, etalon), _ops(spark, test),
                           CLASSIFICATION, strict=False)
    assert cmp.count() == 1


TRIPLES_SCHEMA = ("conv_id string, s_group string, t_group string, "
                  "label string, priority int, s_ent_id long, t_ent_id long")


def test_label_aggregation_modes(spark):
    rows = [
        ("d1", "a", "b", "pos", 0, 0, 1),
        ("d1", "a", "b", "neg", 1, 2, 3),
        ("d1", "a", "b", "neg", 1, 4, 5),
        ("d1", "b", "c", "nolabel", 1, 1, 6),
    ]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    first = {(r.s_group, r.t_group): r.label
             for r in linkages_to_opinions(df, FIRST_APPEARED).collect()}
    assert first[("a", "b")] == "pos"        # lowest priority first
    avg = {(r.s_group, r.t_group): r.label
           for r in linkages_to_opinions(df, AVERAGE).collect()}
    assert avg[("a", "b")] == "neg"          # sign(1-1-1) = -1
    assert avg[("b", "c")] == "nolabel"      # sign(0) = 0


def test_fill_opinion_collection_filters_labels(spark):
    rows = [("d1", "a", "b", "pos", 0, 0, 1),
            ("d1", "b", "c", "nolabel", 1, 1, 2)]
    df = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    ops = linkages_to_opinions(df, FIRST_APPEARED)
    kept = fill_opinion_collection(ops, supported_labels=("pos", "neg"))
    assert [r.label for r in kept.collect()] == ["pos"]


def test_label_distribution(spark):
    """A9 — counts per label (labeling/stat.py analog)."""
    from arekit_r335_spark.operators.aggregate import label_distribution
    df = spark.createDataFrame(
        [("pos",), ("pos",), ("neg",), ("nolabel",)], "label string")
    got = {r.label: r.n for r in label_distribution(df).collect()}
    assert got == {"pos": 2, "neg": 1, "nolabel": 1}
