"""A1/A2/A9 — label aggregation over linkages and opinion-collection fill.

Reference:
* ``SingleLabelsHelper.aggregate_labels`` (``common/model/labeling/single.py:6-24``):
  FIRST_APPEARED -> first label in linkage order; AVERAGE -> label from the
  sign of the summed int labels.
* ``__linkages_to_opinions`` + ``__fill_opinion_collection``
  (``contrib/utils/pipelines/opinion_collections.py:23-53``): dedup per
  synonym pair + keep only supported labels.
* label<->int scaler (``common/labels/scaler/base.py:6-84``): a tiny
  broadcastable mapping, realized as a CASE WHEN column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SCALE = {"neg": -1, "nolabel": 0, "pos": 1}
FIRST_APPEARED = "first"
AVERAGE = "average"


def label_to_int(col, scale: dict[str, int] | None = None):
    scale = scale or DEFAULT_SCALE
    expr = F.lit(None).cast("int")
    for lab, v in sorted(scale.items()):
        expr = F.when(col == lab, F.lit(v)).otherwise(expr)
    return expr


def int_to_label(col, scale: dict[str, int] | None = None):
    scale = scale or DEFAULT_SCALE
    expr = F.lit(None).cast("string")
    for lab, v in sorted(scale.items()):
        expr = F.when(col == v, F.lit(lab)).otherwise(expr)
    return expr


def linkages_to_opinions(text_opinions: DataFrame,
                         mode: str = AVERAGE,
                         scale: dict[str, int] | None = None) -> DataFrame:
    """Mention-level triples -> one doc-level opinion per synonym pair.

    Linkage = all text opinions of one (conv_id, s_group, t_group); linkage
    order re-derived deterministically as (priority, s_ent_id, t_ent_id).
    Output: (conv_id, s_group, t_group, label, n_contexts).
    """
    keys = ["conv_id", "s_group", "t_group"]
    if mode == FIRST_APPEARED:
        w = Window.partitionBy(*keys).orderBy("priority", "s_ent_id",
                                              "t_ent_id")
        return (text_opinions
                .withColumn("__rn", F.row_number().over(w))
                .withColumn("__n", F.count("*").over(
                    Window.partitionBy(*keys)))
                .filter(F.col("__rn") == 1)
                .select(*keys, "label",
                        F.col("__n").cast("long").alias("n_contexts")))
    if mode == AVERAGE:
        ints = label_to_int(F.col("label"), scale)
        agg = (text_opinions.groupBy(*keys)
               .agg(F.signum(F.sum(ints)).cast("int").alias("__sign"),
                    F.count("*").cast("long").alias("n_contexts")))
        return agg.select(*keys, int_to_label(F.col("__sign"), scale)
                          .alias("label"), "n_contexts")
    raise ValueError(f"unknown mode {mode!r}")


def fill_opinion_collection(opinions: DataFrame,
                            supported_labels: tuple[str, ...] | None = None
                            ) -> DataFrame:
    """A2 — optional supported-label filter + dedup per synonym pair."""
    out = opinions
    if supported_labels is not None:
        out = out.filter(F.col("label").isin(list(supported_labels)))
    return out.dropDuplicates(["conv_id", "s_group", "t_group"])


def label_distribution(df: DataFrame) -> DataFrame:
    """A9 — samples/opinions per label."""
    return df.groupBy("label").agg(F.count("*").cast("long").alias("n"))
