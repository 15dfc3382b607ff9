"""J4b — frame-connotation opinion annotator (distant supervision).

The reference's ``RuSentiFramesConnotationProvider.try_provide``
(``contrib/utils/connotations/rusentiframes_sentiment.py:20-23``) maps a
frame id to its a0->a1 polarity label
(``contrib/source/rusentiframes/collection.py:56-66``), and negation inverts
the label (``contrib/networks/features/term_connotation.py:40-41``:
``invert_label`` when ``text_frame_variant.IsNegated``). The papers behind
the collection ("Distant Supervision for Sentiment Attitude Extraction",
RANLP-2019) apply this as pair labeling: an entity pair whose context
contains a frame gets the frame's a0->a1 connotation, a0 = the agent
mention appearing FIRST in text, a1 = the theme appearing after.

This annotator re-states that as relational dataflow:

* candidate pairs = the J2/J3 pair set (same filters as the nolabel
  annotator), restricted to text order ``s_ind < t_ind`` (a0 before a1) and
  same-turn contexts (consistent with the J10 limitation filter);
* votes = frame hits strictly BETWEEN the two mentions
  (``s_ind < frame_ind < t_ind``) that have a known a0->a1 polarity:
  +1 for pos, -1 for neg, sign flipped when the hit is negated (T6);
* doc-level label per synonym-group pair = the A1 AVERAGE aggregation
  (``common/model/labeling/single.py:14-24``): sign of the vote sum over all
  contexts; zero-sum pairs emit nothing (NoLabel — the pair then falls
  through to the lower-priority nolabel annotator, which is exactly the
  label the reference's scaler assigns to sign 0).

Scale shape: the pair/frame join is an equi-join on ``(conv_id, turn_idx)``
— the same keys as the J2 self-join, so it reuses the conv_id exchange; the
polarity lookup is a literal broadcast map (KB-sized lexicon); the vote
aggregation is a map-side-combinable groupBy on the doc-opinion keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def polarity_map_col(polarity: dict[str, str]) -> Column:
    kv = []
    for k, v in sorted(polarity.items()):
        kv += [F.lit(k), F.lit(v)]
    return (F.create_map(*kv) if kv
            else F.create_map().cast("map<string,string>"))


def frame_doc_opinions(pairs: DataFrame, frames: DataFrame,
                       polarity: dict[str, str]) -> DataFrame:
    """candidate pairs (with s_ind/t_ind) x frame hits -> doc-level
    (conv_id, s_group, t_group, s_value, t_value, label in {pos, neg})."""
    p = pairs.filter((F.col("s_ind") < F.col("t_ind"))
                     & (F.col("s_turn") == F.col("t_turn"))
                     & (F.col("s_group") != F.col("t_group")))
    f = frames.select("conv_id", F.col("turn_idx").alias("s_turn"),
                      F.col("ind_in_doc").alias("f_ind"),
                      "frame_id", "negated")
    pol = F.element_at(polarity_map_col(polarity), F.col("frame_id"))
    vote = (F.when(F.col("__pol") == "pos", 1).otherwise(-1)
            * F.when(F.col("negated"), -1).otherwise(1))
    j = (p.join(f, ["conv_id", "s_turn"])
         .filter((F.col("f_ind") > F.col("s_ind"))
                 & (F.col("f_ind") < F.col("t_ind")))
         .withColumn("__pol", pol)
         .filter(F.col("__pol").isNotNull()))
    agg = (j.groupBy("conv_id", "s_group", "t_group")
           .agg(F.sum(vote).alias("__vote"),
                F.min("s_value").alias("s_value"),
                F.min("t_value").alias("t_value")))
    return (agg.filter(F.col("__vote") != 0)
            .withColumn("label", F.when(F.col("__vote") > 0, F.lit("pos"))
                        .otherwise(F.lit("neg")))
            .drop("__vote"))
