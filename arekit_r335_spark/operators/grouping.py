"""Synonym-group assignment (J7a) — broadcast seed join + open-world keys.

Reference: ``SynonymsCollectionValuesGroupingProviders.
provide_existed_or_register_missed_value`` (``common/synonyms/grouping.py:8-15``)
mutates a shared in-memory dict, assigning each unseen value a fresh
insertion-ordered group index. Order-dependent integer indexes cannot exist in
a distributed engine, and only pair-equality of groups matters (SURVEY.md §7
hard-parts); we therefore use **content-derived group keys**:

* value found in the seed dictionary (by sid = lower+strip, the
  stemmer-based external sid of ``contrib/utils/synonyms/stemmer_based.py:16-19``)
  -> key ``g<group_id>``;
* unseen value (open world) -> key ``u:<sid>`` — its own singleton group,
  exactly the effect of ``add_synonym_value`` (``common/synonyms/base.py:31-42``),
  but deterministic and partition-count-invariant.

The seed dictionary is KB-MB sized -> explicit ``F.broadcast`` hash join; the
big mentions side never shuffles for this stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def seed_groups_df(spark: SparkSession, seed: pd.DataFrame) -> DataFrame:
    """(sid, group_key) Spark DF from the pandas seed (lexicons.load_synonym_seed)."""
    if len(seed) == 0:
        return spark.createDataFrame([], "sid string, group_key string")
    pdf = pd.DataFrame({
        "sid": seed["sid"].astype(str),
        "group_key": "g" + seed["group_id"].astype(int).astype(str),
    })
    return spark.createDataFrame(pdf)


def with_group_key(df: DataFrame, seed_df: DataFrame,
                   value_col: str = "value",
                   out_col: str = "group_key",
                   register_missed: bool = True) -> DataFrame:
    """Attach the synonym-group key for ``value_col`` (already lowercased
    entity values; sid = trim(value))."""
    sid = F.trim(F.lower(F.col(value_col)))
    df = df.withColumn("__sid", sid)
    joined = df.join(F.broadcast(seed_df), df["__sid"] == seed_df["sid"],
                     "left").drop("sid")
    if register_missed:
        key = F.coalesce(F.col("group_key"),
                         F.concat(F.lit("u:"), F.col("__sid")))
    else:
        # closed world: unseen values keep NULL group (callers drop them,
        # mirroring the read-only collection's rejection path,
        # ``common/opinions/collection.py:112-128``)
        key = F.col("group_key")
    out = joined.withColumn(out_col, key).drop("__sid")
    if out_col != "group_key":
        out = out.drop("group_key")
    return out
