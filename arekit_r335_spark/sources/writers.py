"""Sinks — S9 (TSV-gzip samples) and S10 (OpenNRE JSON).

Reference: ``PandasCsvWriter`` (``contrib/utils/data/writers/csv_pd.py:13-40``)
writes tab-separated gzip sorted by id; ``OpenNREJsonWriter``
(``writers/json_opennre.py:12-69``) emits one JSON bag per row with
``{id, id_orig, token, h:{pos}, t:{pos}, relation}``.

Spark realization: plain ``df.write`` — the two-pass preallocation protocol
of the reference storage is unnecessary on columnar writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_samples_tsv_gz(samples: DataFrame, path: str,
                         single_file: bool = False) -> None:
    """S9: tab-separated, gzip, header, sorted by id (csv_pd.py:30-36)."""
    df = samples.orderBy("id")
    if single_file:
        df = df.coalesce(1)
    (df.write.mode("overwrite")
     .option("sep", "\t").option("header", "true")
     .option("compression", "gzip")
     .csv(path))


def write_samples_opennre(samples: DataFrame, path: str,
                          single_file: bool = False) -> None:
    """S10: one OpenNRE JSON object per line. ``token`` = whitespace-split
    text_a; ``h``/``t`` carry the in-sentence positions (json_opennre.py:27-49)."""
    bag = F.to_json(F.struct(
        F.col("id").alias("id_orig"),
        F.split("text_a", " ").alias("token"),
        F.struct(F.array(F.col("s_ind")).alias("pos")).alias("h"),
        F.struct(F.array(F.col("t_ind")).alias("pos")).alias("t"),
        F.col("label").cast("string").alias("relation"),
    ))
    df = samples.orderBy("id").select(bag.alias("value"))
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").text(path)


def write_opinions_txt(opinions: DataFrame, path: str,
                       single_file: bool = True) -> None:
    """S7 sink: ``source, target, label`` lines sorted by source+target
    (``rusentrel/opinions/writer.py:11-42``)."""
    line = F.concat_ws(", ", F.col("s_value"), F.col("t_value"),
                       F.col("label"))
    df = (opinions.orderBy("s_value", "t_value")
          .select(line.alias("value")))
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").text(path)


def read_opinions_txt(spark, path: str) -> DataFrame:
    """S7 scan: parse ``source, target, label[, ...]`` lines back into an
    opinion DF (``opinions/provider.py:8-52`` / ``converter.py:9-40``)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), ",\\s*")
    return raw.select(
        F.lower(F.trim(parts.getItem(0))).alias("s_value"),
        F.lower(F.trim(parts.getItem(1))).alias("t_value"),
        F.trim(parts.getItem(2)).alias("label"))
