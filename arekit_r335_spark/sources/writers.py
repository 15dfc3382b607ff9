"""Sinks — S9 (TSV-gzip samples), S10 (OpenNRE JSON), S11 (npz embedding).

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


def write_term_embedding(terms: DataFrame, embeddings: DataFrame,
                         target_dir: str, cv_index: int = 0,
                         term_col: str = "term",
                         vector_col: str = "vector") -> tuple[str, str]:
    """S11: npz embedding matrix + vocab txt sink.

    Reference: ``np_utils/npz_utils.py:7-13`` (``np.savez`` / ``arr_0``),
    ``np_utils/vocab.py:12-15`` (``np.savetxt`` one term per line),
    ``io_utils/embedding.py:21-22`` (``term_embedding-{cv}.npz`` /
    ``vocab-{cv}.txt`` naming), ``core/input/embedding/matrix.py:10-29``
    (matrix initialized to zeros; row i = vector of vocab term i).

    Spark realization: vocabulary = distributed ``distinct`` over the term
    column in deterministic lexicographic order (the reference iterates the
    W2V model's insertion order; an explicit stable order replaces it so the
    sink is partition-count invariant); vectors come from a left join against
    the ``embeddings`` lookup (term, array<float>) — terms absent from the
    lookup keep the reference's zero rows. Only the final vocab-sized result
    is collected: the matrix is dictionary-bounded by construction, not
    corpus-bounded, so the driver materialization is the same size the
    reference holds in memory."""
    import os

    import numpy as np

    vocab = (terms.select(F.col(term_col).alias("term")).where(
        F.col("term").isNotNull()).distinct())
    joined = (vocab.join(
        embeddings.select(F.col(term_col).alias("term"),
                          F.col(vector_col).alias("vector")),
        "term", "left").orderBy("term").collect())
    dim = next((len(r["vector"]) for r in joined if r["vector"] is not None),
               0)
    matrix = np.zeros((len(joined), dim), dtype=np.float32)
    words = []
    for i, r in enumerate(joined):
        words.append(r["term"])
        if r["vector"] is not None:
            matrix[i] = r["vector"]
    os.makedirs(target_dir, exist_ok=True)
    emb_path = os.path.join(target_dir, f"term_embedding-{cv_index}.npz")
    vocab_path = os.path.join(target_dir, f"vocab-{cv_index}.txt")
    np.savez(emb_path, matrix)
    np.savetxt(vocab_path, np.array(words, dtype=str), fmt="%s")
    return emb_path, vocab_path


def read_term_embedding(target_dir: str, cv_index: int = 0):
    """S11 scan: load the npz matrix (``arr_0`` key, npz_utils.py:10-13)
    and the vocab txt back; returns (np.ndarray, list[str])."""
    import os

    import numpy as np

    emb_path = os.path.join(target_dir, f"term_embedding-{cv_index}.npz")
    vocab_path = os.path.join(target_dir, f"vocab-{cv_index}.txt")
    matrix = np.load(emb_path)["arr_0"]
    words = np.loadtxt(vocab_path, dtype=str, ndmin=1).tolist()
    return matrix, words


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
