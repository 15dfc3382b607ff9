"""SentiNeRel corpus reader — the third of the reference's corpus formats
(BRAT and transcripts are covered elsewhere).

Reference: ``contrib/source/sentinerel/reader.py`` — a SentiNeRel document is
a BRAT ``.txt``/``.ann`` pair inside a zip archive (inner root
``sentiment_dataset``, ``io_utils.py:27-42``), read with ``utf-8-sig``
(``reader.py:18,50``), with a default entity-type IGNORE list compensating
the flat treatment of nested annotations (``reader.py:32-33``:
EFFECT_NEG/EFFECT_POS/ARGUMENT_NEG/ARGUMENT_POS/EVENT), entities sorted by
``IndexBegin`` (``entities.py:30``), and doc ids enumerated over the ``.txt``
members (``io_utils.py:66-72``). Relation types map through the label set of
``sentinerel/labels.py`` / ``labels_scaler.py:14-28``.

Spark-first shape: the zip listing and byte extraction are DRIVER-side (a
zip is not a splittable input; SentiNeRel archives are MB-sized — at real
scale a corpus lives as a text/parquet table and enters through the same
DataFrame operators below). Everything after the extraction — annotation
parsing, sentence offsets, the entity->sentence range join, compound merge,
relation resolution — is the distributed BRAT operator set (sources/brat.py).
"""

from __future__ import annotations

import io
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession

from .brat import (assign_entities_to_sentences, merge_overlapping_entities,
                   parse_ann_lines, sentences_with_offsets)

# reader.py:32-33 — nested-annotation types excluded from the entity set
SENTINEREL_ENTITIES_TO_IGNORE = (
    "EFFECT_NEG", "EFFECT_POS", "ARGUMENT_NEG", "ARGUMENT_POS", "EVENT")

# relation type (as written in .ann) -> label name, the string form of the
# label classes in ``sentinerel/labels.py`` ordered per
# ``labels_scaler.py:14-28`` (uint = position)
SENTINEREL_REL_LABELS: dict[str, str] = {
    "OPINION_BELONGS_TO": "OpinionBelongsTo",
    "OPINION_RELATES_TO": "OpinionRelatesTo",
    "NEG_EFFECT_FROM": "NegEffectFrom",
    "POS_EFFECT_FROM": "PosEffectFrom",
    "NEG_STATE_FROM": "NegStateFrom",
    "POS_STATE_FROM": "PosStateFrom",
    "NEGATIVE_TO": "NegativeTo",
    "POSITIVE_TO": "PositiveTo",
    "STATE_BELONGS_TO": "StateBelongsTo",
    "POS_AUTHOR_FROM": "PosAuthorFrom",
    "NEG_AUTHOR_FROM": "NegAuthorFrom",
    "ALTERNATIVE_NAME": "AlternativeName",
    "ORIGINS_FROM": "OriginsFrom",
}


def _decode(data: bytes) -> str:
    # utf-8-sig: strips the BOM some SentiNeRel files carry (reader.py:18)
    return data.decode("utf-8-sig")


def list_documents(archive_path: str, inner_root: str = "sentiment_dataset"
                   ) -> list[tuple[int, str]]:
    """(doc_id, doc_name) per ``.txt`` member under the inner root —
    enumeration order like ``iter_collection_filenames`` (io_utils.py:66-72),
    made deterministic by sorting member names (zip order is insertion
    order; content-derived ids are the engine's determinism discipline)."""
    with zipfile.ZipFile(archive_path) as zf:
        names = sorted(
            n for n in zf.namelist()
            if n.endswith(".txt") and (not inner_root or inner_root in n))
    return [(i, os.path.basename(n)[:-4]) for i, n in enumerate(names)]


def read_sentinerel_zip(spark: SparkSession, archive_path: str,
                        inner_root: str = "sentiment_dataset",
                        entities_to_ignore: tuple[str, ...] | None = None
                        ) -> dict[str, DataFrame]:
    """Load a SentiNeRel archive into the engine's BRAT DataFrames:

    returns {'docs':      (doc_id, doc_name, text),
             'sentences': (doc_id, sent_ind, sent_text, ind_begin, ind_end),
             'entities':  (doc_id, ann_id, ent_type, begin, end, value,
                           sent_ind)   # ignore-list applied, overlap-merged
             'relations': (doc_id, rel_id, rel_type, src_ann_id, tgt_ann_id)}
    """
    from pyspark.sql import functions as F

    ignore = (SENTINEREL_ENTITIES_TO_IGNORE if entities_to_ignore is None
              else entities_to_ignore)
    doc_rows: list[tuple[int, str, str]] = []
    ann_rows: list[tuple[int, str]] = []
    with zipfile.ZipFile(archive_path) as zf:
        for doc_id, name in list_documents(archive_path, inner_root):
            base = f"{inner_root}/{name}" if inner_root else name
            with zf.open(base + ".txt") as f:
                doc_rows.append((doc_id, name,
                                 _decode(io.BytesIO(f.read()).getvalue())))
            try:
                with zf.open(base + ".ann") as f:
                    for line in _decode(f.read()).splitlines():
                        if line.strip():
                            ann_rows.append((doc_id, line))
            except KeyError:
                pass   # annotation-less document

    docs = spark.createDataFrame(doc_rows,
                                 "doc_id long, doc_name string, text string")
    ann = spark.createDataFrame(ann_rows or [(0, "")],
                                "doc_id long, value string")
    parsed = parse_ann_lines(ann)
    entities = parsed["entities"].filter(
        ~F.col("ent_type").isin(list(ignore)))
    entities = merge_overlapping_entities(entities)
    sentences = sentences_with_offsets(docs)
    entities = assign_entities_to_sentences(entities, sentences)
    relations = parsed["relations"].filter(
        F.col("rel_type").isin(list(SENTINEREL_REL_LABELS)))
    return {"docs": docs, "sentences": sentences,
            "entities": entities, "relations": relations}
