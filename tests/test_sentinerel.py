"""SentiNeRel reader (sources/sentinerel.py) on a minimal synthesized
archive mirroring the reference fixture shape
(tests/contrib/source/test_sentinerel.py over sentinerel-<ver>.zip):
utf-8-sig BRAT pairs under the sentiment_dataset/ inner root, nested
annotation types ignored, entities bounded to sentences, relations typed by
the SentiNeRel label set."""

import os
import zipfile

from pyspark.sql import functions as F


TXT_0 = "[Alice] praised the deal.\nBut [Bob] attacked [Alice] later.\n"
ANN_0 = "﻿".join(["",  # BOM like the real archive's utf-8-sig files
    "T1\tPERSON 0 7\t[Alice]\n"
    "T2\tPERSON 30 35\t[Bob]\n"
    "T3\tPERSON 45 52\t[Alice]\n"
    "T4\tEVENT 14 18\tdeal\n"              # ignored type
    "T5\tPERSON 1 6\tAlice\n"              # nested in T1 -> overlap-merged
    "R1\tNEGATIVE_TO Arg1:T2 Arg2:T3\n"
    "R2\tPOSITIVE_TO Arg1:T1 Arg2:T2\n"
    "R3\tUNRELATED_TYPE Arg1:T1 Arg2:T2\n"])  # unknown type -> dropped
TXT_1 = "plain doc without annotations\n"


def _make_zip(tmp_path):
    path = os.path.join(str(tmp_path), "sentinerel-test.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("sentiment_dataset/doc_b.txt", TXT_0.encode("utf-8-sig"))
        zf.writestr("sentiment_dataset/doc_b.ann", ANN_0.encode("utf-8"))
        zf.writestr("sentiment_dataset/doc_a.txt", TXT_1.encode("utf-8-sig"))
        zf.writestr("README.txt", "not under the inner root")
    return path


def test_sentinerel_read(spark, tmp_path):
    from arekit_r335_spark.sources.sentinerel import (
        SENTINEREL_REL_LABELS, list_documents, read_sentinerel_zip)

    path = _make_zip(tmp_path)
    # deterministic enumeration: sorted member names
    assert list_documents(path) == [(0, "doc_a"), (1, "doc_b")]

    out = read_sentinerel_zip(spark, path)
    docs = {r.doc_name: r.doc_id for r in out["docs"].collect()}
    assert docs == {"doc_a": 0, "doc_b": 1}

    sents = out["sentences"].filter(F.col("doc_id") == 1).orderBy(
        "sent_ind").collect()
    assert sents[0].sent_text.startswith("[Alice]")
    assert sents[1].ind_begin == len(TXT_0.split("\n")[0]) + 1

    ents = out["entities"].filter(F.col("doc_id") == 1).orderBy(
        "begin").collect()
    # EVENT ignored; nested T5 merged away; three PERSON mentions survive,
    # each bound to its sentence
    assert [(e.ann_id, e.ent_type, e.sent_ind) for e in ents] == [
        (1, "PERSON", 0), (2, "PERSON", 1), (3, "PERSON", 1)]
    # values are lowercased like the Entity ctor
    assert ents[0].value == "[alice]"

    rels = {(r.rel_id, r.rel_type) for r in out["relations"].collect()}
    assert rels == {(1, "NEGATIVE_TO"), (2, "POSITIVE_TO")}
    assert all(t in SENTINEREL_REL_LABELS for _, t in rels)


def test_sentinerel_label_scaler():
    from arekit_r335_spark.labels import SENTINEREL, THREE_CLASS

    # labels_scaler.py:14-28 ordering: uint = position
    assert SENTINEREL.to_uint("OpinionBelongsTo") == 0
    assert SENTINEREL.to_uint("PositiveTo") == 7
    assert SENTINEREL.to_label(12) == "OriginsFrom"
    # the sentiment scaler's signed arithmetic + inversion
    assert THREE_CLASS.uint_map() == {"nolabel": 0, "pos": 1, "neg": 2}
    assert THREE_CLASS.invert("pos") == "neg"
    assert THREE_CLASS.invert("nolabel") == "nolabel"
