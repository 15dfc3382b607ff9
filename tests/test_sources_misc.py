"""S2 sentence offsets, S6 CSV synonyms, J5 BRAT-predefined, U3 existed
exclusion, J15 context comparison."""

from pyspark.sql import functions as F

from arekit_r335_spark.lexicons import load_synonyms_csv_lines
from arekit_r335_spark.sources.brat import (assign_entities_to_sentences,
                                            parse_ann_lines,
                                            predefined_from_brat,
                                            sentences_with_offsets)


def test_sentences_with_offsets(spark):
    docs = spark.createDataFrame([(0, "abc\nde\n\nxyz")],
                                 "doc_id int, text string")
    rows = {r.sent_ind: (r.ind_begin, r.ind_end, r.sent_text)
            for r in sentences_with_offsets(docs).collect()}
    assert rows == {0: (0, 3, "abc"), 1: (4, 6, "de"),
                    2: (7, 7, ""), 3: (8, 11, "xyz")}


def test_load_synonyms_csv_lines():
    df = load_synonyms_csv_lines(["USA, America , US", "Moscow,Moskva", ""])
    assert dict(zip(df.sid, df.group_id)) == {
        "usa": 0, "america": 0, "us": 0, "moscow": 1, "moskva": 1}
    # sid clash: last registration wins (synonyms/base.py:109-126, no-debug)
    df2 = load_synonyms_csv_lines(["a,b", "b,c"])
    assert dict(zip(df2.sid, df2.group_id)) == {"a": 0, "b": 1, "c": 1}


def test_predefined_from_brat_j5(spark):
    lines = [
        (0, "T1\tORG 0 6\tKremlin"),
        (0, "T2\tPERSON 10 15\tPutin"),
        (0, "T3\tGPE 40 45\tDropd"),   # outside any sentence
        (0, "R1\tPOSITIVE_TO Arg1:T1 Arg2:T2"),
        (0, "R2\tNEGATIVE_TO Arg1:T1 Arg2:T3"),  # target unresolvable
        (0, "R3\tAUTHOR_TO Arg1:T2 Arg2:T1"),    # unsupported label
    ]
    raw = spark.createDataFrame(lines, "doc_id int, value string")
    parsed = parse_ann_lines(raw)
    sents = spark.createDataFrame([(0, 0, 0, 20)],
                                  "doc_id int, sent_ind int, "
                                  "ind_begin long, ind_end long")
    in_sents = assign_entities_to_sentences(parsed["entities"], sents)
    got = predefined_from_brat(
        parsed["relations"], in_sents,
        label_map={"POSITIVE_TO": "pos", "NEGATIVE_TO": "neg"},
        supported=("pos", "neg")).collect()
    assert len(got) == 1
    assert (got[0].s_value, got[0].t_value, got[0].label) == \
        ("kremlin", "putin", "pos")


def test_exclude_existed_u3(spark):
    from arekit_r335_spark.operators.pairs import exclude_existed
    pairs = spark.createDataFrame(
        [("c1", "g1", "g2", 0, 1), ("c1", "g2", "g3", 1, 2),
         ("c2", "g1", "g2", 0, 1)],
        "conv_id string, s_group string, t_group string, "
        "s_ent_id long, t_ent_id long")
    existed = spark.createDataFrame([("c1", "g1", "g2")],
                                    "conv_id string, s_group string, "
                                    "t_group string")
    kept = exclude_existed(pairs, existed).collect()
    assert {(r.conv_id, r.s_group, r.t_group) for r in kept} == \
        {("c1", "g2", "g3"), ("c2", "g1", "g2")}


def test_compare_context_opinions_j15(spark):
    from arekit_r335_spark.operators.evaluate import compare_context_opinions
    schema = ("conv_id string, turn_idx int, s_ent_id long, t_ent_id long, "
              "label string")
    etalon = spark.createDataFrame(
        [("c1", 0, 0, 1, "pos"), ("c1", 1, 2, 3, "neg")], schema)
    test = spark.createDataFrame(
        [("c1", 0, 0, 1, "pos"), ("c1", 2, 4, 5, "pos")], schema)
    cmp = compare_context_opinions(etalon, test)
    rows = {(r.conv_id, r.turn_idx, r.s_ent_id, r.t_ent_id): r.comparison
            for r in cmp.collect()}
    assert rows[("c1", 0, 0, 1)] is True
    assert rows[("c1", 1, 2, 3)] is False   # miss
    assert rows[("c1", 2, 4, 5)] is False   # extra


def test_term_embedding_npz_roundtrip_s11(spark, tmp_path):
    """S11 — npz matrix + vocab txt sink/scan round-trip: lexicographic
    vocab order, zero rows for unknown terms (matrix.py:24), arr_0 key and
    file naming of np_utils/{npz_utils,vocab}.py + io_utils/embedding.py."""
    import numpy as np

    from arekit_r335_spark.sources.writers import (read_term_embedding,
                                                   write_term_embedding)

    terms = spark.createDataFrame(
        [("beta",), ("alpha",), ("beta",), ("gamma",), (None,)],
        "term string")
    emb = spark.createDataFrame(
        [("alpha", [1.0, 2.0]), ("gamma", [3.0, 4.0]),
         ("unused", [9.0, 9.0])],
        "term string, vector array<float>")
    emb_path, vocab_path = write_term_embedding(
        terms, emb, str(tmp_path), cv_index=2)
    assert emb_path.endswith("term_embedding-2.npz")
    assert vocab_path.endswith("vocab-2.txt")
    matrix, words = read_term_embedding(str(tmp_path), cv_index=2)
    assert words == ["alpha", "beta", "gamma"]
    assert matrix.dtype == np.float32 and matrix.shape == (3, 2)
    # dedup kept one row per term; unknown term "beta" keeps the zero row
    assert matrix.tolist() == [[1.0, 2.0], [0.0, 0.0], [3.0, 4.0]]


def test_tone_lexicon_semantics():
    """Reference Lexicon/RuSentiLexLexicon semantics
    (contrib/utils/lexicons/lexicon.py:18-37): first matching row wins,
    missing term scores 0, iteration yields terms, membership via in."""
    from arekit_r335_spark.lexicons import ToneLexicon

    lex = ToneLexicon.from_csv_lines(
        ["term,tone", "good,1", "bad,-1", "good,-1", "meh,0"])
    assert lex.get_score("good") == 1      # first registration wins
    assert lex.get_score("bad") == -1
    assert lex.get_score("unknown") == 0   # get_score default
    assert lex.has_term("meh") and "meh" in lex
    assert "unknown" not in lex
    assert list(lex) == ["good", "bad", "meh"]


def test_relation_lexicon_semantics():
    """Reference RelationLexicon (contrib/utils/lexicons/relation.py:4-40):
    l<->r key validation, symmetric fallback, None when missing."""
    import pytest

    from arekit_r335_spark.lexicons import RelationLexicon

    lex = RelationLexicon.from_csv_lines(
        ["relation,tone", "a<->b,1", "c<->d,-1"])
    assert lex.get_score("a", "b") == 1
    assert lex.get_score("b", "a") == 1    # symmetric fallback
    assert lex.get_score("d", "c") == -1
    assert lex.get_score("a", "c") is None
    with pytest.raises(ValueError):
        RelationLexicon.from_csv_lines(["relation,tone", "nosep,1"])


def test_synthetic_tone_csv_roundtrip():
    """The fixture tone CSV parses back through the reference-shaped
    loader and the md5-derived tones land in {-1, 0, 1}."""
    from arekit_r335_spark.lexicons import (ToneLexicon,
                                            synthetic_tone_csv_lines)

    lines = synthetic_tone_csv_lines(["usa", "america", "usa", "moscow"])
    lex = ToneLexicon.from_csv_lines(lines)
    assert sorted(lex.df["term"]) == ["america", "moscow", "usa"]
    assert all(t in (-1, 0, 1) for t in lex.df["tone"])
    # deterministic: same input, same tones
    assert lines == synthetic_tone_csv_lines(["moscow", "america", "usa"])
