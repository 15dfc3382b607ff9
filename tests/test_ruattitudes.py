"""S4 RuAttitudes stateful line-format reader on a synthesized fixture
mirroring the reference format (contrib/source/ruattitudes/reader.py):
Object/Attitude lines accumulate before their Title/Text sentence, title
index -1, doc separator counts only after a title."""

import os

FIXTURE = """File: part_0.txt
Object: oi:[0] 'США' b:(0,1) type:GPE si:{3} <AUTH>
Object: oi:[1] 'Россия' b:(4,1) type:GPE si:{7}
Attitude: США->Россия b:(-1) oi:[0,1] si:{usa_ru}
TermsInTitle: 6
Title: США вводят санкции против [Россия] сегодня
Sentence: 0
Object: oi:[0] '' b:(2,2) si:{9}
Text: первое предложение с [пустым] объектом
Sentence: 1
FrameVariant: осуждать
Attitude: a->b b:(1) oi:[0,0] si:{self}
Text: второе предложение
--------
Object: oi:[0] 'Merkel' b:(1,1) type:PERSON si:{2}
Title: второй документ
--------
"""


def _write(tmp_path):
    p = os.path.join(str(tmp_path), "part_0.txt")
    with open(p, "w") as f:
        f.write(FIXTURE)
    return p


def test_parse_lines_pure():
    from arekit_r335_spark.sources.ruattitudes import parse_ruattitudes_lines
    rows = parse_ruattitudes_lines(FIXTURE.splitlines(), "part_0")
    sents = [(r[0], r[2], r[3], r[4]) for r in rows if r[1] == "sent"]
    assert sents == [
        ("part_0:0", -1, True, "США вводят санкции против [Россия] сегодня"),
        ("part_0:0", 0, False, "первое предложение с [пустым] объектом"),
        ("part_0:0", 1, False, "второе предложение"),
        ("part_0:1", -1, True, "второй документ"),
    ]
    objs = [(r[0], r[2], r[5], r[6], r[7], r[8], r[9], r[10], r[11])
            for r in rows if r[1] == "obj"]
    # title objects carry sent_index -1; empty value -> '[empty]'
    assert objs == [
        ("part_0:0", -1, 0, "США", "GPE", 0, 1, 3, True),
        ("part_0:0", -1, 1, "Россия", "GPE", 4, 1, 7, False),
        ("part_0:0", 0, 0, "[empty]", None, 2, 2, 9, False),
        ("part_0:1", -1, 0, "Merkel", "PERSON", 1, 1, 2, False),
    ]
    opins = [(r[0], r[2], r[12], r[13], r[14], r[15])
             for r in rows if r[1] == "opin"]
    assert opins == [
        ("part_0:0", -1, 0, 1, -1, "usa_ru"),
        ("part_0:0", 1, 0, 0, 1, "self"),
    ]


def test_read_ruattitudes_spark(spark, tmp_path):
    from arekit_r335_spark.sources.ruattitudes import (read_ruattitudes,
                                                       ruattitudes_tables)
    path = _write(tmp_path)
    tables = ruattitudes_tables(read_ruattitudes(spark, path))
    assert tables["sentences"].count() == 4
    obj = {(r.doc_key, r.sent_index, r.obj_id): (r.value, r.end)
           for r in tables["objects"].collect()}
    # term bounds: end = pos + terms_count (text_object.py:28-34)
    assert obj[("part_0:0", -1, 1)] == ("Россия", 5)
    ops = tables["opinions"].filter("label_int = -1").collect()
    assert len(ops) == 1 and ops[0].tag == "usa_ru"
