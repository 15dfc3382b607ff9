"""Unit tests: the engine's regex-FSM tokenizer/parsers against the oracle's
literal char-scan transcription of the reference (tokenizer.py:60-105) —
two independent implementations must agree on arbitrary inputs."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from arekit_r335_spark.operators import textproc as tp
from arekit_r335_spark.oracle import pyref


def oracle_terms(text, variants=None, max_len=0,
                 neg=frozenset({"not", "no", "never"})):
    sentences = pyref.parse_doc([text], variants or {}, max_len, neg)
    out = []
    for t in sentences[0]:
        if isinstance(t, str):
            out.append(("w", t, False))
        elif isinstance(t, pyref.OToken):
            out.append(("t", t.value, False))
        elif isinstance(t, pyref.OEntity):
            out.append(("e", t.value, False))
        else:
            out.append(("f", t.frame_id, t.negated))
    return out


def engine_terms(text, variants=None, max_len=0,
                 neg=frozenset({"not", "no", "never"})):
    return [(t.kind, t.text, t.negated)
            for t in tp.parse_turn(text, variants or {}, max_len, neg)]


CASES = [
    "hello world",
    "say,- so",                              # punct run split
    "abc123 12abc 123",                      # digits inside vs leading
    "http://example.org/p/1 http://x.com",   # URL with and without path
    "[USA] [usa], []",                       # entity, broken entity, empty
    "(bracket) «quote» a—b a-b",             # brackets, quotes, dashes
    "wait… what?! x:y;z",
    "тест не поддержка",
    "a[b]c [x]",
]


def test_tokenizer_cases():
    for c in CASES:
        assert engine_terms(c) == oracle_terms(c), c


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits +
               ",.;:!?()-[]{}«»\"…—/ \t\n" + "абвне", max_size=60))
def test_tokenizer_property(text):
    assert engine_terms(text) == oracle_terms(text)


VARIANTS = {"attack": "f_a", "strike against": "f_s", "agree with": "f_g",
            "three word phrase": "f_3"}
MAXLEN = 3  # 'three word phrase' sets max=3 -> itself never matched (quirk)


def test_frame_scan_and_negation():
    for c in [
        "they attack the city",
        "we agree with them",
        "do not attack now",
        "never strike against x",
        "three word phrase here",           # must NOT match (max-len quirk)
        "attack attack attack",
        "[USA] attack , strike against it",
    ]:
        got = engine_terms(c, VARIANTS, MAXLEN)
        want = oracle_terms(c, VARIANTS, MAXLEN)
        assert got == want, (c, got, want)
    # the quirk: 3-word variant not matched, 2-word is
    assert ("f", "f_3", False) not in engine_terms(
        "three word phrase", VARIANTS, MAXLEN)
    assert ("f", "f_s", False) in engine_terms(
        "strike against", VARIANTS, MAXLEN)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["attack", "strike", "against", "agree", "with", "not", "no", "x",
     "[E1]", "123", "word,"]), max_size=12))
def test_frame_property(words):
    text = " ".join(words)
    assert engine_terms(text, VARIANTS, MAXLEN) == \
        oracle_terms(text, VARIANTS, MAXLEN)


def _make_strip_ing():
    def lemma(w):
        w = w.lower()
        return w[:-3] if w.endswith("ing") else w
    return lemma


def test_lemmatizer_seam():
    """T5 seam: a custom backend changes which surface forms hit the frame
    lexicon; the default (lower) seam stays byte-identical to the pyref
    transcription (covered by the parity suite)."""
    tp.register_lemmatizer("strip_ing", _make_strip_ing)
    fn = tp.get_lemmatizer("strip_ing")
    terms = tp.tokenize_turn("they are Attacking the base")
    hits = tp.scan_frames(terms, {"attack": "f_attack"}, 3,
                          frozenset({"not"}), lemma_fn=fn)
    assert [(t.kind, t.text) for t in hits if t.kind == tp.F] == \
        [(tp.F, "f_attack")]
    # default normalizer: the inflected form does not match
    base = tp.scan_frames(terms, {"attack": "f_attack"}, 3, frozenset({"not"}))
    assert not any(t.kind == tp.F for t in base)


def test_lemmatizer_dotted_path_resolution():
    """Cluster form: "module:factory" resolves by import in whichever
    process asks (executors never see driver-side register calls)."""
    fn = tp.get_lemmatizer("tests.test_textproc:_make_strip_ing")
    assert fn("Running") == "runn"
