"""Text-analysis operators for the training-data pipeline (documents table):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Design rules for 100 TB:
* everything is built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen);
  no Python in the hot path;
* deterministic integer outputs (hit counts, not ratios) so results are
  bit-identical across engines and partitionings — callers derive floats;
* md5 (present in every engine) is the cross-engine hash primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "to", "and", "in", "on", "for", "with")
MARKERS = {
    "en": STOPWORDS_EN,
    "de": ("der", "die", "das", "und", "nicht", "ein"),
    "es": ("el", "la", "de", "y", "no", "que"),
}
_PUNCT_RE = r"[,.;:!?()\[\]{}\"'«»…—-]"


def norm_text(col):
    """Canonical text normalization: lower + whitespace collapse + trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens_col(col):
    return F.split(norm_text(col), " ")


def _hits(tokens, words: tuple[str, ...]):
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_chars_nospace) — all BIGINT."""
    toks = tokens_col(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace("text", r"\s", "")).cast("long")
         .alias("n_chars_nospace"),
    )


def quality_signals(documents: DataFrame) -> DataFrame:
    """Quality-score components as exact integer counts:
    (doc_id, n_tokens, stop_hits, digit_tokens, punct_chars, n_chars)."""
    toks = tokens_col(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        _hits(toks, STOPWORDS_EN).cast("long").alias("stop_hits"),
        F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).cast("long")
         .alias("digit_tokens"),
        (F.length("text")
         - F.length(F.regexp_replace("text", _PUNCT_RE, ""))).cast("long")
         .alias("punct_chars"),
        F.length("text").cast("long").alias("n_chars"),
    )


def langid_scores(documents: DataFrame) -> DataFrame:
    """N-gram(1) marker-hit language ID: per-language hit counts + argmax
    prediction (ties broken by language code order de < en < es)."""
    toks = tokens_col(F.col("text"))
    df = documents.select(
        "doc_id",
        *[_hits(toks, ws).cast("long").alias(f"hits_{lang}")
          for lang, ws in sorted(MARKERS.items())])
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(MARKERS)])
    pred = F.lit("unk")
    for lang in sorted(MARKERS, reverse=True):
        pred = F.when((F.col(f"hits_{lang}") == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return df.withColumn("pred_lang", pred)


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) word n-gram shingles of the normalized text; docs
    shorter than n tokens contribute their whole normalized text.

    Expression form matters: ``transform(slice(toks, ...), (x, i) ->
    concat_ws(slice(toks, i+1, n)))`` instead of ``transform(sequence(...),
    i -> element_at(toks, i) ...)``. Catalyst inlines the ``toks`` alias
    (split+regex over the raw text) into the Generate pre-filter, and the
    sequence/element_at form re-evaluates that chain per element_at — a
    measured ~10x slowdown on this exact operator; the slice form collapses
    to one evaluation."""
    toks = tokens_col(F.col("text"))
    d = documents.select("doc_id", toks.alias("toks"))
    sh = F.transform(
        F.slice("toks", 1, F.greatest(F.size("toks") - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(" ", F.slice("toks", i + 1, n)))
    return (d.select(
        "doc_id",
        F.when(F.size("toks") >= n, sh)
         .otherwise(F.array(F.concat_ws(" ", "toks"))).alias("shingles"))
        .select("doc_id", F.explode("shingles").alias("shingle")))


def fingerprints(documents: DataFrame, n: int = 3,
                 salts: tuple[str, ...] = ("s0", "s1", "s2", "s3")) -> DataFrame:
    """Document fingerprint: md5 of normalized text + a MinHash signature.

    MinHash permutation k = lexicographic min of ``md5(salt_k || shingle)``
    hex strings — engine-portable (md5 is identical everywhere), uniform, and
    order-independent. (doc_id, md5_norm, minhash_0..k)."""
    sh = shingles(documents, n)
    aggs = [F.min(F.md5(F.concat(F.lit(s), F.lit("|"), F.col("shingle"))))
            .alias(f"minhash_{i}") for i, s in enumerate(salts)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    base = documents.select("doc_id",
                            F.md5(norm_text(F.col("text"))).alias("md5_norm"))
    return base.join(sig, "doc_id", "left")


def tfidf_topk(documents: DataFrame, k: int = 5,
               n_docs: int | None = None) -> DataFrame:
    """TF-IDF top-k terms per document — the keyword/topic profile a
    curation pipeline attaches to every training document.

    Scale shape: two map-side-combinable aggregations — (doc_id, term)
    term frequency, then term -> document frequency (vocabulary-sized,
    shuffled on term; both sides pre-aggregated) — and a per-doc top-k
    window partitioned by doc_id (corpus-parallel, never global).
    idf = ln(N / df); ranking runs on the 1e6-scaled ROUNDED score with a
    term tie-break (the ``cosine_e5`` discipline: integer comparisons are
    engine-portable where raw-double ordering is one-ulp fragile).
    ``n_docs`` from table metadata avoids the fallback ``count()``."""
    from pyspark.sql import Window
    toks = tokens_col(F.col("text"))
    terms = (documents.select("doc_id", F.explode(toks).alias("term"))
             .filter(F.col("term") != ""))
    tf = (terms.groupBy("doc_id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    dfc = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    if n_docs is None:
        n_docs = documents.count()
    scored = (tf.join(dfc, "term")
              .withColumn(
                  "score_e6",
                  F.round(F.col("tf")
                          * F.log(F.lit(float(n_docs))
                                  / F.col("df").cast("double"))
                          * 1e6, 0).cast("long")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_e6"),
                                             F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score_e6", "rank"))


def bm25_scores(documents: DataFrame, query_terms: tuple[str, ...],
                k1: float = 1.2, b: float = 0.75,
                n_docs: int | None = None) -> DataFrame:
    """BM25 relevance of every document to a fixed bag of query terms —
    the retrieval scorer a curation pipeline uses for targeted corpus
    pulls.  Returns (doc_id, n_hits, score_e6) for documents matching at
    least one term.

    Determinism note: the per-document score is the sum of per-term
    contributions ADDED IN THE LITERAL TERM ORDER (one conditional
    aggregate per query term, then a fixed-order expression sum) — a
    plain SUM over exploded rows would add doubles in partition order,
    which is not reproducible across engines.  All other arithmetic is
    identically parenthesized on both sides; k1/b ship as repr literals.

    Scale shape: the explode is pre-filtered to the query terms (isin on
    a tiny literal set, pushed into the scan's generate filter), tf and
    df are combinable aggregates, and the corpus length total is a
    one-row broadcast."""
    toks = tokens_col(F.col("text"))
    terms = (documents.select("doc_id", F.explode(toks).alias("term"))
             .filter(F.col("term").isin(*query_terms)))
    tf = (terms.groupBy("doc_id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    dfc = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    lens = documents.select(
        "doc_id", F.size(toks).cast("long").alias("dl"))
    if n_docs is None:
        n_docs = documents.count()
    tot = lens.agg(F.sum("dl").cast("double").alias("sum_dl"))
    n = float(n_docs)
    j = (tf.join(dfc, "term")
         .join(lens, "doc_id")
         .crossJoin(F.broadcast(tot))
         .withColumn("avgdl", F.col("sum_dl") / F.lit(n)))
    idf = F.log(F.lit(1.0) + ((F.lit(n) - F.col("df").cast("double"))
                              + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5)))
    contrib = (idf
               * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
               / (F.col("tf").cast("double")
                  + F.lit(k1) * (F.lit(1.0 - b)
                                 + F.lit(b) * (F.col("dl").cast("double")
                                               / F.col("avgdl")))))
    j = j.withColumn("contrib", contrib)
    aggs = [F.sum(F.when(F.col("term") == t, F.col("contrib")))
            .alias(f"c{i}") for i, t in enumerate(query_terms)]
    g = j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_hits"), *aggs)
    score = None
    for i in range(len(query_terms)):
        c = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = c if score is None else score + c
    return g.select("doc_id", "n_hits",
                    F.round(score * 1e6, 0).cast("long").alias("score_e6"))


# --- PII scrubbing (training-data redaction) ----------------------------
# Patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle): character classes, bounded repetition,
# \b — no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d ]{5,}\d"


def dirty_text_col():
    """Deterministic PII-bearing text derived from (text, doc_id) — the
    synthetic documents fixture contains no digits at all, so the scrub
    mechanics are exercised on text every engine can derive identically
    (same pattern as the multimodal payload synthesis: the fixture is the
    driver's, the adversarial content is a pure function of its columns)."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), did,
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1 555 01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" done"))


def pii_scrub(documents: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, n_chars_redacted, redacted_md5).

    Pure-codegen redaction: counts on the dirty text, then
    email -> ``<EMAIL>``, IPv4 -> ``<IP>``, phone -> ``<PHONE>`` applied
    in that fixed order (phones are counted before replacement too — the
    three pattern families cannot overlap: phones require a leading '+',
    IPs have no '@'). Scale-safe: one projection, no shuffle, no UDFs;
    at 100 TB this is a map-only pass that pushes the text column scan
    straight through whole-stage codegen."""
    dirty = dirty_text_col()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE, "<IP>"),
        PII_PHONE_RE, "<PHONE>")
    return documents.select(
        "doc_id",
        F.regexp_count(dirty, F.lit(PII_EMAIL_RE)).cast("long")
         .alias("n_emails"),
        F.regexp_count(dirty, F.lit(PII_IPV4_RE)).cast("long")
         .alias("n_ipv4"),
        F.regexp_count(dirty, F.lit(PII_PHONE_RE)).cast("long")
         .alias("n_phones"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
        F.md5(redacted).alias("redacted_md5"),
    )


# BPE-ish pre-tokenizer: the GPT-2-style word/number/punct split reduced to
# syntax whose alternation and greediness behave identically in Java regex
# and RE2 (leftmost-first alternation, no lookaround, no \p classes).
BPE_TOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace count next to the
    BPE-ish regex count, the pair a token-budget estimator needs. Pure
    codegen map-only pass (no shuffle, no UDFs)."""
    return documents.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0)))
         .cast("long").alias("n_bpe_tokens"),
    )


def contamination(documents: DataFrame, benchmark_mod: int = 50,
                  n: int = 3) -> DataFrame:
    """Benchmark-contamination detection: word n-gram overlap of every
    training document against a held-out benchmark set (here the
    deterministic ``doc_id % benchmark_mod == 0`` slice — in deployment
    the benchmark table is the eval suite's documents).

    (doc_id, n_shingles, n_overlap, is_contaminated) — distinct-shingle
    counts (integer-exact) and a 10%-overlap flag kept in cross-multiplied
    integer form. 100 TB shape: the benchmark side is tiny by construction
    (eval suites are MBs, the corpus is TBs) so its distinct shingles
    BROADCAST; the per-doc aggregations are map-side combinable; no
    corpus-sized shuffle beyond the doc-side distinct."""
    sh = shingles(documents, n)
    is_bench = (F.col("doc_id") % benchmark_mod) == 0
    doc_sh = sh.filter(~is_bench).distinct()
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    tot = doc_sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles"))
    ov = (doc_sh.join(F.broadcast(bench_sh), "shingle")
          .groupBy("doc_id").agg(F.count("*").cast("long")
                                 .alias("n_overlap")))
    return (tot.join(ov, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_overlap"),
                    (F.coalesce("n_overlap", F.lit(0)) * 10
                     >= F.col("n_shingles")).cast("int")
                    .alias("is_contaminated")))
